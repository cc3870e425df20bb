package graft.queries

/** Placeholder — filled in by its milestone. */
object TextQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq.empty
}
