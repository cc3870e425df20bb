package graft.queries

/** Placeholder — filled in by its milestone. */
object StreamingQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq.empty
}
