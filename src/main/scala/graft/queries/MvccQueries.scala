package graft.queries

/** Placeholder — filled in by its milestone. */
object MvccQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq.empty
}
