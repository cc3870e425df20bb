package graft.queries

/** Placeholder — filled in by its milestone. */
object DedupQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq.empty
}
