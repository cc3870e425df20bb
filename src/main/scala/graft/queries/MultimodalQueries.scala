package graft.queries

/** Placeholder — filled in by its milestone. */
object MultimodalQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq.empty
}
