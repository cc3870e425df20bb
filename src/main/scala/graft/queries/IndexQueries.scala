package graft.queries

import org.apache.spark.sql.functions._

import graft.core.TpchGraph
import graft.operators.UniqueIndex
import graft.operators.UniqueIndex.IndexInfo
import graft.sources.Tables

/** Index surface (SURVEY §2.8): point lookup, prefix scan, duplicate
  * detection, and label-scoped index build over the graph snapshot.
  */
object IndexQueries extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(
    // ---- uniqueness check: keys with more than one owner ----
    QueryDef(
      "q_index_dup_check",
      "unique-constraint violation scan over part names",
      (s, dir) =>
        UniqueIndex.duplicates(Tables(s, dir).part, Seq("p_name")),
      Some("SELECT p_name, count(*) AS n FROM part GROUP BY p_name HAVING count(*) > 1")
    ),

    // ---- point lookup through a label-scoped index ----
    // Index over part-node names in the graph view; lookup one key.
    QueryDef(
      "q_index_lookup",
      "index build over part nodes + exact-key lookup",
      (s, dir) => {
        val g   = TpchGraph.snapshot(s, dir)
        val idx = UniqueIndex.build(g.nodes, IndexInfo("PartName", Seq("part"), "name"))
        UniqueIndex.lookup(idx, "red widget").select("key", "id")
      },
      Some(s"""SELECT p_name AS key, p_partkey + ${TpchGraph.PART} AS id
              |FROM part WHERE p_name = 'red widget'""".stripMargin)
    ),

    // ---- prefix scan (trie prefix analog) ----
    QueryDef(
      "q_index_prefix",
      "prefix query over the part-name index",
      (s, dir) => {
        val g   = TpchGraph.snapshot(s, dir)
        val idx = UniqueIndex.build(g.nodes, IndexInfo("PartName", Seq("part"), "name"))
        UniqueIndex.prefix(idx, "red ").select("key", "id")
      },
      Some(s"""SELECT p_name AS key, p_partkey + ${TpchGraph.PART} AS id
              |FROM part WHERE p_name LIKE 'red %'""".stripMargin)
    ),

    // ---- index applicability by label (isIndexApplicable) ----
    // The same property indexed over a different label: customer
    // names — proves the label filter scopes the build.
    QueryDef(
      "q_index_backfill",
      "label-scoped backfill: name index restricted to customer nodes",
      (s, dir) => {
        val g   = TpchGraph.snapshot(s, dir)
        val idx = UniqueIndex.build(g.nodes, IndexInfo("CustName", Seq("customer"), "name"))
        idx.agg(count(lit(1)).as("n_entries"), countDistinct(col("key")).as("n_keys"))
      },
      Some("""SELECT count(*) AS n_entries, count(DISTINCT c_name) AS n_keys FROM customer""".stripMargin)
    )
  )
}
