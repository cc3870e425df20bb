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

    // ---- incremental maintenance on COW update (API.hs:184-238) ----
    // Rename every red part under an IndexedGraph: stale 'red %'
    // entries must vanish from the index and 'crimson %' entries
    // appear, without rebuilding — the maintenance diff runs over the
    // touched rows only.
    QueryDef(
      "q_index_maintain",
      "incremental index maintenance after a COW rename of red parts",
      (s, dir) => {
        val g    = TpchGraph.snapshot(s, dir)
        val info = IndexInfo("PartName", Seq("part"), "name", unique = false)
        val ig   = graft.core.IndexedGraph(g, Map(info -> UniqueIndex.build(g.nodes, info)))
        val after = ig.updateNodeProps(
          col("label") === "part" && GraphQueries.hasRedName, 1L,
          GraphQueries.renameRedParts)
        after.indexes(info)
          .filter(col("key").startsWith("crimson ") || col("key").startsWith("red "))
          .select("key", "id")
      },
      Some(s"""SELECT 'crimson ' || substr(p_name, 5) AS key, p_partkey + ${TpchGraph.PART} AS id
              |FROM part WHERE p_name LIKE 'red %'""".stripMargin)
    ),

    // ---- incremental maintenance on cascading delete ----
    QueryDef(
      "q_index_delete",
      "index entry count after deleting the AUTOMOBILE customer segment",
      (s, dir) => {
        val g    = TpchGraph.snapshot(s, dir)
        val info = IndexInfo("CustName", Seq("customer"), "name", unique = false)
        val ig   = graft.core.IndexedGraph(g, Map(info -> UniqueIndex.build(g.nodes, info)))
        val auto = graft.model.PropValues.hasValue(
          col("props"), "mktsegment", graft.model.PropertyValue.PVText("AUTOMOBILE"))
        ig.deleteNodes(col("label") === "customer" && auto, 1L)
          .indexes(info).agg(count(lit(1)).as("n_entries"))
      },
      Some("SELECT count(*) AS n_entries FROM customer WHERE c_mktsegment <> 'AUTOMOBILE'")
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
