package graft.analytics

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraphSnapshot

/** Multi-hop / iterative analytics on GraphX — the capability tier
  * the reference never reached (its traversals stop at driver-side
  * chain walks; SURVEY §7.1 M6). Snapshot DataFrames convert to a
  * GraphX property graph; results come back as DataFrames so they
  * compose with the rest of the engine.
  *
  * Scale notes: vertices/edges partition with
  * `RandomVertexCut`-style hashing inside GraphX; each Pregel
  * superstep is one shuffle — bound hops explicitly (maxHops), never
  * iterate to fixpoint on unbounded diameters at 100 TB.
  */
object GraphAnalytics {

  /** Live snapshot -> GraphX graph. Vertex attr = label. */
  def toGraphX(g: GraphSnapshot): Graph[String, String] = {
    val live = g.live
    val vs: RDD[(VertexId, String)] =
      live.nodes.select("id", "label").rdd.map(r => (r.getLong(0), r.getString(1)))
    val es: RDD[Edge[String]] =
      live.edges.select("src", "dst", "label").rdd
        .map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    Graph(vs, es)
  }

  /** Connected components: (id, component) where component = the
    * smallest vertex id in the component (GraphX contract).
    */
  def connectedComponents(spark: SparkSession, g: GraphSnapshot): DataFrame = {
    import spark.implicits._
    toGraphX(g).connectedComponents().vertices
      .map { case (id, comp) => (id, comp) }
      .toDF("id", "component")
  }

  /** Fixed-iteration PageRank (resetProb 0.15), unnormalized GraphX
    * semantics: r' = 0.15 + 0.85 * sum(incoming r / outdeg).
    */
  def pageRank(spark: SparkSession, g: GraphSnapshot, iters: Int): DataFrame = {
    import spark.implicits._
    toGraphX(g).staticPageRank(iters).vertices
      .map { case (id, r) => (id, r) }
      .toDF("id", "rank")
  }

  /** Multi-hop BFS from a source set via Pregel: minimum hop distance
    * within `maxHops`. The n-step generalization of queryStep — each
    * superstep is the distributed version of one chain-walk round.
    */
  def hopDistances(spark: SparkSession, g: GraphSnapshot, sources: Set[Long],
      maxHops: Int, reverse: Boolean = false): DataFrame = {
    import spark.implicits._
    val base = toGraphX(g)
    val graph = (if (reverse) base.reverse else base)
      .mapVertices((id, _) => if (sources.contains(id)) 0 else Int.MaxValue)
    val res = graph.pregel(Int.MaxValue, maxIterations = maxHops)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr != Int.MaxValue && triplet.srcAttr + 1 < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Int.MaxValue)
      .map { case (id, d) => (id, d) }
      .toDF("id", "dist")
  }
}
