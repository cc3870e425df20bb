package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HashMin label propagation over an arbitrary undirected edge list —
  * the shared core of [[graft.analytics.GraphAnalytics.connectedComponentsDF]]
  * (snapshot graphs) and [[graft.pipeline.Dedup.clusterPairs]]
  * (near-duplicate clustering): every round each node takes the
  * minimum label among itself and its neighbors; converged when a
  * round changes nothing.
  *
  * Scale shape: O(diameter) rounds of two shuffles each (join +
  * groupBy), all on hash-uniform ids. Near-dup graphs have tiny
  * diameters (clusters are quasi-cliques), so this converges in 2-3
  * rounds at any corpus size; for deep graphs bound `maxIters` and
  * prefer the GraphX form.
  */
object Components {

  /** `nodes`: single column `id`. `edges`: columns `u`, `v` (each
    * undirected pair in either or both orientations). Returns
    * (id, component) with component = the minimum id reachable from
    * `id` (isolated nodes map to themselves).
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // symmetrize once; localCheckpoint materializes it for reuse every
    // round (cluster scale: reliable checkpoint instead)
    val nbrs = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var comp  = nodes.select(col("id"), col("id").as("component")).localCheckpoint()
    var round = 0
    var done  = false
    while (!done && round < maxIters) {
      val nbrMin = nbrs
        .join(comp.select(col("id").as("v"), col("component").as("vc")), Seq("v"))
        .groupBy(col("u")).agg(min(col("vc")).as("nc"))
      // carry the did-anything-change flag IN the round's frame: the
      // localCheckpoint materializes it, so convergence detection is
      // a scan of cached blocks, not a second join per round
      val next = comp
        .join(nbrMin.withColumnRenamed("u", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nc"), col("component"))).as("component"),
          (coalesce(col("nc"), col("component")) < col("component")).as("changed"))
        .localCheckpoint()
      done = next.filter(col("changed")).isEmpty
      comp = next.select("id", "component")
      round += 1
    }
    comp
  }
}
