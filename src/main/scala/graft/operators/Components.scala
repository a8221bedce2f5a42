package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns verified
  * duplicate PAIRS into duplicate CLUSTERS with one surviving
  * representative (min id), which is what a dedup pipeline actually keeps.
  *
  * Iterative min-label propagation: each round every node adopts the
  * smallest label among itself and its neighbors; converges in
  * O(component diameter) rounds. Dup clusters are near-cliques of tiny
  * diameter, so the loop runs 2–3 rounds regardless of data size; each
  * round is one shuffle join + one aggregate (all distributed — no
  * driver-side graph).
  */
object Components {

  /** @param nodes one column `node` (every element, including isolated)
    * @param edges columns `a`, `b` (undirected pairs)
    * @return (node, cluster_id) where cluster_id = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 15): DataFrame = {
    // Cache the edge list BEFORE symmetrizing: the union's two branches
    // would otherwise each re-evaluate the (possibly expensive) edge
    // lineage — e.g. a full near-dup candidate join — from scratch.
    val e = edges.select(col("a"), col("b")).cache()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b"))).cache()
    var labels = nodes.select(col("node"), col("node").as("cluster_id")).cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("a") === labels("node"))
        .groupBy(col("b").as("node2"))
        .agg(min("cluster_id").as("neighbor_min"))
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("node2"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "node")
        .filter(col("cluster_id") < col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    e.unpersist()
    labels
  }
}
