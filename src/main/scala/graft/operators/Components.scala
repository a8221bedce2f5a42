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

  /** CONTRACT: every edge endpoint must appear in `nodes` (edges ⊆
    * nodes × nodes). Labels are seeded from the edge endpoints, so a
    * foreign endpoint would participate in propagation and its id could be
    * elected as a cluster_id via min() even though the final left join
    * drops its own row — callers with untrusted edge lists must semi-join
    * `edges` against `nodes` first.
    *
    * @param nodes one column `node` (every element, including isolated)
    * @param edges columns `a`, `b` (undirected pairs)
    * @return (node, cluster_id) where cluster_id = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 15): DataFrame = {
    // Iterative frames use EAGER localCheckpoint, not cache+unpersist:
    // unpersisting iteration N's labels invalidates the CacheManager entry
    // of every dependent cached plan (iteration N+1's labels), so the loop
    // silently recomputed its entire history each round — measured 2×
    // growth per iteration (and the convergence probe paid it twice) on a
    // 13k-node graph. Checkpointing truncates the lineage instead: each
    // iteration's jobs see materialized partitions, never the chain. Same
    // hygiene GraphX applies to iterative graphs; on a real cluster a
    // reliable checkpoint dir would back the long chains.
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // The loop runs ONLY over edge-incident nodes: isolated nodes can never
    // change label, and they usually dominate the node set (most documents
    // have no duplicate), so keeping them out shrinks every per-round frame
    // to the duplicate neighborhood. They rejoin as their own cluster at
    // the end.
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("cluster_id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("a") === labels("node"))
        .groupBy(col("b").as("node2"))
        .agg(min("cluster_id").as("neighbor_min"))
      // The change flag rides in the checkpointed frame, so the convergence
      // probe is a filter over materialized partitions — not a second join
      // against the previous labels.
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("node2"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"),
          (coalesce(col("neighbor_min"), col("cluster_id")) < col("cluster_id")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).limit(1).count()
      labels = next.select("node", "cluster_id")
      converged = changed == 0
      iter += 1
    }
    nodes.select("node").join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }
}
