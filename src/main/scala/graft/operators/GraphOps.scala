package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph kernel: connected components by iterative
  * min-label propagation — the missing last step of every dedup pipeline
  * (pair emitters produce EDGES; retention needs CLUSTERS and one
  * representative per cluster).
  *
  * Scale shape: each iteration is one edge-keyed join + one min
  * aggregation, both shuffling (id, label) pairs only; convergence needs
  * O(diameter) ≤ O(log n) iterations for dedup graphs (tiny diameters —
  * near-dup clusters are dense). The driver loop checks a single scalar
  * per iteration (`changed` count), never collects data, and
  * `localCheckpoint` truncates the lineage so the plan doesn't grow with
  * the iteration count (at cluster scale: `checkpoint` to reliable
  * storage instead). Min-label CC is order-insensitive, so the result is
  * deterministic under any scheduling.
  */
object GraphOps {

  /** Label every vertex with the smallest vertex id reachable from it.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected; both orientations
    *                 are added internally, self-loops are harmless)
    * @return (id, cluster) — cluster = min id of the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("cluster"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // best label reachable over one hop, folded into the current label
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min("cluster").as("hop"))
      val next = labels.join(prop, labels("id") === prop("src"), "left")
        .select(labels("id"),
          least(col("cluster"), coalesce(col("hop"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels
  }
}
