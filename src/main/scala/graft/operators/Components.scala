package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate candidate graph — the
  * clustering step big dedup pipelines run after pair generation: a
  * transitive cluster keeps ONE representative, not one winner per
  * pair (pairwise keep-min over-keeps on chains a–b, b–c).
  *
  * Iterative min-label propagation: each round every vertex takes the
  * min label among itself and its neighbors; converges in ≤ graph
  * diameter rounds (near-dup clusters are shallow stars/chains, so a
  * handful). Each round is one join + one partial-agg groupBy — two
  * shuffles on vertex ids, nothing quadratic — and the DataFrame is
  * localCheckpoint'ed per round so 20 rounds don't compound into a
  * 20-deep lineage (the standard Spark label-propagation shape; at
  * cluster scale swap localCheckpoint for reliable checkpointing).
  */
object Components {

  /** vertices: one column `id`; edges: columns `src`, `dst`
    * (undirected; both orientations are derived). Returns (id, label)
    * where label = min vertex id reachable — the cluster
    * representative. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels, und("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.withColumnRenamed("label", "_old"), "id")
        .filter(col("label") =!= col("_old")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }
}
