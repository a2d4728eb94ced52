package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      // the changed flag rides the SAME projection, so convergence is
      // one filter-count over the checkpointed frame — a re-join diff
      // would pay a per-round shuffle just to compare old vs new.
      // (A pointer-jumping variant was measured and reverted: near-dup
      // cluster graphs are shallow stars/short chains that converge in
      // 2-3 propagation rounds, so the label-of-label self-join adds a
      // shuffle per round without saving any.)
      val next = labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label"))
            .as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("_changed")).count()
      labels = next.drop("_changed")
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Quality-aware cluster representative selection — what production
    * dedup actually keeps: not the min-id member but the BEST one
    * (longest, highest quality score — Dolma/RefinedWeb keep-longest
    * rule). One partial-agg `min(struct(-quality, id))` per cluster
    * (map-side combinable — a 10⁶-member boilerplate cluster
    * pre-shrinks to one candidate per mapper), then a broadcast-sized
    * keeper table joins back on the cluster label. Ties break to the
    * smaller id, so the keeper is deterministic.
    *
    * `labeled`: (id, label) from [[connectedComponents]];
    * `quality`: integral score column on `labeled` (higher = better).
    * Returns (id, label, keeper_id, is_keeper). */
  def bestInCluster(labeled: DataFrame, id: Column, label: Column,
                    quality: Column): DataFrame = {
    val base = labeled.select(id.as("id"), label.as("label"),
      quality.cast("long").as("_q"))
    val keepers = base.groupBy(col("label"))
      .agg(min(struct(negate(col("_q")), col("id"))).as("w"))
      .select(col("label"), col("w").getField("id").as("keeper_id"))
    base.join(keepers, "label")
      .select(col("id"), col("label"), col("keeper_id"),
        (col("id") === col("keeper_id")).as("is_keeper"))
  }

  /** PageRank with a fixed iteration count, pure 64-bit integer
    * arithmetic — the domain/source authority score a curation
    * pipeline feeds into quality weighting (rank a link graph, then
    * up/down-weight documents by their host's rank).
    *
    * Total rank mass starts as `scale` (10¹² µ-units) split evenly;
    * each round every node keeps 15% of the base share and receives
    * 85% of its in-neighbors' contributions, where a node's
    * contribution is rank ÷ out-degree. Every step is an exact
    * integer floor-division (`(r − r mod d) / d` — overflow-free:
    * 85·scale < 2⁶³), so ranks are bit-identical across engines,
    * partitionings, and runs — no float mass sums. Dangling nodes
    * (out-degree 0) leak their mass, the standard simplification;
    * renormalizing each round would need only the same 1-row
    * aggregate used for the node count.
    *
    * Scale shape: out-degrees fold into the edge list ONCE before the
    * loop; each iteration is one edges⋈ranks join on src (both sides
    * hash-partitioned on the same key — AQE reuses the edge shuffle
    * across rounds) + one partial-agg sum keyed by dst (a hub with
    * 10⁸ in-links pre-aggregates map-side), + a left join back to the
    * node list. Nothing is ever collected to the driver; with tens of
    * iterations add the [[connectedComponents]] localCheckpoint to cut
    * lineage (3-5 PageRank rounds don't need it). */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L): DataFrame = {
    val intDiv = graft.functions.IntMath.intDiv _
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ej = e.join(outdeg, "src")
    val g = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(g))
      .select(col("id"), intDiv(lit(scale), col("n")).as("init"))
      .withColumn("r", col("init"))
    for (_ <- 1 to iters) {
      val sums = ej.join(ranks.select(col("id"), col("r")),
          ej("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(intDiv(col("r"), col("outdeg"))).as("c"))
      ranks = ranks.select(col("id"), col("init"))
        .join(sums, ranks("id") === sums("dst"), "left")
        .select(col("id"), col("init"),
          intDiv(lit(15L) * col("init") + lit(85L) * coalesce(col("c"), lit(0L)),
            lit(100L)).as("r"))
    }
    ranks.select(col("id").as("node_id"), col("r").as("rank"))
  }
}
