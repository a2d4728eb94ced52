package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic (r9): measure how LogicalRDD originStats compound
  * across checkpointed iteration rounds for the r8 CC join shape vs the
  * pointer-jumping shape. Not part of the driver contract. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("stats-probe", "8")
    import spark.implicits._
    val verts = (1L to 1000L).toDF("id")
    val edges = (1L until 1000L).map(i => (i, i + 1)).toDF("src", "dst")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    println("und bits: " + und.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength)

    def round2(labels: org.apache.spark.sql.DataFrame) = {
      val nbrMin = und.join(labels, und("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("_changed"))
        .localCheckpoint(true)
    }
    var l2 = verts.select(col("id"), col("id").as("label"))
    for (i <- 0 until 8) {
      val t0 = System.nanoTime()
      val n = round2(l2)
      n.filter(col("_changed")).count()
      l2 = n.drop("_changed")
      println(f"[2ref] round $i bits=${n.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength} dt=${(System.nanoTime()-t0)/1e9}%.2f")
    }

    def round3(labels: org.apache.spark.sql.DataFrame) = {
      val nbrMin = und.join(labels, und("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val jump = labels.select(col("id").as("jid"), col("label").as("jlabel"))
      val jumped = labels.join(jump, labels("label") === col("jid"), "left")
        .select(labels("id").as("id2"), col("jlabel"))
      val best = least(col("label"),
        coalesce(col("nbr_label"), col("label")),
        coalesce(col("jlabel"), col("label")))
      labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .join(jumped, labels("id") === col("id2"), "left")
        .select(labels("id"), best.as("label"), (best < col("label")).as("_changed"))
        .localCheckpoint(true)
    }
    var l3 = verts.select(col("id"), col("id").as("label"))
    for (i <- 0 until 8) {
      val t0 = System.nanoTime()
      val n = round3(l3)
      n.filter(col("_changed")).count()
      l3 = n.drop("_changed")
      println(f"[3ref] round $i bits=${n.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength} dt=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    def round3u(labels: org.apache.spark.sql.DataFrame) = {
      val jump = labels.select(col("id").as("jid"), col("label").as("jlabel"))
      val contrib = und.join(labels, und("b") === labels("id"))
        .select(col("a"), col("label"))
        .unionByName(labels.join(jump, labels("label") === col("jid"), "left")
          .select(labels("id").as("a"),
            coalesce(col("jlabel"), col("label")).as("label")))
      val nbrMin = contrib.groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("_changed"))
        .localCheckpoint(true)
    }
    var l4 = verts.select(col("id"), col("id").as("label"))
    var converged = false
    var i = 0
    while (!converged && i < 25) {
      val t0 = System.nanoTime()
      val n = round3u(l4)
      val changed = n.filter(col("_changed")).count()
      l4 = n.drop("_changed")
      converged = changed == 0
      println(f"[3u] round $i bits=${n.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength} changed=$changed dt=${(System.nanoTime()-t0)/1e9}%.2f")
      i += 1
    }
    val bad = l4.filter(col("label") =!= 1L).count()
    println(s"[3u] converged=$converged rounds=$i wrong_labels=$bad (path graph: all must be 1)")
    spark.stop()
  }
}
