package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object DotBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.Tables.session("dotbench", "32")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings", spread = true)
    val corpus = e.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val q = corpus.filter(col("vec_id") < 500)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def run(name: String, dotFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = corpus.crossJoin(broadcast(q))
          .select(dotFn(col("qv"), col("v")).as("d"))
          .agg(sum(col("d"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name rep$rep: $dt%.3f s")
      }
    }
    run("composed", Similarity.dotComposed)
    run("native  ", Similarity.dot)
  }
}
