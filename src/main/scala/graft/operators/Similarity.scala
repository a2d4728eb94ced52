package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Round.rd

/** Embedding similarity operators (SURVEY §2.5 #44-47).
  *
  * Scale design: normalize once at ingest (unit vectors make cosine a
  * dot product); the exact paths broadcast the small side; the LSH path
  * (random hyperplane signs) buckets the corpus so candidate generation
  * is a bucket-equi-join, not a cross join.
  */
object Similarity {

  /** Element-wise dot product of two double arrays (codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cosine(a, b) with explicit double math (oracle-parity safe). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact near-dup pairs with cosine > threshold, blocked by a key
    * column (same-label here; at scale: any coarse partitioner). */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    // norms once per vector BEFORE the pair join — not once per pair
    val e = emb.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val l = e.select(col("label"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("n").as("na"))
    val r = e.select(col("label"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("n").as("nb"))
    l.join(r, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") > threshold)
      .select(col("label"), col("vec_a"), col("vec_b"), rd(col("cos"), 6).as("cos"))
  }

  /** Brute-force cosine top-k per query vector: broadcast the (small)
    * query set against one pass over the corpus. The exactness baseline
    * every ANN variant is judged against.
    *
    * Ranking uses the custom [[graft.functions.TopKByScore]] aggregate:
    * O(k) state per query with map-side partial aggregation, instead of
    * a window sort over every scored candidate (equivalence to the
    * window form is spec-pinned). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = scoreAll(emb, queries)
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("cos"), col("vec_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("neighbor_id"), rd(col("t.score"), 6).as("cos"))
  }

  /** Window-sort form of [[bruteForceTopK]] (the composed baseline the
    * custom aggregate is checked against). */
  def bruteForceTopKWindow(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scoreAll(emb, queries)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        rd(col("cos"), 6).as("cos"))
  }

  private def scoreAll(emb: DataFrame, queries: DataFrame): DataFrame = {
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val q = queries.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
  }

  /** Random-hyperplane LSH bucket id: sign bits of numPlanes fixed
    * pseudo-random hyperplanes (seeded — deterministic across runs). */
  def hyperplaneBucket(v: Column, dim: Int, numPlanes: Int = 12): Column = {
    val rnd = new scala.util.Random(2024)
    val planes = Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(zip_with(v, typedLit(p), (x, w) => x * w), lit(0.0), (a, x) => a + x)
      when(proj > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * nCells deterministic centroid vectors (the lowest vec_ids — an
    * IVF-flat assignment pass; a production build would k-means them),
    * then search only the nProbe cells nearest each query. The cell
    * assignment is one broadcast pass; search cost drops from n to
    * ~n·nProbe/nCells per query. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = emb.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell_seed"), toDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    def assign(df: DataFrame, vcol: String, ncol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cell_cos").desc, col("cell_seed"))
      df.crossJoin(broadcast(cents))
        .withColumn("cell_cos", dot(col(vcol), col("cv")) / (col(ncol) * col("cn")))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= keep)
        .drop("cv", "cn", "cell_cos", "cell_rank")
    }
    val corpus = assign(emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v"))), "v", "n", keep = 1)
      .withColumnRenamed("cell_seed", "cell")
    val q = assign(queries.select(col("vec_id"), toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv"))), "qv", "qn", keep = nProbe)
      .select(col("vec_id").as("q_id"), col("qv"), col("qn"),
        col("cell_seed").as("cell"))
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        rd(col("cos"), 6).as("cos"))
  }

  /** ANN via hyperplane LSH: candidates share a bucket (plus the probe
    * trick of also matching on bucket with one bit flipped would widen
    * recall; kept single-bucket here). Top-k within candidates. */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, numPlanes))
      .withColumn("n", norm(col("v")))
    val q = queries.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
      .withColumn("bucket", hyperplaneBucket(col("qv"), dim, numPlanes))
      .withColumn("qn", norm(col("qv")))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        rd(col("cos"), 6).as("cos"))
  }
}
