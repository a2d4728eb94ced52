package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** Dot product of two double arrays: native fused-loop expression
    * (no intermediate array per pair — the composed zip_with+aggregate
    * form allocates one; equivalence pinned by DotProductSpec). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.column(a, b)

  /** Composed baseline for [[dot]] (spec comparison only). */
  def dotComposed(a: Column, b: Column): Column =
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

  /** Embedding-cosine near-dup DEDUP (vs [[cosinePairs]], which only
    * lists the pairs): a vector is a duplicate when ANY lower-id vector
    * in its block sits above the threshold; the survivors are the
    * blocks' earliest members. Deliberately the any-earlier-neighbor
    * rule rather than the sequential greedy chain — the chain is
    * order-serial (a dropped doc can no longer eliminate others) and
    * can't be one parallel join; this rule is deterministic, costs one
    * pair join + one anti-join, and at worst over-drops borderline
    * chain members — the right trade at 100 TB. */
  def nearDupSurvivors(emb: DataFrame, threshold: Double): DataFrame = {
    // EXACT duplicates collapse before the pair join — map-side-
    // combinable, grouped by (label, embedding) since blocking is per
    // label. Semantics-preserving (see [[semanticSurvivors]]'s proof):
    // a non-rep never survives (earlier identical same-label neighbor
    // at cos 1), and min-id reps decide exactly as the full join
    // would. Without this, a block of 10⁶ identical vectors is a
    // 10¹² - row pair join.
    val reps = emb.select(col("vec_id"), col("label"), col("embedding"))
      .groupBy(col("label"), col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
    val dups = cosinePairs(reps, threshold)
      .select(col("label"), col("vec_b").as("vec_id")).distinct()
    reps.select(col("label"), col("vec_id"))
      .join(dups, Seq("label", "vec_id"), "left_anti")
  }

  /** SemDeDup-style SEMANTIC dedup — [[nearDupSurvivors]] blocked by
    * k-means cell instead of a label column: the production path (a
    * real corpus carries no labels to block on). Cell assignment is
    * the map-only literal-centroid argmax, so the only pair work is
    * within-cell — n²/nCells of the all-pairs cost. Cross-cell
    * near-dups are missed by construction (the SemDeDup recall trade);
    * EXACT duplicates are never missed.
    *
    * EXACT duplicates collapse BEFORE the pair join, in a map-side-
    * combinable `groupBy(embedding).agg(min(vec_id))` (grouping on the
    * raw array — no hash-collision risk): a boilerplate embedding
    * repeated 10⁶ times would otherwise contribute 10¹² pairs to ONE
    * cell's join. The collapse is semantics-preserving, not an
    * approximation: a non-rep member always has an earlier identical
    * neighbor (its group's min id) at cos 1 ≥ threshold, so the
    * any-earlier-neighbor rule drops it unconditionally; and for two
    * distinct vectors, "some member of v earlier than r" ⟺ "v's min
    * id earlier than r" (min is the earliest member), so pairing only
    * the min-id reps decides every rep exactly as the uncollapsed
    * join would. Centroids train on the collapsed reps, so duplicate
    * mass cannot drag the cells either. */
  def semanticSurvivors(emb: DataFrame, nCells: Int = 16, iters: Int = 2,
                        threshold: Double = 0.95): DataFrame = {
    val reps = emb
      .select(col("vec_id"), toDouble(col("embedding")).as("embedding"))
      .groupBy(col("embedding")).agg(min(col("vec_id")).as("vec_id"))
    val cents = kmeansCentroids(reps, nCells, iters)
    val celled = reps.withColumn("label", assignCell(col("embedding"), cents))
    nearDupSurvivors(celled, threshold)
      .withColumnRenamed("label", "cell")
  }

  /** Brute-force cosine top-k per query vector: broadcast the (small)
    * query set against one pass over the corpus. The exactness baseline
    * every ANN variant is judged against.
    *
    * Ranking uses the custom [[graft.functions.TopKByScore]] aggregate:
    * O(k) state per query with map-side partial aggregation, instead of
    * a window sort over every scored candidate (equivalence to the
    * window form is spec-pinned). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKFromScored(scoreAll(emb, queries), k)

  /** (q_id, rank, neighbor_id, cos) from scored candidates — one O(k)
    * heap aggregate per query, map-side combinable. */
  private def topKFromScored(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("cos"), col("vec_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("neighbor_id"), rd(col("t.score"), 6).as("cos"))

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

  /** Int8 scalar quantization — the 4× (vs float32) / 8× (vs float64)
    * memory lever that keeps a 100 TB ANN corpus in executor memory:
    * per-vector `scale = max|v_i| / 127`, `q_i = ⌊v_i/scale + 0.5⌋ ∈
    * [-127, 127]` (half-up floor — exact in both engines, unlike
    * banker's round). Map-only, codegen'd. Keeps the original double
    * vector alongside (callers drop it when they only ship the int8
    * form). Fidelity metrics come from dot products only — `dot(v,v)`,
    * `dot(v,q)`, `dot(q,q)` — because sequential-dot equality across
    * engines is already pinned (d06); `dot(q,q)` is integer-exact. */
  def quantize(emb: DataFrame): DataFrame = {
    val v = toDouble(col("embedding"))
    emb.select(col("vec_id"), v.as("v"))
      .withColumn("q_scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
      // zero vector → all-zero codes (scale stays 0; division guard)
      .withColumn("q", transform(col("v"), x =>
        when(col("q_scale") > 0, floor(x / col("q_scale") + 0.5))
          .otherwise(0L).cast("long")))
  }

  /** Quantization fidelity report: per vector, the scale, a hash of
    * the int8 codes, the exact integer code-norm², and the cosine
    * between the float vector and its dequantized form (≈1 − the
    * quantization error). */
  def quantizationReport(emb: DataFrame): DataFrame = {
    val qd = transform(col("q"), x => x.cast("double"))
    quantize(emb)
      .withColumn("vv", dot(col("v"), col("v")))
      .withColumn("vq", dot(col("v"), qd))
      .withColumn("qq", dot(qd, qd))
      .select(col("vec_id"), rd(col("q_scale"), 9).as("q_scale"),
        md5(concat_ws(",", transform(col("q"), _.cast("string"))))
          .as("q_hash"),
        col("qq").cast("long").as("q_norm2"),
        rd(when(col("qq") > 0,
          col("vq") / (sqrt(col("vv")) * sqrt(col("qq")))), 6)
          .as("cos_fidelity"))
  }

  /** Brute-force top-k over the QUANTIZED corpus: integer dot products
    * (exact, engine-portable) normalized by the integer code norms —
    * the memory-bound scale path; at 100 TB the int8 corpus is the one
    * that fits. Same broadcast-queries × one-corpus-pass shape and the
    * same O(k)-heap aggregate as [[bruteForceTopK]]. */
  def quantizedTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qd = transform(col("q"), x => x.cast("double"))
    val corpus = quantize(emb).select(col("vec_id"), qd.as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = quantize(queries).select(col("vec_id").as("q_id"), qd.as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKFromScored(scored, k)
  }

  /** The fixed seeded hyperplanes — exposed so the DuckDB oracle can
    * embed the SAME planes as list literals (Double.toString
    * round-trips, so both engines hold bit-identical planes; d06's
    * passing oracle pins that list_dot_product's summation order
    * matches ours, hence identical signs). */
  def hyperplanes(dim: Int, numPlanes: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(2024)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: sign bits of numPlanes fixed
    * pseudo-random hyperplanes (seeded — deterministic across runs). */
  def hyperplaneBucket(v: Column, dim: Int, numPlanes: Int = 12): Column = {
    val planes = hyperplanes(dim, numPlanes)
    val bits = planes.zipWithIndex.map { case (p, j) =>
      // native fused dot (DotProductExpr) — same left-to-right float
      // sum as the composed zip_with+aggregate form (spec-pinned), no
      // per-row intermediate array, codegen'd instead of interpreted
      val proj = dot(v, typedLit(p))
      when(proj > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** splitmix64-style integer mix — the deterministic "random" the
    * k-means++ seeder races on. */
  private def mix64(a: Long, b: Long): Long = {
    var x = a * 0x9E3779B97F4A7C15L + b
    x ^= (x >>> 32); x *= 0xBF58476D1CE4E5B9L; x ^= (x >>> 29)
    x
  }
  private def unit(a: Long, b: Long): Double =
    ((mix64(a, b) >>> 11).toDouble + 0.5) / (1L << 53).toDouble

  /** Deterministic k-means++ seeding (Arthur–Vassilvitskii) over a
    * bounded hash-sample: seeding quality decides cell balance, and
    * the old lowest-vec_id seed degrades badly when ingest order
    * correlates with content (adversarial id orderings put all k
    * seeds in one region). The D²-weighted draw is derandomized with
    * the Gumbel-max trick — priority = log D²(x) + Gumbel(u(x, r))
    * with u a splitmix64 hash of (vec_id, round), so the argmax IS a
    * faithful D²-proportional sample yet bit-reproducible and
    * repartition-invariant. Runs driver-side over ≤4096 vectors
    * chosen by a deterministic hash order (one TakeOrdered scan; MB
    * of driver state, the kmeansCentroids bound), distances =
    * 1 − cos (spherical) or squared L2 (PQ subspaces). */
  private[operators] def kmeansPlusPlusSeeds(vecs: DataFrame, nCells: Int,
                                             euclidean: Boolean): Array[Array[Double]] = {
    // the sample SCALES with nCells (4× oversampling, floor 4096) —
    // a fixed 4096 cap silently degrades seeding once nCells nears
    // it (seeds capped at sample size, the r13 verdict finding).
    // Still driver-bounded: nCells is centroid state the driver holds
    // anyway, so 4×nCells vectors is the same order of memory.
    val sampleN = math.max(4096, 4 * nCells)
    val pts = vecs.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN).select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(pts.nonEmpty, "k-means++ seeding needs a non-empty corpus")
    def dist2(a: Array[Double], b: Array[Double]): Double =
      if (euclidean) {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      } else {
        var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        val cos = if (na == 0 || nb == 0) 0.0 else dp / math.sqrt(na * nb)
        val d = 1.0 - cos
        d * d
      }
    val seeds = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    // first seed: a uniform hash-race (round 0 has no D² yet)
    seeds += pts.minBy { case (id, _) => (unit(id, 0L), id) }._2
    val d2 = pts.map { case (_, v) => dist2(v, seeds.head) }
    var r = 1L
    var exhausted = false
    while (!exhausted && seeds.length < math.min(nCells, pts.length)) {
      var bestI = -1; var bestP = Double.NegativeInfinity
      var i = 0
      while (i < pts.length) {
        if (d2(i) > 0) {
          val u = unit(pts(i)._1, r)
          val p = math.log(d2(i)) + -math.log(-math.log(u))
          if (p > bestP) { bestP = p; bestI = i }
        }
        i += 1
      }
      if (bestI < 0) {
        // all remaining points coincide with a seed: pad by id order.
        // When even the pad has nothing left (fewer DISTINCT vectors
        // than seats — a duplicate-heavy corpus), STOP: without the
        // flag this branch adds nothing, the loop condition never
        // changes, and the driver spins forever; the repeat-pad below
        // completes the fill.
        val left = pts.filterNot(p => seeds.exists(_.sameElements(p._2)))
        if (left.isEmpty) exhausted = true
        else left.take(math.min(nCells, pts.length) - seeds.length)
          .foreach(seeds += _._2)
      } else {
        seeds += pts(bestI)._2
        var j = 0
        while (j < pts.length) {
          d2(j) = math.min(d2(j), dist2(pts(j)._2, seeds.last)); j += 1
        }
      }
      r += 1
    }
    // an all-duplicates corpus can't fill nCells distinct seeds: repeat
    // the first so downstream argmax stays well-defined (ties → cell 0)
    while (seeds.length < nCells) seeds += seeds.head
    seeds.toArray
  }

  /** Spherical k-means (Lloyd) centroids, k-means++-seeded
    * ([[kmeansPlusPlusSeeds]]), `iters` assign/recompute rounds.
    * Centroid state lives on the driver (nCells × dim doubles — KB,
    * not data scale); each round is one map-only literal-argmax
    * assignment plus one (cell, dim) hash aggregate. Centroids are
    * rounded to 1e-9 so float summation order can't flip downstream
    * assignments. */
  private[operators] def kmeansCentroids(emb: DataFrame, nCells: Int,
                                         iters: Int,
                                         euclidean: Boolean = false,
                                         maxTrain: Long = 8192L): Array[Array[Double]] = {
    val all = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // train on a DETERMINISTIC hash sample once the corpus outgrows
    // maxTrain (the FAISS practice: codebook/centroid quality saturates
    // at a few thousand training vectors, while training cost is
    // iters × corpus scans of a nCells-way argmax expression — on a
    // 10⁹-vector corpus full-corpus training would be the entire job).
    // Below the cap nothing is sampled, so small-corpus results are
    // bit-identical; the hash filter is partition-count-invariant.
    // ASSIGNMENT always scans the full corpus.
    val vecs0 =
      if (maxTrain == Long.MaxValue) all // caller pre-sampled
      else {
        val n = all.count()
        val rate = (n + maxTrain - 1) / math.max(1L, maxTrain)
        if (rate <= 1L) all
        else all.filter(pmod(xxhash64(col("vec_id")), lit(rate)) === 0)
      }
    val vecs = vecs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = kmeansPlusPlusSeeds(vecs, nCells, euclidean)
    for (_ <- 0 until iters) {
      val assign = if (euclidean)
        element_at(graft.functions.PqAssignAllExpr.column(col("v"),
          Array(cents)), 1)
      else assignCell(col("v"), cents)
      val updated = vecs
        .withColumn("cell", assign)
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s("m")).as("c"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      updated.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](1).toArray
          .map(d => math.rint(d * 1e9) / 1e9)
      }
      cents = next
    }
    vecs.unpersist(blocking = false)
    cents
  }

  /** Cosine of `v` against each literal centroid (map-only, codegen'd). */
  private def centScores(v: Column, cents: Array[Array[Double]]): Column = {
    val n = norm(v)
    array(cents.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      dot(v, typedLit(c.toSeq)) / (n * cn)
    }: _*)
  }

  /** argmax-cosine cell for a vector (ties → lowest cell id). */
  private def assignCell(v: Column, cents: Array[Array[Double]]): Column = {
    val s = centScores(v, cents)
    (array_position(s, array_max(s)) - 1).cast("int")
  }

  /** The nProbe best cells for a query vector, best first. */
  private def probeCells(v: Column, cents: Array[Array[Double]],
                         nProbe: Int): Column = {
    val zipped = zip_with(centScores(v, cents),
      sequence(lit(0), lit(cents.length - 1)),
      (sc, i) => struct((-sc).as("ns"), i.as("i")))
    transform(slice(sort_array(zipped), 1, nProbe), x => x("i").cast("int"))
  }

  /** IVF (inverted-file) ANN: k-means centroid cells + nProbe search.
    * Cell assignment is a map-only argmax against broadcast-literal
    * centroids (no crossJoin, no window); search touches only
    * ~n·nProbe/nCells candidates per query. `kmeansIters = 0` keeps the
    * raw seed vectors as centroids (the round-1 behavior, used by the
    * recall spec as the baseline the k-means cells must beat). */
  /** Offline IVF training — the first half of the deployment split:
    * train the cell state once (KB of driver/broadcast state), hand it
    * to every subsequent [[ivfTopK]] probe. Same spherical k-means the
    * inline path trains; exposing it is what makes the train-once /
    * probe-many shape expressible by a user of the library. */
  def trainIvfCentroids(emb: DataFrame, nCells: Int = 16,
                        kmeansIters: Int = 5): Array[Array[Double]] =
    kmeansCentroids(emb, nCells, kmeansIters)

  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 2,
              kmeansIters: Int = 5,
              centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // `centroids` is the DEPLOYMENT shape: the cell state trains once
    // (an offline job, the s26/s27 warehouse-twin trade) and every
    // probe reuses it — retraining per query batch is gate-convenient
    // but not what anyone runs at 100×.
    val cents = centroids.getOrElse(kmeansCentroids(emb, nCells, kmeansIters))
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("cell", assignCell(col("v"), cents))
    val q = queries.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("cell", explode(probeCells(col("qv"), cents, nProbe)))
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    topKFromScored(scored, k)
  }

  /** Materialized IVF index — the d66 postings treatment applied to
    * ANN: the trained cell state persists as parquet next to the
    * CELL-BUCKETED vectors (written `partitionBy("cell")`, so each
    * cell is its own directory and a probe's `cell IN (…)` filter
    * prunes at PARTITION level — only nProbe/nCells of the corpus is
    * ever listed, let alone scanned). Probing needs NO training: the
    * index is built once (an offline job), every query batch pays
    * one KB-sized centroid read plus the pruned candidate scan —
    * at 100 TB the vectors table is the corpus and this split is the
    * difference between an ANN query and a full re-shuffle. */
  def writeIvfIndex(emb: DataFrame, path: String,
                    nCells: Int = 16, kmeansIters: Int = 5,
                    centroids: Option[Array[Array[Double]]] = None): Unit = {
    val cents = centroids.getOrElse(kmeansCentroids(emb, nCells, kmeansIters))
    val spark = emb.sparkSession
    val centRows = cents.toSeq.zipWithIndex.map { case (c, i) =>
      Row(i, c.toSeq)
    }
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(centRows, 1), centSchema)
      .write.mode("overwrite").parquet(s"$path/centroids")
    // sidecar fingerprint (r17): lets the probe paths VERIFY caller-
    // supplied resident centroids against the index's stored state for
    // the cost of a tiny local file read, instead of either trusting
    // the caller blindly (silent wrong neighbors on a stale handoff)
    // or re-reading the centroid parquet per probe (the KB-read job
    // r16 removed)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "centroids.fp"),
      centroidFingerprint(cents).getBytes("UTF-8"))
    catch { case _: Throwable => () } // non-local path: guard degrades to off
    // norms ride in the index: the probe path never recomputes them
    emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("cell", assignCell(col("v"), cents))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Canonical fingerprint of a centroid state: cell count + FNV-1a
    * over the bit patterns of every value, row-major. Bit-exact across
    * the write→parquet→read round trip (parquet doubles preserve bits),
    * so resident state handed between services can be checked against
    * the on-disk index it claims to match. */
  private[operators] def centroidFingerprint(cents: Array[Array[Double]]): String = {
    var h = 1469598103934665603L
    var i = 0
    while (i < cents.length) {
      val c = cents(i); var j = 0
      while (j < c.length) {
        val b = java.lang.Double.doubleToLongBits(c(j))
        var k = 0
        while (k < 8) { h = (h ^ ((b >>> (k * 8)) & 0xffL)) * 1099511628211L; k += 1 }
        j += 1
      }
      i += 1
    }
    s"${cents.length}:${java.lang.Long.toHexString(h)}"
  }

  /** Guard for caller-supplied resident centroids (r17, the invariant
    * VERDICT r16 flagged unguarded): if the index carries a sidecar
    * fingerprint, the supplied state must match it — a probe with stale
    * cells (e.g. a rebuilt-with-retrained-centroids index probed with
    * the old service state) returns wrong neighbors with no error
    * otherwise. Indexes written before the sidecar existed skip the
    * check (nothing to compare against). */
  private def requireCentroidsMatch(path: String,
                                    cents: Array[Array[Double]]): Unit = {
    val fp = java.nio.file.Paths.get(path, "centroids.fp")
    if (java.nio.file.Files.exists(fp)) {
      val stored = new String(java.nio.file.Files.readAllBytes(fp), "UTF-8")
      val got = centroidFingerprint(cents)
      require(stored == got,
        s"caller-supplied centroids do not match the index at $path " +
          s"(stored $stored, supplied $got): probing with stale cell state " +
          "returns wrong neighbors silently - pass the index's own " +
          "centroids (readIvfCentroids) or rebuild the index")
    }
  }

  /** The index's centroid state — KB-sized, read once per query batch
    * (the same driver/broadcast shape the d155 cache uses). */
  def readIvfCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids").orderBy("cell")
      .collect().map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)

  /** Probe the materialized index: same cell-assignment/scoring/top-k
    * algebra as [[ivfTopK]] (the gate proves hit-identity), but the
    * corpus side is the PRUNED index scan. The query batch's probed
    * cells are collected once on the driver (the batch is broadcast
    * anyway) and pushed as a literal partition filter — `.explain`
    * shows them under PartitionFilters, which is the property the
    * plan spec pins.
    *
    * `centroids` (r16): callers that already hold the index's cell
    * state (a probe service keeps it resident between query batches —
    * the [[readIvfCentroids]] doc's own "read once per batch" shape)
    * pass it in and skip the per-call KB parquet read job. The values
    * are the exact rows [[writeIvfIndex]] wrote, so probe results are
    * identical either way. */
  /** Prepared probe-side state shared by every index probe of one query
    * batch: the cell-exploded query frame and its probed-cell set (ONE
    * driver collect). r17: [[ivfAppendVerdict]] probes two indexes with
    * the same batch and the same centroids — preparing once halves the
    * per-verdict driver jobs and makes the two probes' broadcast
    * subtrees identical (AQE exchange reuse). */
  private def prepIvfQueries(queries: DataFrame,
                             cents: Array[Array[Double]],
                             nProbe: Int): (DataFrame, Array[Int]) = {
    val q = queries.select(col("vec_id").as("q_id"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("cell", explode(probeCells(col("qv"), cents, nProbe)))
    val probed: Array[Int] = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0))
    (q, probed)
  }

  /** The pruned-index probe over a prepared query frame. */
  private def probeIvfIndex(spark: SparkSession, path: String,
                            q: DataFrame, probed: Array[Int],
                            k: Int): DataFrame = {
    val corpus = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probed.map(Int.box): _*))
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    topKFromScored(scored, k)
  }

  def ivfTopKFromIndex(spark: SparkSession, path: String,
                       queries: DataFrame, k: Int,
                       nProbe: Int = 2,
                       centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    centroids.foreach(requireCentroidsMatch(path, _))
    val cents = centroids.getOrElse(readIvfCentroids(spark, path))
    val (q, probed) = prepIvfQueries(queries, cents, nProbe)
    probeIvfIndex(spark, path, q, probed, k)
  }

  /** Incremental index maintenance — the operation that makes the
    * d164 index a WAREHOUSE rather than a one-shot export: new
    * vectors are assigned to cells MAP-ONLY against the STORED
    * centroids (no retraining, no touch of existing cell files) and
    * appended as new parquet files under their cell partitions. At
    * 100 TB this is the daily-ingest shape: the append writes only
    * |batch| rows; probes see old + new rows through the same pruned
    * partition scan. Centroids staying fixed is the documented
    * trade: cell balance degrades as the distribution drifts, and
    * the refresh is an offline rebuild ([[writeIvfIndex]]), exactly
    * like the d66 postings rebuild. */
  def appendIvfIndex(spark: SparkSession, path: String,
                     emb: DataFrame): Unit = {
    val cents = readIvfCentroids(spark, path)
    emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("cell", assignCell(col("v"), cents))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** d168 verdict: probing an index built from a base slice then
    * APPENDED with the rest must return EXACTLY what a from-scratch
    * rebuild over the full corpus returns (same centroids — the
    * append contract is "probes cannot tell"), counts equal + zero
    * asymmetric rows over the oracle-computable nq·k total. */
  def ivfAppendVerdict(spark: SparkSession, basePath: String,
                       fullPath: String, queries: DataFrame,
                       k: Int, nProbe: Int = 2,
                       centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // ONE centroids argument serves both indexes BY CONTRACT ("same
    // centroids — probes cannot tell"); the fingerprint guard checks
    // the supplied state against BOTH sidecars, so a rebuilt-with-
    // retrained-centroids full index fails loudly instead of probing
    // with stale cells (r17, VERDICT r16 item 7).
    centroids.foreach { c =>
      requireCentroidsMatch(basePath, c); requireCentroidsMatch(fullPath, c)
    }
    val cents = centroids.getOrElse {
      val c = readIvfCentroids(spark, basePath)
      // the None path now probes BOTH indexes with base's state (it
      // used to read each index's own) — enforce the same-centroids
      // contract on the full index before trusting that
      requireCentroidsMatch(fullPath, c)
      c
    }
    // prepare the probe side ONCE for both indexes (same batch, same
    // cells): one driver collect instead of two, identical broadcast
    // subtrees (r17, VERDICT r16 item 8)
    val (q, probed) = prepIvfQueries(queries, cents, nProbe)
    val appended = probeIvfIndex(spark, basePath, q, probed, k)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
    val rebuilt = probeIvfIndex(spark, fullPath, q, probed, k)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
    val keys = Seq("q_id", "rank", "neighbor_id")
    rebuilt.agg(count(lit(1)).as("n_topk"))
      .crossJoin(appended.join(rebuilt, keys, "left_anti")
        .agg(count(lit(1)).as("_extra")))
      .crossJoin(rebuilt.join(appended, keys, "left_anti")
        .agg(count(lit(1)).as("_missing")))
      .select(col("n_topk"),
        (col("_extra") === 0 && col("_missing") === 0)
          .as("append_matches_rebuild"))
  }

  /** d164 verdict: the index probe must return EXACTLY the in-memory
    * IVF's hits (same centroids, same algebra, different storage) —
    * counts equal and zero asymmetric rows, hashed as booleans over
    * an oracle-computable total (the d13 pattern). */
  def ivfIndexVerdict(spark: SparkSession, path: String,
                      emb: DataFrame, queries: DataFrame, k: Int,
                      centroids: Array[Array[Double]],
                      nProbe: Int = 2): DataFrame = {
    val mem = ivfTopK(emb, queries, k, nProbe = nProbe,
      centroids = Some(centroids))
      .select(col("q_id"), col("rank"), col("neighbor_id"))
    val idx = ivfTopKFromIndex(spark, path, queries, k, nProbe,
        Some(centroids))
      .select(col("q_id"), col("rank"), col("neighbor_id"))
    val keys = Seq("q_id", "rank", "neighbor_id")
    mem.agg(count(lit(1)).as("n_topk"))
      .crossJoin(idx.join(mem, keys, "left_anti")
        .agg(count(lit(1)).as("_extra")))
      .crossJoin(mem.join(idx, keys, "left_anti")
        .agg(count(lit(1)).as("_missing")))
      .select(col("n_topk"),
        (col("_extra") === 0 && col("_missing") === 0)
          .as("index_matches_memory"))
  }

  /** d174 — the INDEX HEALTH report that tells a deployment WHEN the
    * d168 append trade has gone bad: per cell, the vector count, the
    * size ratio against the balanced share (n · nCells / total — 1.0
    * = perfectly balanced, the probe-cost multiplier for queries
    * landing in that cell), and the mean cosine distance of the
    * cell's vectors to their own stored centroid (rises as the
    * ingest distribution drifts away from the build-time one). One
    * pruned index scan + a broadcast centroid join + a #cells-row
    * aggregate — the report costs one pass at any corpus size and
    * its output is O(nCells). */
  def ivfDriftReport(spark: SparkSession, path: String,
                     centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    centroids.foreach(requireCentroidsMatch(path, _)) // r17 stale-state guard
    val cents = centroids.getOrElse(readIvfCentroids(spark, path))
    val centRows = cents.toSeq.zipWithIndex.map { case (c, i) =>
      Row(i, c.toSeq)
    }
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val centDf = spark.createDataFrame(
        spark.sparkContext.parallelize(centRows, 1), centSchema)
      .withColumn("cn", norm(col("cv")))
    val perCell = spark.read.parquet(s"$path/vectors")
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("dist",
        lit(1.0) - dot(col("v"), col("cv")) / (col("n") * col("cn")))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), avg(col("dist")).as("mean_dist"))
    perCell
      .crossJoin(broadcast(perCell.agg(sum(col("n")).as("_total"))))
      .select(col("cell"), col("n"),
        (col("n") * cents.length / col("_total")).as("size_ratio"),
        col("mean_dist"))
  }

  /** The documented REBUILD RULE over two [[ivfDriftReport]]s (the
    * index as built vs after appends): rebuild when the worst cell's
    * size_ratio exceeds `maxRatio` (that cell's probes now cost that
    * multiple of the balanced scan — 2.0 doubles the worst probe) or
    * any cell's share SHIFTED by more than `maxShift` absolute since
    * build (the distribution moved; fixed centroids no longer carve
    * it evenly). Returns one row of booleans + the verified coverage
    * totals (the d13 verdict shape: every claim checked in-plan). */
  def ivfDriftVerdict(before: DataFrame, after: DataFrame,
                      maxRatio: Double = 2.0,
                      maxShift: Double = 0.05): DataFrame = {
    val b = before.select(col("cell"),
      col("n").as("n_b"), col("size_ratio").as("r_b"),
      col("mean_dist").as("d_b"))
    val a = after.select(col("cell"),
      col("n").as("n_a"), col("size_ratio").as("r_a"),
      col("mean_dist").as("d_a"))
    // full outer: a cell can be empty on one side
    val j = a.join(b, Seq("cell"), "full_outer")
      .select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("r_a"), lit(0.0)).as("r_a"),
        coalesce(col("d_a"), lit(0.0)).as("d_a"),
        coalesce(col("d_b"), lit(0.0)).as("d_b"))
    val tot = j.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    j.crossJoin(broadcast(tot))
      .agg(
        first(col("_ta")).as("total_after"),
        first(col("_tb")).as("total_before"),
        max(col("r_a")).as("_max_ratio"),
        // absolute per-cell share shift between the two reports
        max(abs(col("n_a") / col("_ta") - col("n_b") / col("_tb")))
          .as("_max_shift"),
        max(col("d_a")).as("_max_dist"),
        min(col("d_a")).as("_min_dist"))
      .select(col("total_before"), col("total_after"),
        (col("_min_dist") >= -1e-9 && col("_max_dist") <= 2.0 + 1e-9)
          .as("dists_bounded"),
        (col("_max_ratio") >= 1.0 - 1e-9).as("skew_floor_holds"),
        (col("_max_shift") <= maxShift).as("shift_within_threshold"),
        (col("_max_ratio") > maxRatio || col("_max_shift") > maxShift)
          .as("rebuild_recommended"))
  }

  /** Embedding clustering as a first-class operator: distributed
    * spherical k-means assignments (topic bucketing / domain mixing /
    * semantic dedup blocking). Centroid state is KB-sized on the
    * driver; every round is one map-only literal-argmax pass + one
    * (cell, dim) hash aggregate over the corpus — the 100 TB shape
    * (no per-pair work, no windows). Deterministic: k-means++ seeded
    * via the Gumbel-hash race ([[kmeansPlusPlusSeeds]]), centroids
    * rounded 1e-9 (ClusteringSpec pins repartition-invariance, that
    * label purity beats the no-training seed assignment, and that ++
    * seeding beats the old lowest-id seeds on an adversarial id
    * ordering). */
  def clusterAssignments(emb: DataFrame, k: Int = 8,
                         iters: Int = 5): DataFrame = {
    val cents = kmeansCentroids(emb, k, iters)
    emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("cluster", assignCell(col("v"), cents))
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
  }

  /** Product-quantization codebooks: the embedding dims split into `m`
    * subspaces; a per-subspace codebook of `codes` centroids trained by
    * the SAME distributed k-means (on the sliced sub-vectors). */
  private[operators] def pqCodebooks(emb: DataFrame, m: Int, codes: Int,
                                     iters: Int): Array[Array[Array[Double]]] = {
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // EUCLIDEAN k-means for the codebooks: reconstruction error is what
    // ADC accuracy depends on, and cosine assignment would discard the
    // sub-vector magnitudes the reconstruction needs. The training
    // sample is drawn ONCE here (not once per subspace — that would
    // count and scan the corpus m times) and every subspace trains on
    // a slice of the same cached sample.
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("embedding"))
    val n = base.count()
    val maxTrain = 8192L
    val rate = (n + maxTrain - 1) / maxTrain
    val sampled =
      (if (rate <= 1L) base
       else base.filter(pmod(xxhash64(col("vec_id")), lit(rate)) === 0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books = (0 until m).map { s =>
      kmeansCentroids(
        sampled.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        codes, iters, euclidean = true, maxTrain = Long.MaxValue)
    }.toArray
    sampled.unpersist(blocking = false)
    books
  }

  /** PQ ANN with asymmetric distance computation (ADC): the corpus is
    * stored as m small codes per vector (m·log₂(codes) bits — 64×
    * smaller than float32 at m=4, codes=16 on 64 dims; at 100 TB the
    * difference between an in-memory corpus and one that spills), and
    * each query scores a candidate by summing its PRE-COMPUTED
    * per-subspace dot tables at the candidate's codes — m array
    * lookups per pair instead of a dim-length loop. Cosine comes from
    * the ADC dot over the reconstruction norm (a code-indexed lookup
    * too). Same broadcast-queries shape as [[bruteForceTopK]];
    * ClusteringSpec pins recall@k against the float brute force.
    * Defaults (m=8, codes=64 → 48 bits ≈ 42× smaller than float32 at
    * 64 dims) are sized for near-isotropic embeddings (PQ's worst
    * case) — structured embedding spaces can drop to m=4/codes=16. */
  def pqTopK(emb: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, codes: Int = 64, iters: Int = 5): DataFrame = {
    val books = pqCodebooks(emb, m, codes, iters)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val sub = dim / m
    // |codebook entry|² per (subspace, code): reconstruction norm lookup
    val norm2 = books.map(_.map(c => c.map(x => x * x).sum).toSeq)

    def subv(v: Column, s: Int) = slice(v, s * sub + 1, sub)
    // all m code assignments in ONE fused native pass (bit-identical
    // scores + first-max tie break vs the composed per-subspace form,
    // PqAssignSpec) — no per-row slice arrays, no m×codes Column fanout
    val corpus = (0 until m).foldLeft(
      emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("cs", graft.functions.PqAssignAllExpr.column(col("v"), books))) {
      (df, s) => df.withColumn(s"c$s", element_at(col("cs"), s + 1))
    }.withColumn("rn2",
      (0 until m).map(s =>
        element_at(typedLit(norm2(s)), col(s"c$s") + 1)).reduce(_ + _))
      .drop("v", "cs")

    // per-query dot tables: qt_s[j] = q_s · book_s[j], computed once per
    // query (m·codes dots), broadcast with the query row
    val q = (0 until m).foldLeft(
      queries.select(col("vec_id").as("q_id"),
        toDouble(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv")))) { (df, s) =>
      df.withColumn(s"qt$s", array(books(s).map { c =>
        dot(subv(col("qv"), s), typedLit(c.toSeq))
      }: _*))
    }.drop("qv")

    val adcDot = (0 until m).map(s =>
      element_at(col(s"qt$s"), col(s"c$s") + 1)).reduce(_ + _)
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", adcDot / (col("qn") * sqrt(col("rn2"))))
    topKFromScored(scored, k)
  }

  /** Driver-checkable verdicts for the float-state operators (d13/d41/
    * d42): iterated k-means averages and ADC tables are engine-specific
    * floats, so the raw results can't hash-match a DuckDB replay.
    * These emit IN-PLAN boolean verdicts of the properties that matter
    * — recall against the in-plan float brute force, cohesion against
    * the untrained seed — over oracle-computable integer totals. Each
    * boolean is an exact integer/count comparison computed entirely
    * inside ONE engine, so no float ever crosses engines; the oracle
    * asserts the totals and `true` for each verdict. The floor margins
    * are far from the measured values (specs pin the tighter bounds),
    * so partitioning-order float noise can't flip a verdict. */

  /** d13: trained-IVF recall vs in-plan brute force — one row:
    * (n_bf, recall_floor_ok, multiprobe_no_worse).
    *
    * `recall_floor_ok` is an empirical margin (measured 0.52–0.53 at
    * both gate SFs with the defaults; the floor sits far below).
    * `multiprobe_no_worse` is a THEOREM, not a data property: the
    * nProbe-cell candidate pool contains the 1-probe pool, and a true
    * top-k member found in a pool survives any pool growth (only the
    * k−1 globally-better vectors can outrank it) — so the hit count
    * can never drop. A trained-beats-seed comparison deliberately does
    * NOT appear: on isotropic embeddings (no cluster structure) it is
    * a coin flip, and it flipped at sf0.1. */
  def ivfVerdict(emb: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 16, nProbe: Int = 2,
                 recallFloorPct: Int = 30): DataFrame = {
    val bf = bruteForceTopK(emb, queries, k).select(col("q_id"), col("neighbor_id"))
    def hits(ann: DataFrame, as: String) =
      ann.select(col("q_id"), col("neighbor_id"))
        .join(bf, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as(as))
    bf.agg(count(lit(1)).as("n_bf"))
      .crossJoin(hits(ivfTopK(emb, queries, k, nCells, nProbe), "_ht"))
      .crossJoin(hits(ivfTopK(emb, queries, k, nCells, nProbe = 1), "_h1"))
      .select(col("n_bf"),
        (col("_ht") * 100L >= col("n_bf") * recallFloorPct).as("recall_floor_ok"),
        (col("_ht") >= col("_h1")).as("multiprobe_no_worse"))
  }

  /** d41: Lloyd training improves total cohesion (sum of each vector's
    * cosine to its argmax centroid) over the untrained seed assignment
    * — one row: (n_vecs, k, cohesion_improves). */
  def kmeansVerdict(emb: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val vecs = emb.select(toDouble(col("embedding")).as("v"))
    def cohesion(cents: Array[Array[Double]], as: String) =
      vecs.select(array_max(centScores(col("v"), cents)).as("s"))
        .agg(sum(col("s")).as(as), count(lit(1)).as(as + "_n"))
    cohesion(kmeansCentroids(emb, k, iters), "_c1")
      .crossJoin(cohesion(kmeansCentroids(emb, k, 0), "_c0"))
      .select(col("_c1_n").as("n_vecs"), lit(k).cast("long").as("k"),
        (col("_c1") >= col("_c0")).as("cohesion_improves"))
  }

  /** d42: PQ-ADC recall@k vs in-plan float brute force — one row:
    * (n_bf, recall_floor_ok). The default floor is sized for
    * near-isotropic embeddings (PQ's worst case: measured 0.28–0.37
    * at gate SFs on the synthetic tables, which have no cluster
    * structure for the codebooks to exploit); ClusteringSpec pins the
    * tighter 0.4 bound at spec scale. */
  def pqVerdict(emb: DataFrame, queries: DataFrame, k: Int,
                recallFloorPct: Int = 20): DataFrame = {
    val bf = bruteForceTopK(emb, queries, k).select(col("q_id"), col("neighbor_id"))
    val hits = pqTopK(emb, queries, k).select(col("q_id"), col("neighbor_id"))
      .join(bf, Seq("q_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("_h"))
    bf.agg(count(lit(1)).as("n_bf")).crossJoin(hits)
      .select(col("n_bf"),
        (col("_h") * 100L >= col("n_bf") * recallFloorPct).as("recall_floor_ok"))
  }

  /** ANN via hyperplane LSH: candidates share a bucket. Multi-probe
    * (default): each query also probes the numPlanes buckets at hamming
    * distance 1 — the standard recall fix for sign-LSH, costing only a
    * wider broadcast of the (small) query set, never a second corpus
    * pass. */
  /** Semantic decontamination — the embedding-space counterpart of the
    * n-gram paths (d25 exact, d46 fuzzy): flag corpus docs whose
    * embedding sits above `threshold` cosine to ANY benchmark item.
    * Paraphrased eval questions share no 8-gram with the original but
    * land on nearly the same embedding — this is the pass that catches
    * them. Per flagged doc: how many bench items it matches, the max
    * cosine, and the smallest matching bench id.
    *
    * Scale shape: the d07 sign-LSH blocking reused cross-set — the
    * corpus computes its bucket MAP-ONLY and is never shuffled; the
    * (small) bench side multi-probes its bucket's hamming-1 neighbors
    * and BROADCASTS; candidates verify with one exact cosine; the
    * per-doc rollup keys on vec_id (unique — skew-free). A bench pair
    * can meet a corpus doc in at most one bucket (the probe list is
    * distinct buckets), so the hit counts need no distinct state.
    * Recall is the d07 trade, spec-pinned there; raise numPlanes'
    * probe width before ever considering a corpus shuffle. */
  def semanticDecontam(corpus: DataFrame, bench: DataFrame,
                       threshold: Double, dim: Int = 64,
                       numPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, numPlanes))
      .withColumn("n", norm(col("v")))
    val probes: Column => Seq[Column] = b =>
      b +: (0 until numPlanes).map(j => b.bitwiseXOR(lit(1L << j)))
    val q = bench.select(col("vec_id").as("bench_id"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket",
        explode(array(probes(hyperplaneBucket(col("qv"), dim, numPlanes)): _*)))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("bench_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
      .filter(col("cos") > threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        rd(max(col("cos")), 6).as("max_cos"),
        min(col("bench_id")).as("first_bench_id"))
  }

  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, numPlanes: Int = 8,
              multiProbe: Boolean = true): DataFrame = {
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, numPlanes))
      .withColumn("n", norm(col("v")))
    val probes: Column => Seq[Column] = b =>
      if (multiProbe) b +: (0 until numPlanes).map(j => b.bitwiseXOR(lit(1L << j)))
      else Seq(b)
    val q = queries.select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket",
        explode(array(probes(hyperplaneBucket(col("qv"), dim, numPlanes)): _*)))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    topKFromScored(scored, k)
  }

  /** Hard-negative mining for contrastive training data (the DPR /
    * sentence-transformers preparation step): per anchor, the top-k
    * most-similar corpus items with a DIFFERENT label — the negatives
    * that actually teach the model (random negatives are trivially
    * separable; the hardest near-misses carry the gradient). Composed
    * from the d06 brute-force scorer with the label inequality pushed
    * INTO the scored-candidate filter (never a post-rank filter,
    * which would under-fill k), ranked by the same O(k) heap
    * aggregate. Anchors broadcast (query-set-sized); at corpus scale
    * the scored candidates come from the LSH/IVF blocks instead —
    * same downstream shape. */
  def hardNegatives(emb: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val corpus = emb.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val q = anchors.select(col("vec_id").as("q_id"), col("label").as("q_label"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("n")))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("cos"), col("vec_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("neg_id"), rd(col("t.score"), 6).as("cos"))
  }

  /** Margin-based bitext mining (the Artetxe–Schwenk criterion that
    * curates parallel translation data from two monolingual embedding
    * spaces): a candidate pair's raw cosine is normalized by the mean
    * cosine of each side's k nearest neighbors — margin =
    * cos(x,y) / ((meanNNk(x) + meanNNk(y)) / 2) — which suppresses
    * "hub" vectors that are near everything; mined pairs are the
    * MUTUAL margin-argmaxes above a threshold.
    *
    * Determinism across engines: neighbor means are computed as SUMS
    * of integer-scaled cosines (`⌊cos·10⁶ + 0.5⌋` — exact given the
    * d05/d06-pinned dot products), because a float `avg` over rows
    * sums in partition order and drifts at the last bit; long sums
    * commute. The margin is then ONE double division of exact longs.
    * Ranking ties break on the counterpart id.
    *
    * Scale shape: the gate query scores all pairs with the small side
    * BROADCAST (the d06 brute-force baseline); at corpus scale the
    * scored-candidate table comes from the LSH/IVF blocks instead
    * ([[lshTopK]]/[[ivfTopK]] — same downstream margin machinery,
    * per-side state bounded by k), and the per-id windows stay
    * bounded by the candidate fan-in, never the corpus. */
  /** The corpus-scale path of [[bitextMine]]: candidate pairs come
    * from sign-LSH bucket blocking instead of the all-pairs cross
    * join — both sides bucket MAP-ONLY (one hyperplane pass each, the
    * d07 machinery), the A side multi-probes (flips each plane once)
    * to recover near-boundary pairs, and the only corpus-sized
    * movement is ONE shuffle on the bucket key (the d68 two-big-sides
    * shape; neither side broadcasts). Margins are then computed by
    * the same integer-sum machinery as the exact miner, with k-NN
    * means taken over each id's CANDIDATE fan-in (standard
    * approximation: hubs surface in any reasonable candidate set).
    * Recall vs the exact miner is spec-pinned. */
  def bitextMineLsh(embA: DataFrame, embB: DataFrame, k: Int,
                    minMargin: Double, dim: Int = 64,
                    numPlanes: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = embA.select(col("vec_id").as("a_id"), toDouble(col("embedding")).as("av"))
      .withColumn("an", norm(col("av")))
      .withColumn("b0", hyperplaneBucket(col("av"), dim, numPlanes))
      .withColumn("bucket", explode(array(
        (col("b0") +: (0 until numPlanes).map(j =>
          col("b0").bitwiseXOR(lit(1L << j)))): _*)))
      .drop("b0")
    val b = embB.select(col("vec_id").as("b_id"), toDouble(col("embedding")).as("bv"))
      .withColumn("bn", norm(col("bv")))
      .withColumn("bucket", hyperplaneBucket(col("bv"), dim, numPlanes))
    // multi-probe duplicates a pair once per shared probe: reduce to
    // distinct pairs BEFORE the dot products so each cosine is
    // computed once
    val cand = a.join(b, Seq("bucket"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("av")).as("av"), first(col("an")).as("an"),
        first(col("bv")).as("bv"), first(col("bn")).as("bn"))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .select(col("a_id"), col("b_id"), col("cos"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("c6"))
    mineFromScored(cand, k, minMargin)
  }

  def bitextMine(embA: DataFrame, embB: DataFrame, k: Int,
                 minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val a = embA.select(col("vec_id").as("a_id"), toDouble(col("embedding")).as("av"))
      .withColumn("an", norm(col("av")))
    val b = embB.select(col("vec_id").as("b_id"), toDouble(col("embedding")).as("bv"))
      .withColumn("bn", norm(col("bv")))
    val scored = a.crossJoin(broadcast(b))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .select(col("a_id"), col("b_id"), col("cos"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("c6"))
    mineFromScored(scored, k, minMargin)
  }

  /** Margin + mutual-argmax stage shared by the exact and LSH miners:
    * per-id windows run over the scored-candidate fan-in (the full
    * counterpart side for the exact miner, the bucket fan-in for the
    * LSH path — bounded either way by the candidate generator, never
    * the corpus). */
  private def mineFromScored(scored: DataFrame, k: Int,
                             minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))
    val wB = Window.partitionBy(col("b_id")).orderBy(col("cos").desc, col("a_id"))
    val ranked = scored
      .withColumn("ra", row_number().over(wA))
      .withColumn("rb", row_number().over(wB))
    val sumA = ranked.filter(col("ra") <= k)
      .groupBy("a_id").agg(sum(col("c6")).as("sa"))
    val sumB = ranked.filter(col("rb") <= k)
      .groupBy("b_id").agg(sum(col("c6")).as("sb"))
    // NO broadcast hint on the sum tables: they are id-sized — fine
    // to broadcast for a query-set-sized exact mine, but corpus-sized
    // on the LSH path where BOTH sides are big (AQE converts to
    // broadcast at runtime when a side turns out small; a hard hint
    // would OOM the corpus case)
    val margins = scored
      .join(sumA, "a_id").join(sumB, "b_id")
      .withColumn("margin",
        (col("c6") * 2.0 * k) / (col("sa") + col("sb")))
    val bestA = Window.partitionBy(col("a_id")).orderBy(col("margin").desc, col("b_id"))
    val bestB = Window.partitionBy(col("b_id")).orderBy(col("margin").desc, col("a_id"))
    margins
      .withColumn("ba", row_number().over(bestA))
      .withColumn("bb", row_number().over(bestB))
      .filter(col("ba") === 1 && col("bb") === 1 && col("margin") >= minMargin)
      .select(col("a_id"), col("b_id"), rd(col("cos"), 6).as("cos"),
        rd(col("margin"), 6).as("margin"))
  }
}
