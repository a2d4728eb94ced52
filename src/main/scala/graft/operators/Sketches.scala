package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch operators — what exact operators hand over to at 100 TB.
  *
  * Exact `countDistinct` shuffles every distinct value; an exact global
  * percentile sorts (or multi-passes) the column. The sketch versions
  * are ONE map-side-combinable aggregate with KB-sized state: HLL
  * (Apache DataSketches via `hll_sketch_agg`) for cardinality,
  * KLL-style `approx_percentile` for quantiles. Both are MERGEABLE —
  * per-partition sketches union to the global sketch with no loss vs
  * sketching globally (SketchesSpec pins the estimates equal), which is
  * exactly the property that lets 1000 executors sketch 100 TB
  * independently and combine in a final reduce.
  *
  * Oracle strategy: the estimates themselves are engine-specific, so
  * the gate emits the EXACT values (DuckDB-checkable) plus
  * within-tolerance BOOLEANS computed from the sketch — a hash match
  * proves both the exact arithmetic and the accuracy claim.
  */
object Sketches {

  /** Per-group distinct-token cardinality: exact count (the oracle
    * anchor), plus HLL-sketch and HLL++ (`approx_count_distinct`)
    * estimates as within-`tol` verdicts. lgK = 14 → ~1.6 KB sketch,
    * <1% standard error — per group, independent of corpus size. */
  def distinctReport(docs: DataFrame, text: Column, group: Column,
                     tol: Double = 0.05): DataFrame = {
    val x = docs.select(group.as("grp"), explode(TextOps.tokens(text)).as("token"))
    def within(est: Column, exact: Column): Column =
      abs(est.cast("double") - exact) / exact <= tol
    x.groupBy("grp").agg(
        countDistinct(col("token")).as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(col("token"), 14)).as("_hll"),
        approx_count_distinct(col("token"), 0.02).as("_acd"))
      .select(col("grp"), col("exact_distinct"),
        within(col("_hll"), col("exact_distinct")).as("hll_within_tol"),
        within(col("_acd"), col("exact_distinct")).as("acd_within_tol"))
  }

  /** Per-group quantiles: exact interpolated percentiles (the oracle
    * anchor — DuckDB `quantile_cont` parity is pinned by q16), plus
    * `approx_percentile` verdicts. The sketch's guarantee is on RANK,
    * not value (it returns a real element within ±1/accuracy of the
    * target rank; a value-relative check fails whenever the
    * distribution has a gap near the target), so the verdict is the
    * faithful one: the estimate must lie inside the exact
    * [p−rankTol, p+rankTol] value window. */
  def quantileReport(df: DataFrame, value: Column, group: Column,
                     rankTol: Double = 0.02, accuracy: Int = 10000): DataFrame = {
    def within(est: Column, p: Double): Column =
      est >= percentile(col("v"), lit(math.max(0.0, p - rankTol))) &&
        est <= percentile(col("v"), lit(math.min(1.0, p + rankTol)))
    df.select(group.as("grp"), value.cast("double").as("v"))
      .groupBy("grp").agg(
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"),
        within(approx_percentile(col("v"), lit(0.5), lit(accuracy)), 0.5)
          .as("p50_within_tol"),
        within(approx_percentile(col("v"), lit(0.9), lit(accuracy)), 0.9)
          .as("p90_within_tol"))
  }

  /** Heavy hitters with a count-min sketch: exact top-N token counts
    * (the oracle anchor — same TakeOrdered shape as d16) plus a CMS
    * frequency estimate per hitter as a within-bound verdict. The CMS
    * is ONE mergeable aggregate (`functions.count_min_sketch`, ~eps⁻¹ ×
    * depth integer cells regardless of vocabulary size) — at 100 TB the
    * exact groupBy shuffles the whole vocabulary, while the sketch
    * answers "how often does X occur" from a few-hundred-KB buffer.
    * The CMS guarantee is one-sided: est ≥ exact always, and
    * est ≤ exact + eps·total w.p. `confidence` — that is precisely the
    * verdict emitted. Tokens are pre-hashed (`xxhash64`) so the
    * aggregate and the driver-side probe use the identical long-hash
    * path. */
  def heavyHitters(docs: DataFrame, text: Column, topN: Int = 20,
                   eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = docs.sparkSession
    val toks = docs.select(explode(TextOps.tokens(text)).as("token"))
    val sk = toks.agg(
      count_min_sketch(xxhash64(col("token")), lit(eps), lit(confidence),
        lit(42)).as("cms"),
      count(lit(1)).as("total")).head
    val cms = CountMinSketch.readFrom(sk.getAs[Array[Byte]]("cms"))
    val bound = math.ceil(eps * sk.getAs[Long]("total")).toLong
    val exact = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("token"), col("n"), xxhash64(col("token")).as("h"))
      .orderBy(col("n").desc, col("token")).limit(topN).collect()
    val verdicts = exact.toSeq.map { r =>
      val est = cms.estimateCount(java.lang.Long.valueOf(r.getAs[Long]("h")))
      (r.getAs[String]("token"), r.getAs[Long]("n"),
        est >= r.getAs[Long]("n") && est <= r.getAs[Long]("n") + bound)
    }
    import spark.implicits._
    verdicts.toDF("token", "n", "cms_within_tol")
  }

  /** The scale path made visible: sketch each partition independently,
    * then union the partial sketches — the two-level shape a
    * 1000-executor reduce uses. Returns (global_estimate_direct,
    * global_estimate_merged); SketchesSpec asserts they are EQUAL,
    * because HLL union is lossless over the same lgK. */
  def mergeDemo(docs: DataFrame, text: Column): (Long, Long) = {
    val toks = docs.select(explode(TextOps.tokens(text)).as("token"))
    val direct = toks.agg(
      hll_sketch_estimate(hll_sketch_agg(col("token"), 14)).as("e"))
      .head.getLong(0)
    val merged = toks.withColumn("_part", spark_partition_id())
      .groupBy("_part").agg(hll_sketch_agg(col("token"), 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head.getLong(0)
    (direct, merged)
  }

  /** KMV/theta corpus-overlap estimation (the d112 gate) — estimate
    * |A ∩ B| between two corpora WITHOUT joining them: each side
    * aggregates to a bottom-k distinct sketch of the oracle-replayable
    * polynomial fingerprint ([[graft.functions.KmvSketchAgg]] — state
    * ≤ k longs per partition, partial-merge lossless, so the plan is
    * one two-phase aggregation per side and a 1×1 broadcast combine;
    * NOTHING shuffles with the corpus). From the union sketch S_U with
    * k-th minimum m over hash space M: est_union = (k−1)·M/m (exact-
    * count mode when the sketch is undersized), and the intersection
    * estimate follows the retained-minima rule
    * est_inter = |S_U ∩ S_A ∩ S_B| · est_union / k. The k=BIG sketch
    * CONTAINS every smaller-k sketch as a prefix (minima are nested),
    * so one aggregation pass serves every k: the gate emits one row
    * per requested k, slicing the master sketch — integer arithmetic
    * end to end, replayed exactly by the oracle. */
  def kmvOverlap(docs: DataFrame, text: Column, id: Column,
                 ks: Seq[Int] = Seq(64, 4096)): DataFrame = {
    val kMax = ks.max
    val withH = docs.select(id.as("doc_id"),
      TextOps.fingerprint(text).as("h"))
    // BOTH sketches in ONE aggregation pass: the corpus (and the
    // per-char fingerprint fold) is scanned once, not once per side —
    // the agg skips nulls, so a conditional input IS the side filter
    val both = withH.agg(
      graft.functions.KmvSketchAgg.column(
        when(col("doc_id") % 2 === 0, col("h")), lit(kMax)).as("sa"),
      graft.functions.KmvSketchAgg.column(
        when(col("doc_id") % 3 === 0, col("h")), lit(kMax)).as("sb"))
    val M = 2147483647L // the fingerprint modulus (31-bit prime)
    // one row per k, EXPLODED from the single aggregation row — a
    // union of per-k branches would re-evaluate the scan+agg subtree
    // once per k
    val kRows = ks.sorted.map { k =>
      struct(lit(k.toLong).as("k"),
        slice(col("sa"), 1, k).as("a"),
        slice(col("sb"), 1, k).as("b"))
    }
    both.select(explode(array(kRows: _*)).as("r"))
      .select(col("r.k").as("k"), col("r.a").as("a"), col("r.b").as("b"))
      .withColumn("su", slice(array_sort(array_union(col("a"), col("b"))),
        lit(1), col("k").cast("int")))
      .withColumn("n_sketch", size(col("su")).cast("long"))
      .withColumn("kth_min", element_at(col("su"), size(col("su"))).cast("long"))
      .withColumn("inter_in_sketch",
        size(array_intersect(array_intersect(col("su"), col("a")), col("b")))
          .cast("long"))
      .withColumn("est_union",
        when(col("n_sketch") < col("k"), col("n_sketch"))
          .otherwise(expr(s"(k - 1L) * ${M}L div kth_min")))
      .withColumn("est_inter",
        // undersized sketch = every distinct value retained: the
        // intersection count IS exact, no theta scaling
        when(col("n_sketch") < col("k"), col("inter_in_sketch"))
          .otherwise(expr("(inter_in_sketch * est_union) div k")))
      .select("k", "n_sketch", "kth_min", "inter_in_sketch",
        "est_union", "est_inter")
      .orderBy("k")
  }

  /** Scalar finisher over two PERSISTED kmv sketches — the arrays
    * [[graft.functions.KmvSketchAgg]] emits (bottom-k fingerprints,
    * ascending). Two warehoused sketches compare WITHOUT touching
    * either corpus again: sketch once per corpus snapshot, estimate
    * any pairwise overlap later from k longs a side. Same estimator
    * arithmetic as [[kmvOverlap]] (spec-pinned equal), pure column
    * composition (codegen'd, no UDF). Returns a struct (n_sketch,
    * kth_min, inter_in_sketch, est_union, est_inter, jaccard_ppm) at
    * sketch size `k` (inputs larger than k are sliced — sketches
    * persisted at kMax serve any smaller k). */
  def kmvCompare(sketchA: Column, sketchB: Column, k: Column): Column = {
    val M = 2147483647L // the fingerprint modulus (31-bit prime)
    val a = slice(sketchA, lit(1), k.cast("int"))
    val b = slice(sketchB, lit(1), k.cast("int"))
    val su = slice(array_sort(array_union(a, b)), lit(1), k.cast("int"))
    val nSketch = size(su).cast("long")
    // both sketches empty (e.g. built over a zero-row filter) → size 0;
    // element_at with index 0 raises — guard to null (estUnion takes the
    // nSketch < k branch there, so a null kth_min never reaches idiv)
    val kthMin =
      when(size(su) > 0, element_at(su, size(su))).otherwise(lit(null)).cast("long")
    val interInSketch =
      size(array_intersect(array_intersect(su, a), b)).cast("long")
    // exact INTEGRAL division (SQL `div` — products reach 2^55, past
    // double-exactness, so float divide-and-floor would drift)
    def idiv(x: Column, y: Column): Column = call_function("div", x, y)
    val estUnion = when(nSketch < k.cast("long"), nSketch)
      .otherwise(idiv((k.cast("long") - 1L) * lit(M), kthMin))
    val estInter = when(nSketch < k.cast("long"), interInSketch)
      .otherwise(idiv(interInSketch * estUnion, k.cast("long")))
    struct(
      nSketch.as("n_sketch"),
      kthMin.as("kth_min"),
      interInSketch.as("inter_in_sketch"),
      estUnion.as("est_union"),
      estInter.as("est_inter"),
      when(estUnion > 0L, idiv(estInter * 1000000L, estUnion))
        .otherwise(lit(0L)).as("jaccard_ppm"))
  }
}
