package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Round.rd
import graft.operators.{AsOfJoin, Profile, RangeJoin, SkewJoin}

/** Relational core q01–q18 (SURVEY.md §2.4): the query surface the
  * reference's users get from SQLite/DuckDB over the `slurm` table,
  * re-expressed as Catalyst plans over the driver tables.
  *
  * Scale notes per query are in the inline comments; dims are
  * broadcast, aggregates partial, filters pushed to the parquet scan.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q11's wide conditional-pivot report — shared with q21's unpivot. */
  private def pivoted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        rd(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2).as("price_f"),
        rd(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))), 2).as("price_o"),
        rd(sum(when(col("o_orderstatus") === "P", col("o_totalprice"))), 2).as("price_p"),
        count(lit(1)).as("n_orders"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // scan→filter→groupBy multi-agg; map-side partial agg, one shuffle.
    "q01_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          rd(sum(col("l_quantity")), 2).as("sum_qty"),
          rd(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          rd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          rd(avg(col("l_quantity")), 6).as("avg_qty"),
          rd(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // fact ⋈ small dim: part is broadcast — no fact shuffle.
    "q02_broadcast_join" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_size") < 15)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(rd(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")),

    // customer ⋈ orders ⋈ lineitem, agg + top-k by revenue.
    "q03_multi_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(rd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    // EXISTS / NOT EXISTS as left_semi / left_anti (no row explosion).
    "q04_semi_anti" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val semi = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(lit("with_bulk_item").as("kind"), col("o_totalprice"))
      val anti = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(lit("without_bulk_item").as("kind"), col("o_totalprice"))
      semi.unionByName(anti)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_orders"),
          rd(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy("kind")
    }),

    // 5-way star join; all dims broadcast, single fact pass.
    "q05_star_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(rd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // selective filter + narrow projection — pushed to the parquet scan.
    "q06_filter_pushdown" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(rd(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))),

    // ranking + running sum windows; one shuffle on the partition key.
    "q07_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running_qty", rd(sum(col("l_quantity"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("running_qty"))
        .orderBy("l_suppkey", "rn")
    }),

    // exact distinct + conditional aggregation in one pass.
    "q08_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_big"))
        .orderBy("o_orderpriority")),

    // global top-k: TakeOrderedAndProject, no full sort at scale.
    "q09_topk_sort" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    // union + dedup (hash aggregate on the full row).
    "q10_union_dedup" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"))
      val b = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      a.union(b).distinct()
        .agg(count(lit(1)).as("n_custkeys"))
    }),

    // pivot via conditional aggregation (no per-key pass).
    "q11_conditional_pivot" -> ((s, dir) =>
      pivoted(s, dir).orderBy("c_mktsegment")),

    // UNPIVOT — the melt direction of q11's pivot (wide report → long
    // (segment, status, value) rows). Spark's native unpivot keeps
    // NULL cells, DuckDB's drops them; filter explicitly so the
    // contract is engine-independent. Map-only over the wide input.
    "q21_unpivot" -> ((s, dir) =>
      pivoted(s, dir)
        .unpivot(Array(col("c_mktsegment")),
          Array(col("price_f"), col("price_o"), col("price_p")),
          "status", "price")
        .filter(col("price").isNotNull)
        .orderBy("c_mktsegment", "status")),

    // table profiling: per-column nulls/distincts/ranges in ONE
    // aggregation pass over one lineitem scan (the ANALYZE step)
    "q22_profile" -> ((s, dir) =>
      Profile.numeric(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_suppkey", "l_partkey"))
        .orderBy("col_name")),

    // fixed-width value histogram: bounded key space, partial-agg only
    "q23_histogram" -> ((s, dir) =>
      Profile.histogram(t(s, dir, "lineitem"), col("l_extendedprice"),
        width = 5000.0)
        .orderBy("bucket")),

    // sessionization: 30-min-gap sessions via lag + cumulative flag sum.
    "q12_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          rd(sum(col("value")), 2).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // tumbling-window batch agg — batch twin of the streaming module.
    "q13_time_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          rd(sum(col("value")), 2).as("total_value"))
        .orderBy("hour_bucket", "event_type")),

    // hierarchical rollup (region → nation) with partial aggregation.
    "q14_rollup" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          rd(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    // skew-safe join: the salted (key, salt) equi-join produces the
    // IDENTICAL result to a plain join (the oracle IS the plain join) —
    // the hot key just arrives spread across n reducers. AQE skew-join
    // covers shuffles it can split; the salt is the planner-independent
    // form (SURVEY §6, SkewJoin).
    "q18_skew_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val dim = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id",
        saltBy = "event_id", n = 8)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          rd(sum(col("value")), 2).as("total_value"),
          max(col("n_events")).as("n_events"))
        .orderBy("user_id")
    }),

    // explicit grouping sets (finer than rollup: arbitrary set list);
    // one pass, Expand + partial aggregation — no per-set rescans.
    "q17_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          rd(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    // exact interpolated percentiles per group (one pass, sort-based
    // aggregate; at 100 TB swap to approx_percentile sketches).
    "q16_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          rd(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          rd(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          rd(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
          rd(min(col("o_totalprice")), 4).as("p_min"),
          rd(max(col("o_totalprice")), 4).as("p_max"))
        .orderBy("o_orderpriority")),

    // interval join: events falling inside per-order 6-hour windows.
    // Spark-first scale shape: bin the time axis + equi-join on bin +
    // exact range filter (RangeJoin.binned) — a hash join, never the
    // BroadcastNestedLoopJoin a bare BETWEEN join would plan.
    "q19_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("ts"), col("value"))
      val iv = t(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"),
          to_timestamp(lit("2024-01-01 00:00:00")).plus(
            expr("make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 31536000)")).as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 6 HOURS"))
      graft.operators.RangeJoin.binned(ev, col("ts"), iv,
        col("w_start"), col("w_end"), binS = 21600L)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_events"),
          rd(sum(col("value")), 2).as("total_value"))
        .orderBy("o_orderkey")
    }),

    // sliding RANGE-frame window: per-customer trailing-30-day order
    // total — the time-decayed rolling metric every monitoring/feature
    // pipeline needs. RANGE (not ROWS) so equal-date peers aggregate
    // together; the sum runs in DECIMAL so both engines are bit-exact.
    // One shuffle on the partition key; frame state is O(window), not
    // O(partition).
    "q20_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        // NTZ has no direct → long cast; route through LTZ (session TZ
        // is UTC, deterministic)
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(14,2)")).over(w)
            .cast("double").as("sum_30d"),
          count(lit(1)).over(w).cast("long").as("n_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // as-of join: latest event at-or-before each order date per customer
    // key-group. Spark-first: union both sides tagged, one window pass
    // (last_value of event attrs over time order) — no O(n²) range join,
    // single shuffle on the key (SURVEY §2.4 #39).
    "q15_asof_join" -> ((s, dir) => {
      // probe time = o_orderkey mapped into the events' 2024 timeline:
      // deterministic per-order probe timestamps spread over the year
      val probes = t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_custkey").as("uid"),
          to_timestamp(concat(lit("2024-01-01 00:00:00"))).plus(
            expr("make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 31536000)")).as("ts"))
      val events = t(s, dir, "events")
        .filter(col("user_id") < 100)
        .select(col("user_id").as("uid"), col("ts"),
          col("value").as("asof_value"))
      graft.operators.AsOfJoin.backward(probes, events,
        keys = Seq("uid"), tsCol = "ts", payloads = Seq("asof_value"))
        .select(col("o_orderkey"), col("uid"), col("asof_value"))
        .orderBy("o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q02_broadcast_join" ->
      """SELECT p_brand, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n_items
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_size < 15 GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q03_multi_join_topk" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING'
        | GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin.replaceAll("\n", " "),
    "q04_semi_anti" ->
      """WITH bulk AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 45)
        | SELECT kind, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price FROM (
        |   SELECT 'with_bulk_item' AS kind, o_totalprice FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM bulk)
        |   UNION ALL
        |   SELECT 'without_bulk_item' AS kind, o_totalprice FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM bulk)
        | ) GROUP BY kind ORDER BY kind""".stripMargin.replaceAll("\n", " "),
    "q05_star_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q06_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_items
        | FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin.replaceAll("\n", " "),
    "q07_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER w AS rn,
        |  round(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        | FROM lineitem
        | WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_quantity)
        |) WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin.replaceAll("\n", " "),
    "q08_distinct" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders,
        | sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)::BIGINT AS n_big
        | FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q09_topk_sort" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    "q10_union_dedup" ->
      """SELECT count(*) AS n_custkeys FROM (
        | SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        | UNION
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin.replaceAll("\n", " "),
    "q11_conditional_pivot" ->
      """SELECT c_mktsegment,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS price_f,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS price_o,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS price_p,
        | count(*) AS n_orders
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q21_unpivot" ->
      """WITH q11 AS (SELECT c_mktsegment,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS price_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS price_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS price_p
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        | SELECT c_mktsegment, status, price FROM (
        |  SELECT c_mktsegment, 'price_f' AS status, price_f AS price FROM q11
        |  UNION ALL SELECT c_mktsegment, 'price_o', price_o FROM q11
        |  UNION ALL SELECT c_mktsegment, 'price_p', price_p FROM q11)
        | WHERE price IS NOT NULL ORDER BY c_mktsegment, status""".stripMargin.replaceAll("\n", " "),
    "q22_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           | (count(*) - count($c))::BIGINT AS n_nulls,
           | count(DISTINCT $c)::BIGINT AS n_distinct,
           | round(min($c)::DOUBLE, 6) AS min_val,
           | round(max($c)::DOUBLE, 6) AS max_val FROM lineitem""".stripMargin.replaceAll("\n", " ")
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_suppkey", "l_partkey")
        .map(one).mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
    },
    "q23_histogram" ->
      """SELECT floor(l_extendedprice::DOUBLE / 5000.0)::BIGINT AS bucket, count(*)::BIGINT AS n
        | FROM lineitem WHERE l_extendedprice IS NOT NULL
        | GROUP BY 1 ORDER BY bucket""".stripMargin.replaceAll("\n", " "),
    "q12_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 2) AS session_value FROM (
        | SELECT user_id, value,
        |  (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
        | FROM (
        |  SELECT user_id, ts, event_id, value,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |     OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT > 1800
        |   THEN 1 ELSE 0 END AS new_sess
        |  FROM events))
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q13_time_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_bucket, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q14_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY ROLLUP (r_name, n_name)
        | ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin.replaceAll("\n", " "),
    "q18_skew_join" ->
      """WITH d AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        | SELECT e.user_id, count(*) AS n_rows, round(sum(e.value), 2) AS total_value,
        |  max(d.n_events) AS n_events
        | FROM events e JOIN d ON e.user_id = d.user_id
        | GROUP BY e.user_id ORDER BY e.user_id""".stripMargin.replaceAll("\n", " "),
    "q17_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        | GROUPING(o_orderpriority, o_orderstatus)::BIGINT AS gid,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        | FROM orders
        | GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        | ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin.replaceAll("\n", " "),
    "q16_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        | round(min(o_totalprice), 4) AS p_min,
        | round(max(o_totalprice), 4) AS p_max
        | FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\n", " "),
    "q19_range_join" ->
      """WITH iv AS (SELECT o_orderkey,
        |   TIMESTAMP '2024-01-01 00:00:00' + to_seconds(o_orderkey % 31536000) AS w_start
        |  FROM orders WHERE o_orderkey % 500 = 0)
        | SELECT o_orderkey, count(*) AS n_events, round(sum(e.value), 2) AS total_value
        | FROM events e JOIN iv
        |   ON floor(epoch(e.ts))::BIGINT BETWEEN epoch(iv.w_start)::BIGINT
        |     AND epoch(iv.w_start + INTERVAL 6 HOUR)::BIGINT
        | GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q15_asof_join" ->
      """SELECT o_orderkey, o_custkey AS uid, e.value AS asof_value
        | FROM (SELECT o_orderkey, o_custkey,
        |        TIMESTAMP '2024-01-01 00:00:00' + to_seconds(o_orderkey % 31536000) AS probe_ts
        |       FROM orders WHERE o_custkey < 100) o
        | ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE user_id < 100) e
        |   ON o.o_custkey = e.user_id AND o.probe_ts >= e.ts
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),
    "q20_range_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | (sum(o_totalprice::DECIMAL(14,2)) OVER w)::DOUBLE AS sum_30d,
        | (count(*) OVER w)::BIGINT AS n_30d
        | FROM orders WHERE o_custkey < 200
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        | ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin.replaceAll("\n", " ")
  )
}
