package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Breadth coverage: projection math (Web Mercator as column expressions —
  * R3's forward math in the plan, not a UDF), distinct aggregates, set
  * operations, and rollup grouping — all free Spark capability the
  * reference lacks but a reference user gains (SURVEY.md §2.6/§2.8 notes).
  */
object MiscQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R3: EPSG:4326 → 3857 forward projection per row, pure column math.
    // ln/tan are libm-dependent → rounded to 4 dp (0.1 mm).
    "q44_webmercator" -> ((s, d) => {
      val lon = ((col("c_custkey") % 360) - lit(180)).cast("double") + lit(0.5)
      val lat = ((col("c_custkey") % 160) - lit(80)).cast("double") + lit(0.5)
      val x = lit(6378137.0) * radians(lon)
      val y = lit(6378137.0) * log(tan(lit(math.Pi / 4) + radians(lat) / 2))
      customer(s, d).select(col("c_custkey"),
        round(x, 4).as("mx"), round(y, 4).as("my"))
    }),

    // As-of join, single-pass window formulation: attach to every purchase
    // the most recent click by the same user at-or-before it in
    // (ts, event_id) order. No join at all — union semantics via one
    // user_id window with last(..., ignoreNulls) over the merged stream;
    // one shuffle, state bounded per user. The classic time-series as-of
    // shape without the range-join blowup.
    "q72_asof_click" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_seconds(col("ts")).as("ts_s"),
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w).as("click_id"),
          last(when(col("event_type") === "click", unix_seconds(col("ts"))),
            ignoreNulls = true).over(w).as("click_ts_s"))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_s"),
          col("click_id"), col("click_ts_s"),
          (col("ts_s") - col("click_ts_s")).as("lag_s"))
    }),

    // Funnel analysis: per-user first-occurrence ordering of
    // signup → view → purchase. One conditional-min aggregate per user —
    // a single shuffle regardless of corpus size.
    "q73_funnel" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", unix_seconds(col("ts")))).as("s_s"),
          min(when(col("event_type") === "view", unix_seconds(col("ts")))).as("v_s"),
          min(when(col("event_type") === "purchase", unix_seconds(col("ts")))).as("p_s"))
        .select(col("user_id"), col("s_s"), col("v_s"), col("p_s"),
          (col("s_s").isNotNull && col("v_s").isNotNull && col("p_s").isNotNull &&
            col("s_s") < col("v_s") && col("v_s") < col("p_s")).as("converted"))),

    // Range (interval) join, executed as a BUCKETED equi-join: each
    // maintenance window is exploded to the hour buckets it covers, events
    // carry their hour bucket, and the range predicate becomes a residual
    // filter after a plain hash join on the bucket — the standard rewrite
    // that keeps an interval join shuffle-bounded at 100 TB (a naive
    // theta-join would be a broadcast nested loop). Windows derive from
    // nation (25 disjoint 5 h windows across January).
    "q74_interval_join" -> ((s, d) => {
      val base = 1704067200L // 2024-01-01T00:00:00Z
      val wins = nation(s, d).select(
        col("n_nationkey").as("win_id"),
        (lit(base) + col("n_nationkey") * 29L * 3600L).as("w_start"),
        (lit(base) + col("n_nationkey") * 29L * 3600L + 5L * 3600L).as("w_end"))
      val winBuckets = wins.select(col("win_id"), col("w_start"), col("w_end"),
        explode(sequence(floor(col("w_start") / 3600L),
                         floor((col("w_end") - 1) / 3600L))).as("hb"))
      val ev = events(s, d).select(col("event_id"),
          unix_seconds(col("ts")).as("ts_s"))
        .withColumn("hb", floor(col("ts_s") / 3600L))
      ev.join(winBuckets, "hb")
        .filter(col("ts_s") >= col("w_start") && col("ts_s") < col("w_end"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts_s")).as("first_s"),
             max(col("ts_s")).as("last_s"))
    }),

    // Time-RANGE window frame: per-user trailing 24 h event-value sum —
    // a value-based frame (all rows within the interval, ties included),
    // not a row-count frame like q48's MA. One user_id shuffle.
    "q75_rolling_range" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-86399L, 0L)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_seconds(col("ts")).as("ts_s"),
          col("value").cast("decimal(18,2)").as("v"))
        .select(col("user_id"), col("event_id"), col("ts_s"),
          sum(col("v")).over(w).cast("double").as("day_sum"))
    }),

    // Pivot: per-user event-type counts as columns (explicit value list →
    // deterministic schema; one partial+final aggregate, no extra shuffle
    // vs a plain group-by).
    "q76_pivot" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        // empty pivot cells are NULL in Spark but 0 under a FILTER count —
        // coalesce for parity
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("click_n"),
          coalesce(col("view"), lit(0L)).as("view_n"),
          coalesce(col("purchase"), lit(0L)).as("purchase_n"),
          coalesce(col("signup"), lit(0L)).as("signup_n"),
          coalesce(col("error"), lit(0L)).as("error_n"))),

    // Data-quality expectations report — the pre-load validation pass
    // (null keys, domain violations, duplicate keys, date-range outliers)
    // as ONE aggregate over the fact table: every expectation is a
    // conditional sum inside a single scan, no per-check jobs.
    "q77_data_quality" -> ((s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_null_key"),
        sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("n_bad_qty"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5, 1L)
          .otherwise(0L)).as("n_bad_discount"),
        // null-safe duplicate count: restrict BOTH the row count and the
        // distinct count to rows with fully non-null keys (Spark's
        // countDistinct skips any-null rows while DuckDB's tuple DISTINCT
        // counts them — the two would diverge exactly when null keys
        // exist, which is what this report detects)
        (sum(when(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull, 1L)
            .otherwise(0L)) -
          countDistinct(col("l_orderkey"), col("l_linenumber"))).as("n_dup_keys"),
        sum(when(col("l_shipdate") > lit("2026-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("n_future_ship"))),

    // CUBE grouping: all 2^2 grouping-set combinations of (region,
    // market segment) in one pass — partial aggregation expands the
    // grouping sets map-side, one shuffle total.
    "q81_cube" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
             sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))),

    // Portable HyperLogLog distinct sketch (m = 64): bucket/rho from the
    // shared ~40-bit char-fold hash, one hash-aggregate to the 64
    // registers, then the harmonic estimate — every step generated from
    // the same constants as the DuckDB oracle, so the ESTIMATE itself
    // hash-matches (engine-native approx_count_distinct never can). The
    // register table is 64 rows regardless of input size — the same
    // merge shape a partial-sketch reduction has at 100 TB.
    "q82_hll_distinct" -> ((s, d) => {
      import graft.ext.Sketches._
      val m = HllBuckets
      // two LCG scrambles: bucket from the first stream, rho bits from the
      // second (layered selects — each hash column materialized once)
      val regs = hllRegisters(lineitem(s, d), col("l_orderkey"))
      val packed = regs.agg(
        sort_array(collect_list(struct(col("bucket"), col("mx")))).as("rs"),
        count(lit(1)).as("nb"))
      val exact = lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      val harmonic =
        aggregate(col("rs"), lit(0.0), (acc, r) =>
          acc + lit(1.0) /
            call_function("shiftleft", lit(1L), r("mx").cast("int")).cast("double")) +
          (lit(m) - col("nb")).cast("double")
      packed.crossJoin(exact)
        .select(col("n_exact"), (lit(m) - col("nb")).as("n_empty"),
          (hllAlphaM2 / harmonic).as("eraw"), col("nb"))
        .select(col("n_exact"), col("n_empty"),
          round(when(col("eraw") <= 2.5 * m && col("n_empty") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("n_empty").cast("double")))
            .otherwise(col("eraw")), 6).as("estimate"))
        .select(col("n_exact"), col("n_empty"), col("estimate"),
          round(abs(col("estimate") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("err"))
    }),

    // Left-semi join (EXISTS): customers holding at least one URGENT
    // order — the probe side streams, no row multiplication.
    "q84_semi_join" -> ((s, d) => {
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Left-outer join with null-aware aggregation: every customer with
    // their order count and total — zero/NULL for the orderless third of
    // the table (the classic outer-join null contract).
    "q85_left_join_nulls" -> ((s, d) => {
      val ordAgg = orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      customer(s, d)
        .join(ordAgg, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("total"),
          col("n_orders").isNull.as("is_orderless"))
    }),

    // Mergeable HLL registers — the incremental-corpus distinct count:
    // build a register table per partition (here l_orderkey % 2 halves),
    // merge with union + per-bucket max, and show the merged estimate
    // equals the whole-table estimate (register max is associative — the
    // property that lets 100 TB partial sketches reduce tree-wise without
    // ever re-scanning). Same portable construction as q82.
    "q86_hll_merge" -> ((s, d) => {
      import graft.ext.Sketches._
      val m = HllBuckets
      def registers(part: Option[Int]) = {
        val src = part match {
          case Some(p) => lineitem(s, d).filter(col("l_orderkey") % 2 === p)
          case None => lineitem(s, d)
        }
        hllRegisters(src, col("l_orderkey"))
      }
      def estimate(regs: org.apache.spark.sql.DataFrame, name: String) = {
        val harmonic =
          aggregate(col("rs"), lit(0.0), (acc, r) =>
            acc + lit(1.0) /
              call_function("shiftleft", lit(1L), r("mx").cast("int")).cast("double")) +
            (lit(m) - col("nb")).cast("double")
        regs.agg(
            sort_array(collect_list(struct(col("bucket"), col("mx")))).as("rs"),
            count(lit(1)).as("nb"))
          .select((hllAlphaM2 / harmonic).as("eraw"), (lit(m) - col("nb")).as("nv"))
          .select(round(when(col("eraw") <= 2.5 * m && col("nv") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("nv").cast("double")))
            .otherwise(col("eraw")), 6).as(name))
      }
      val merged = registers(Some(0)).unionByName(registers(Some(1)))
        .groupBy(col("bucket")).agg(max(col("mx")).as("mx"))
      estimate(registers(None), "est_whole")
        .crossJoin(estimate(merged, "est_merged"))
        .select(col("est_whole"), col("est_merged"),
          (col("est_whole") === col("est_merged")).as("registers_mergeable"))
    }),

    // Exact distinct aggregate per group.
    "q45_distinct_agg" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n_orders"))),

    // Set operations on (user, day) activity sets:
    // (click ∩ purchase) \ error.
    "q46_setops" -> ((s, d) => {
      def userDays(t: String) = events(s, d)
        .filter(col("event_type") === t)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      userDays("click").intersect(userDays("purchase")).except(userDays("error"))
    }),

    // NDVI time-series analog (SURVEY §1.1 implicit time series): per-key
    // date-ordered 3-row moving aggregate. Window sums run over exact
    // DECIMAL (segment-tree vs linear accumulation order differs between
    // engines; decimal is order-independent), cast to double at the end.
    "q48_timeseries_ma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber) is NOT unique in this data — order by
      // the value columns too so any remaining ties are full-duplicate
      // rows (frame sums then agree regardless of engine tie order).
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
                 col("l_quantity"), col("l_extendedprice"), col("l_partkey"))
        .rowsBetween(-2, 0)
      lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"),
        (sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("qty_ma3"))
    }),

    // Exact per-group median (sort-based percentile; Spark and DuckDB use
    // the same p*(n-1) linear interpolation; integer-valued quantities
    // make every interpolated value exact).
    "q54_median" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
             expr("percentile(l_quantity, 0.9)").as("p90_qty"),
             count(lit(1)).as("n"))),

    // Rollup grouping (region → nation → grand total).
    "q47_rollup" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))),
  )

  val oracle: Map[String, String] = Map(
    "q86_hll_merge" -> {
      import graft.ext.Sketches._
      val m = HllBuckets
      def regsSql(pred: String) =
        s"""SELECT bucket, max(rho) AS mx FROM (
              SELECT bucket, ${hllRhoSql("w")} AS rho FROM (
                SELECT h1 % $m AS bucket, ${hllMixSql("h1")} AS w FROM (
                  SELECT ${hllMixSql("h0")} AS h1 FROM (
                    SELECT ${hllHashSql("CAST(l_orderkey AS VARCHAR)")} AS h0
                    FROM lineitem $pred))))
            GROUP BY bucket"""
      def estSql(regsCte: String, out: String) =
        s"""SELECT round(CASE WHEN eraw <= ${2.5 * m} AND nv > 0
                              THEN $m.0 * ln($m.0 / nv::DOUBLE)
                              ELSE eraw END, 6) AS $out
            FROM (
              SELECT $hllAlphaM2Sql /
                       (list_reduce(list_prepend(0.0::DOUBLE,
                          list_transform(rs, rr ->
                            1.0::DOUBLE / ((1::BIGINT << rr.mx)::DOUBLE))),
                          (sa, sb) -> sa + sb)
                        + ($m - nb)::DOUBLE) AS eraw,
                     ($m - nb) AS nv
              FROM (SELECT list({'bucket': bucket, 'mx': mx} ORDER BY bucket) AS rs,
                           CAST(count(*) AS BIGINT) AS nb
                    FROM $regsCte))"""
      s"""WITH whole AS (${regsSql("")}),
            part0 AS (${regsSql("WHERE l_orderkey % 2 = 0")}),
            part1 AS (${regsSql("WHERE l_orderkey % 2 = 1")}),
            merged AS (
              SELECT bucket, max(mx) AS mx FROM
                (SELECT * FROM part0 UNION ALL SELECT * FROM part1)
              GROUP BY bucket),
            ew AS (${estSql("whole", "est_whole")}),
            em AS (${estSql("merged", "est_merged")})
          SELECT est_whole, est_merged,
                 (est_whole = est_merged) AS registers_mergeable
          FROM ew CROSS JOIN em"""
    },
    "q84_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')""",
    "q85_left_join_nulls" ->
      """SELECT c_custkey,
                CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
                total,
                (n_orders IS NULL) AS is_orderless
         FROM customer
         LEFT JOIN (SELECT o_custkey,
                           CAST(count(*) AS BIGINT) AS n_orders,
                           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                    FROM orders GROUP BY o_custkey) o
           ON c_custkey = o_custkey""",
    "q82_hll_distinct" -> {
      import graft.ext.Sketches._
      val m = HllBuckets
      s"""WITH regs AS (
            SELECT bucket, max(rho) AS mx FROM (
              SELECT bucket, ${hllRhoSql("w")} AS rho FROM (
                SELECT h1 % $m AS bucket, ${hllMixSql("h1")} AS w FROM (
                  SELECT ${hllMixSql("h0")} AS h1 FROM (
                    SELECT ${hllHashSql("CAST(l_orderkey AS VARCHAR)")} AS h0
                    FROM lineitem))))
            GROUP BY bucket),
          packed AS (
            SELECT list({'bucket': bucket, 'mx': mx} ORDER BY bucket) AS rs,
                   CAST(count(*) AS BIGINT) AS nb
            FROM regs),
          ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
                 FROM lineitem),
          est0 AS (
            SELECT n_exact, ($m - nb) AS n_empty,
                   $hllAlphaM2Sql /
                     (list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(rs, rr ->
                          1.0::DOUBLE / ((1::BIGINT << rr.mx)::DOUBLE))),
                        (sa, sb) -> sa + sb)
                      + ($m - nb)::DOUBLE) AS eraw
            FROM packed CROSS JOIN ex),
          est1 AS (
            SELECT n_exact, n_empty,
                   round(CASE WHEN eraw <= ${2.5 * m} AND n_empty > 0
                              THEN $m.0 * ln($m.0 / n_empty::DOUBLE)
                              ELSE eraw END, 6) AS estimate
            FROM est0)
          SELECT n_exact, n_empty, estimate,
                 round(abs(estimate - n_exact::DOUBLE) / n_exact::DOUBLE, 6) AS err
          FROM est1"""
    },
    "q81_cube" ->
      """SELECT r_name, c_mktsegment,
                CAST(count(*) AS BIGINT) AS n_cust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE (r_name, c_mktsegment)""",
    "q77_data_quality" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
                CAST(sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_qty,
                CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_discount,
                CAST(count(*) FILTER (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
                     - count(DISTINCT (l_orderkey, l_linenumber))
                       FILTER (l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
                     AS BIGINT) AS n_dup_keys,
                CAST(sum(CASE WHEN l_shipdate > TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_future_ship
         FROM lineitem""",
    // oracle uses the naive range join — the bucketed equi-join rewrite
    // must be result-identical
    "q74_interval_join" ->
      """WITH wins AS (
           SELECT n_nationkey AS win_id,
                  1704067200 + n_nationkey * 29 * 3600 AS w_start,
                  1704067200 + n_nationkey * 29 * 3600 + 5 * 3600 AS w_end
           FROM nation),
         ev AS (SELECT event_id, epoch_ns(ts) // 1000000000 AS ts_s FROM events)
         SELECT win_id,
                CAST(count(*) AS BIGINT) AS n_events,
                min(ts_s) AS first_s,
                max(ts_s) AS last_s
         FROM ev JOIN wins ON ts_s >= w_start AND ts_s < w_end
         GROUP BY win_id""",
    "q75_rolling_range" ->
      """SELECT user_id, event_id, ts_s,
                CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts_s
                                  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS day_sum
         FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s,
                      CAST(value AS DECIMAL(18,2)) AS v
               FROM events)""",
    "q76_pivot" ->
      """SELECT user_id,
                CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click_n,
                CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view_n,
                CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase_n,
                CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup_n,
                CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error_n
         FROM events GROUP BY user_id""",
    "q72_asof_click" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, event_type,
                  epoch_ns(ts) // 1000000000 AS ts_s
           FROM events WHERE event_type IN ('click', 'purchase')),
         wf AS (
           SELECT user_id, event_id, event_type, ts_s,
                  last_value(CASE WHEN event_type = 'click' THEN event_id END
                             IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS click_id,
                  last_value(CASE WHEN event_type = 'click' THEN ts_s END
                             IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS click_ts_s
           FROM e)
         SELECT user_id, event_id AS purchase_id, ts_s,
                click_id, click_ts_s, ts_s - click_ts_s AS lag_s
         FROM wf WHERE event_type = 'purchase'""",
    "q73_funnel" ->
      """SELECT user_id, s_s, v_s, p_s,
                (s_s IS NOT NULL AND v_s IS NOT NULL AND p_s IS NOT NULL
                 AND s_s < v_s AND v_s < p_s) AS converted
         FROM (
           SELECT user_id,
                  min(CASE WHEN event_type = 'signup'
                           THEN epoch_ns(ts) // 1000000000 END) AS s_s,
                  min(CASE WHEN event_type = 'view'
                           THEN epoch_ns(ts) // 1000000000 END) AS v_s,
                  min(CASE WHEN event_type = 'purchase'
                           THEN epoch_ns(ts) // 1000000000 END) AS p_s
           FROM events GROUP BY user_id)""",
    "q44_webmercator" ->
      """SELECT c_custkey,
                round(6378137.0 * radians(lon), 4) AS mx,
                round(6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)), 4) AS my
         FROM (SELECT c_custkey,
                      CAST((c_custkey % 360) - 180 AS DOUBLE) + 0.5 AS lon,
                      CAST((c_custkey % 160) - 80 AS DOUBLE) + 0.5 AS lat
               FROM customer)""",
    "q45_distinct_agg" ->
      """SELECT o_orderstatus,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY o_orderstatus""",
    "q46_setops" ->
      """SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id, date_trunc('day', ts) FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT user_id, date_trunc('day', ts) FROM events WHERE event_type = 'error'""",
    "q47_rollup" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q54_median" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q48_timeseries_ma" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
                CAST(l_shipdate AS DATE) AS ship_date,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
                  / count(*) OVER w AS qty_ma3
         FROM lineitem
         WINDOW w AS (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber,
                               l_quantity, l_extendedprice, l_partkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
  )
}
