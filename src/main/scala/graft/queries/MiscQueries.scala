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
