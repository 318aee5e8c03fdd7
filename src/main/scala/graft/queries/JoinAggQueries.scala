package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Join / aggregate / limit / sink-semantics operator family
  * (SURVEY.md §2.4–§2.8, §2.10) over the driver test tables.
  *
  * Scale notes (100 TB target):
  *  - Dimension sides (orders→customer→nation→region chain, AOI side of the
  *    spatial join) are broadcast — no shuffle of the fact table beyond its
  *    own aggregation key.
  *  - The lineitem self-join (band pairing J4) shuffles both sides on the
  *    same key; at scale the tile table would be bucketed by
  *    (scene_id, tile_row, tile_col) making this a shuffle-free zip.
  *  - Merge/append emulations (K3/K5) are window-over-key or anti-join —
  *    both single-shuffle on the merge key.
  */
object JoinAggQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: scene→full_id lookup as inner equi-join; skip-if-missing = inner
    // semantics (load_to_postgis.py:236-241). No broadcast HINT: the lookup
    // side scales with the fact table, so the strategy is left to AQE stats
    // (broadcast at catalog scale, shuffle hash join at 100 TB).
    "q12_lookup_join" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"),
                col("o_orderpriority"))),

    // J1+J2+J3 composed: the full dimension chain, grouped rollup.
    // lineitem⋈orders⋈customer⋈nation⋈region — only the FIXED-size dims
    // (nation 25, region 5) carry broadcast hints; orders/customer scale
    // with SF, so their join strategy is left to AQE stats.
    "q13_star_join" -> ((s, d) => {
      val li = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
             sum(col("l_quantity")).as("sum_qty"),
             // revenue summed as exact DECIMAL (price and discount are
             // 2-decimal), cast to double at the end: order-independent.
             sum(col("l_extendedprice").cast("decimal(18,2)") *
                 (lit(1.0) - col("l_discount")).cast("decimal(8,2)"))
               .cast("double").as("revenue"))
    }),

    // J4: band pairing — red/nir of the same scene joined on the grid key
    // (self-join of band_tiles on (scene_id,tile_col,tile_row), SURVEY §2.7).
    "q14_band_pairing" -> ((s, d) => {
      val a = lineitem(s, d).filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_extendedprice").as("red"))
      val b = lineitem(s, d).filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_extendedprice").as("nir"))
      a.join(b, "l_orderkey")
        .select(col("l_orderkey"), col("red"), col("nir"),
                round((col("nir") - col("red")) / (col("nir") + col("red") + lit(0.000001)), 9)
                  .as("ratio"))
    }),

    // J3: AOI-id resolution with fallback — prefer name match, else lowest
    // id (load_to_postgis.py:139-149): prioritized top-1 via window.
    "q15_priority_fallback" -> ((s, d) => {
      // fenced: ≤25 rows (nation dimension table)
      val w = Window.orderBy(col("n_name") =!= "NATION_7", col("n_nationkey"))
      nation(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("n_nationkey"), col("n_name"))
    }),

    // J5+F3: spatial bbox-overlap theta join (raster×AOI clip pre-filter,
    // compute_ndvi.py:128-134). AOI side is tiny → broadcast nested loop;
    // the fact side streams. Envelope test is the standard
    // !(maxx<qminx || minx>qmaxx || maxy<qminy || miny>qmaxy).
    "q16_bbox_join" -> ((s, d) => {
      val tiles = lineitem(s, d).select(
        col("l_orderkey").as("tile_id"),
        col("l_linenumber").as("tile_ln"),
        (col("l_partkey") % 100).cast("double").as("minx"),
        (col("l_suppkey") % 100).cast("double").as("miny"),
        ((col("l_partkey") % 100) + 2).cast("double").as("maxx"),
        ((col("l_suppkey") % 100) + 2).cast("double").as("maxy"))
      val aois = nation(s, d).select(
        col("n_nationkey").as("aoi_id"),
        (col("n_nationkey") * 4).cast("double").as("aminx"),
        (col("n_nationkey") * 3).cast("double").as("aminy"),
        (col("n_nationkey") * 4 + 20).cast("double").as("amaxx"),
        (col("n_nationkey") * 3 + 15).cast("double").as("amaxy"))
      tiles.join(broadcast(aois),
          !(col("maxx") < col("aminx") || col("minx") > col("amaxx") ||
            col("maxy") < col("aminy") || col("miny") > col("amaxy")))
        .groupBy(col("aoi_id"))
        .agg(count(lit(1)).as("n_tiles"))
    }),

    // L3: order-by-id top-1 (ORDER BY id LIMIT 1, load_to_postgis.py:144).
    "q17_top1" -> ((s, d) =>
      orders(s, d).orderBy(col("o_orderkey")).limit(1)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Top-k per group: deterministic rank with explicit tie-break.
    "q18_topk_pergroup" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
    }),

    // §2.9 string/date scalars: lower, contains, regexp_extract, date_format.
    "q19_string_funcs" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
                lower(col("c_mktsegment")).as("seg_lower"),
                col("c_name").contains("01").as("has01"),
                regexp_extract(col("c_name"), "#(\\d+)", 1).as("cust_num"),
                substring(col("c_name"), 1, 8).as("prefix"))),

    // JSON extraction (events.props, STAC-item-style semi-structured field).
    "q20_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))),

    // Hourly rollup (events time series; streaming-batch parity target).
    "q21_hourly_rollup" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))),

    // K5: merge/upsert emulation — ON CONFLICT DO UPDATE as
    // union + row_number over the conflict key, new rows win
    // (load_to_postgis.py:260-269). Single shuffle on the merge key.
    "q22_merge_upsert" -> ((s, d) => {
      val olds = events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value"), lit(0).as("is_new"))
      val news = events(s, d).filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("value"), lit(1).as("is_new"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("is_new").desc, col("event_id"))
      olds.unionByName(news)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"), col("is_new"))
    }),

    // K3/K4: idempotent insert-if-absent — left-anti join against existing
    // keys (ON CONFLICT DO NOTHING, load_to_postgis.py:160-167).
    "q23_anti_append" -> ((s, d) => {
      val existing = lineitem(s, d).filter(col("l_quantity") >= 40.0)
        .select(col("l_partkey")).distinct()
      part(s, d)
        .join(existing, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q12_lookup_join" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus, o_orderpriority
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q13_star_join" ->
      """SELECT r_name, n_name,
                CAST(count(*) AS BIGINT) AS n_items,
                sum(l_quantity) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1.0 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q14_band_pairing" ->
      """SELECT a.l_orderkey, a.red, b.nir,
                round((b.nir - a.red) / (b.nir + a.red + 0.000001), 9) AS ratio
         FROM (SELECT l_orderkey, l_extendedprice AS red FROM lineitem WHERE l_linenumber = 1) a
         JOIN (SELECT l_orderkey, l_extendedprice AS nir FROM lineitem WHERE l_linenumber = 2) b
         ON a.l_orderkey = b.l_orderkey""",
    "q15_priority_fallback" ->
      """SELECT n_nationkey, n_name FROM (
           SELECT n_nationkey, n_name,
                  row_number() OVER (ORDER BY (n_name <> 'NATION_7'), n_nationkey) AS rn
           FROM nation) WHERE rn = 1""",
    "q16_bbox_join" ->
      """SELECT aoi_id, CAST(count(*) AS BIGINT) AS n_tiles
         FROM (SELECT l_orderkey AS tile_id,
                      CAST(l_partkey % 100 AS DOUBLE) AS minx,
                      CAST(l_suppkey % 100 AS DOUBLE) AS miny,
                      CAST((l_partkey % 100) + 2 AS DOUBLE) AS maxx,
                      CAST((l_suppkey % 100) + 2 AS DOUBLE) AS maxy
               FROM lineitem) t
         JOIN (SELECT n_nationkey AS aoi_id,
                      CAST(n_nationkey * 4 AS DOUBLE) AS aminx,
                      CAST(n_nationkey * 3 AS DOUBLE) AS aminy,
                      CAST(n_nationkey * 4 + 20 AS DOUBLE) AS amaxx,
                      CAST(n_nationkey * 3 + 15 AS DOUBLE) AS amaxy
               FROM nation) a
         ON NOT (t.maxx < a.aminx OR t.minx > a.amaxx OR
                 t.maxy < a.aminy OR t.miny > a.amaxy)
         GROUP BY aoi_id""",
    "q17_top1" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 1",
    "q18_topk_pergroup" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey) AS rk
           FROM customer) WHERE rk <= 3""",
    "q19_string_funcs" ->
      """SELECT c_custkey,
                lower(c_mktsegment) AS seg_lower,
                contains(c_name, '01') AS has01,
                regexp_extract(c_name, '#(\d+)', 1) AS cust_num,
                substring(c_name, 1, 8) AS prefix
         FROM customer""",
    "q20_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events""",
    "q21_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q22_merge_upsert" ->
      """SELECT user_id, event_id, value, is_new FROM (
           SELECT user_id, event_id, value, is_new,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY is_new DESC, event_id) AS rn
           FROM (SELECT user_id, event_id, value, 0 AS is_new FROM events WHERE event_type = 'view'
                 UNION ALL
                 SELECT user_id, event_id, value, 1 AS is_new FROM events WHERE event_type = 'click'))
         WHERE rn = 1""",
    "q23_anti_append" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey AND l_quantity >= 40.0)""",
  )
}
