package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Extract-stage operator family (SURVEY.md §2.1–§2.3) re-expressed over the
  * driver test tables: predicate pushdown filters (F1–F4), the asset-pick
  * coalesce projection (F5), bbox padding math (F6), filename parsing (F7),
  * UTM/EPSG selection (F8–F9), and the NDVI per-pixel kernel as a scalar
  * expression chain (N2–N8 of reference src/transform/compute_ndvi.py:32-93).
  *
  * Scale notes: every query here is a scan→filter→project (no shuffle except
  * the declared aggregates); filters and column pruning reach the parquet
  * reader via Catalyst, so at 100 TB these scans read only the referenced
  * columns and row groups whose min/max stats pass the predicate.
  */
object ExtractQueries {

  /** N2–N8 kernel (double-precision oracle-parity variant).
    * Reference semantics (src/transform/compute_ndvi.py:32-93): mask zeros
    * BEFORE scaling (mask order is load-bearing, SURVEY §2.3 note), scale
    * v*0.0000275-0.2, epsilon-safe ratio, clamp to [-1,1], nodata -9999.
    * All ops are IEEE-exact (+,-,*,/, comparisons) so Spark and DuckDB agree
    * bit-for-bit with no rounding. */
  def ndviKernel(redDn: Column, nirDn: Column): Column = {
    val red = redDn * lit(0.0000275) - lit(0.2)
    val nir = nirDn * lit(0.0000275) - lit(0.2)
    val ratio = (nir - red) / (nir + red + lit(0.000001))
    when(redDn === 0 || nirDn === 0, lit(-9999.0))
      .otherwise(least(greatest(ratio, lit(-1.0)), lit(1.0)))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: cloud-cover predicate analog — pushed filter + projection.
    "q01_filter_project" -> ((s, d) =>
      events(s, d)
        .filter(col("value") <= 100.0)
        .select(col("event_id"), col("event_type"), col("value"))),

    // F2: temporal range predicate (reference datetime ∈ [start, end]).
    "q02_date_range" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
                                           lit("1996-12-31").cast("timestamp")))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
                col("o_totalprice"))),

    // F4: sensor anti-filter (NOT startswith 'LE07' analog).
    "q03_prefix_anti" -> ((s, d) =>
      customer(s, d)
        .filter(!col("c_name").startsWith("Customer#00000001"))
        .select(col("c_custkey"), col("c_name"))),

    // F5: asset-pick — case-insensitive preference coalesce
    // (reference _pick, download_landsat_stac.py:64-70).
    "q04_asset_pick" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
                coalesce(nullif(col("o_orderstatus"), lit("P")),
                         col("o_orderpriority")).as("picked"))),

    // F6: bbox padding — degrees-per-km with cos(radians(lat)), clamped
    // (download_landsat_stac.py:44-51). Trig rounded to 9 dp: Java Math.cos
    // and C libm may differ in the last ulp.
    "q05_bbox_pad" -> ((s, d) => {
      val lat = (col("c_custkey") % 120) - lit(60.0)
      val lon = (col("c_custkey") % 300) - lit(150.0)
      val padKm = lit(5.0)
      val dLat = padKm / lit(110.574)
      val dLon = padKm / (lit(111.320) * greatest(cos(radians(lat)), lit(0.01)))
      customer(s, d).select(
        col("c_custkey"),
        round(lon - dLon, 9).as("minx"), round(lat - dLat, 9).as("miny"),
        round(lon + dLon, 9).as("maxx"), round(lat + dLat, 9).as("maxy"))
    }),

    // F7: filename parse — split '_', scene_id = parts[0:7] joined,
    // date = parts[3] as yyyyMMdd, sensor = parts[0]
    // (load_to_postgis.py:178-186). Filename synthesized deterministically.
    "q06_filename_parse" -> ((s, d) => {
      val fname = concat_ws("_",
        lit("LC08"), lit("L2SP"),
        lpad(col("o_orderkey").cast("string"), 6, "0"),
        date_format(col("o_orderdate"), "yyyyMMdd"),
        lit("02"), lit("T1"), lit("NDVI"))
      orders(s, d)
        .select(col("o_orderkey"), fname.as("fname"))
        .select(
          col("o_orderkey"),
          array_join(slice(split(col("fname"), "_"), 1, 6), "_").as("scene_id"),
          element_at(split(col("fname"), "_"), 1).as("sensor"),
          to_date(element_at(split(col("fname"), "_"), 4), "yyyyMMdd").as("acq_date"))
    }),

    // F8+F9: UTM zone/EPSG chooser — floor((lon+180)/6)+1,
    // epsg = (lat>=0 ? 32600 : 32700) + zone (load_to_postgis.py:18-38).
    "q07_utm_epsg" -> ((s, d) => {
      val lon = ((col("c_custkey") % 360) - lit(180)).cast("double") + lit(0.5)
      val lat = ((col("c_custkey") * 7 % 180) - lit(90)).cast("double") + lit(0.5)
      val zone = (floor((lon + lit(180.0)) / lit(6.0)) + lit(1)).cast("int")
      val epsg = when(lat >= 0, lit(32600) + zone).otherwise(lit(32700) + zone)
      customer(s, d).select(col("c_custkey"), lon.as("lon"), lat.as("lat"),
                            zone.as("zone"), epsg.as("epsg"))
    }),

    // N2–N8: NDVI kernel as one scalar expression chain per row; DN bands
    // synthesized from lineitem keys (zeros occur → fill-mask branch taken).
    "q08_ndvi_scalar" -> ((s, d) => {
      val redDn = (col("l_partkey") % 4096).cast("double")
      val nirDn = ((col("l_partkey") * 7 + col("l_linenumber")) % 4096).cast("double")
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        redDn.as("red_dn"), nirDn.as("nir_dn"),
        ndviKernel(redDn, nirDn).as("ndvi"))
    }),

    // A1: nodata-aware mean (reference _nanmean, load_to_postgis.py:74-79):
    // nodata→NULL, avg skips NULLs, NULL for all-null groups. Partial+final
    // agg → single shuffle on the group key. Rounded: double sum order is
    // engine-dependent.
    "q09_mean_ndvi" -> ((s, d) => {
      val redDn = (col("l_partkey") % 4096).cast("double")
      val nirDn = ((col("l_partkey") * 7 + col("l_linenumber")) % 4096).cast("double")
      val ndvi = ndviKernel(redDn, nirDn)
      val valid = when(ndvi === -9999.0, lit(null)).otherwise(ndvi)
      lineitem(s, d)
        .select(col("l_returnflag"), valid.as("ndvi"))
        .groupBy(col("l_returnflag"))
        .agg((round(avg(col("ndvi")), 6) + lit(0.0)).as("mean_ndvi"),
             count(col("ndvi")).as("n_valid"),
             count(lit(1)).as("n_total"))
    }),

    // A2: overview-pyramid downsampling — mean of 2^k blocks
    // (compute_ndvi.py:147,156): grouped avg on floor-divided coordinate.
    // Money-like 2-decimal inputs are summed as exact DECIMAL (order-
    // independent), then cast to double and divided — fully deterministic,
    // no rounding-boundary hazard.
    "q10_overview_avg" -> ((s, d) =>
      events(s, d)
        .groupBy(floor(col("event_id") / 32).cast("long").as("block"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1)))
               .as("mean_value"),
             count(lit(1)).as("n"))),

    // A3/A4: run-summary counters — totals + conditional success counts
    // (main.py:114-152). Integer aggregates: exact in any order.
    "q11_run_summary" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
             sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("n_big"),
             sum(when(col("value") <= 100.0, 1L).otherwise(0L)).as("n_small"))),
  )

  val oracle: Map[String, String] = Map(
    "q01_filter_project" ->
      "SELECT event_id, event_type, value FROM events WHERE value <= 100.0",
    "q02_date_range" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
         FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'""",
    "q03_prefix_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_name NOT LIKE 'Customer#00000001%'",
    "q04_asset_pick" ->
      "SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), o_orderpriority) AS picked FROM orders",
    "q05_bbox_pad" ->
      """SELECT c_custkey,
                round(lon - dlon, 9) AS minx, round(lat - dlat, 9) AS miny,
                round(lon + dlon, 9) AS maxx, round(lat + dlat, 9) AS maxy
         FROM (
           SELECT c_custkey, lat, lon,
                  5.0 / 110.574 AS dlat,
                  5.0 / (111.320 * greatest(cos(radians(lat)), 0.01)) AS dlon
           FROM (SELECT c_custkey,
                        (c_custkey % 120) - 60.0 AS lat,
                        (c_custkey % 300) - 150.0 AS lon
                 FROM customer))""",
    "q06_filename_parse" ->
      """SELECT o_orderkey,
                array_to_string(list_slice(string_split(fname, '_'), 1, 6), '_') AS scene_id,
                string_split(fname, '_')[1] AS sensor,
                CAST(strptime(string_split(fname, '_')[4], '%Y%m%d') AS DATE) AS acq_date
         FROM (SELECT o_orderkey,
                      concat_ws('_', 'LC08', 'L2SP',
                                lpad(CAST(o_orderkey AS VARCHAR), 6, '0'),
                                strftime(o_orderdate, '%Y%m%d'),
                                '02', 'T1', 'NDVI') AS fname
               FROM orders)""",
    "q07_utm_epsg" ->
      """SELECT c_custkey, lon, lat, zone,
                CASE WHEN lat >= 0 THEN 32600 + zone ELSE 32700 + zone END AS epsg
         FROM (SELECT c_custkey, lon, lat,
                      CAST(floor((lon + 180.0) / 6.0) + 1 AS INT) AS zone
               FROM (SELECT c_custkey,
                            CAST((c_custkey % 360) - 180 AS DOUBLE) + 0.5 AS lon,
                            CAST((c_custkey * 7 % 180) - 90 AS DOUBLE) + 0.5 AS lat
                     FROM customer))""",
    "q08_ndvi_scalar" ->
      """SELECT l_orderkey, l_linenumber, red_dn, nir_dn,
                CASE WHEN red_dn = 0 OR nir_dn = 0 THEN -9999.0
                     ELSE least(greatest(
                       ((nir_dn*0.0000275 - 0.2) - (red_dn*0.0000275 - 0.2))
                       / ((nir_dn*0.0000275 - 0.2) + (red_dn*0.0000275 - 0.2) + 0.000001),
                       -1.0), 1.0)
                END AS ndvi
         FROM (SELECT l_orderkey, l_linenumber,
                      CAST(l_partkey % 4096 AS DOUBLE) AS red_dn,
                      CAST((l_partkey * 7 + l_linenumber) % 4096 AS DOUBLE) AS nir_dn
               FROM lineitem)""",
    "q09_mean_ndvi" ->
      """SELECT l_returnflag,
                round(avg(ndvi), 6) + 0.0 AS mean_ndvi,
                CAST(count(ndvi) AS BIGINT) AS n_valid,
                CAST(count(*) AS BIGINT) AS n_total
         FROM (SELECT l_returnflag,
                      CASE WHEN red_dn = 0 OR nir_dn = 0 THEN NULL
                           ELSE least(greatest(
                             ((nir_dn*0.0000275 - 0.2) - (red_dn*0.0000275 - 0.2))
                             / ((nir_dn*0.0000275 - 0.2) + (red_dn*0.0000275 - 0.2) + 0.000001),
                             -1.0), 1.0)
                      END AS ndvi
               FROM (SELECT l_returnflag,
                            CAST(l_partkey % 4096 AS DOUBLE) AS red_dn,
                            CAST((l_partkey * 7 + l_linenumber) % 4096 AS DOUBLE) AS nir_dn
                     FROM lineitem))
         GROUP BY l_returnflag""",
    "q10_overview_avg" ->
      """SELECT CAST(floor(event_id / 32) AS BIGINT) AS block,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1""",
    "q11_run_summary" ->
      """SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_total,
                CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                CAST(sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
         FROM events GROUP BY event_type""",
  )
}
