package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scene-catalog source semantics (SURVEY.md §2.1 S1/S4/S5 + §2.2 F5–F7):
  * the STAC-item access patterns of the reference's extract stage, over a
  * catalog DataFrame (offline: parquet; online: a DSv2 scan with
  * SupportsPushDownFilters — SURVEY §7 skips that here since a parquet
  * catalog gets pushdown for free).
  */
object SceneCatalog {

  /** Reference preference lists (download_landsat_stac.py:64-70). */
  val RedKeys: Seq[String] = Seq("red", "SR_B3", "SR_B4", "B3", "B4", "B03", "B04")
  val NirKeys: Seq[String] = Seq("nir08", "SR_B4", "SR_B5", "B4", "B5", "B04", "B05")

  /** Lowercase the keys of a MAP<STRING,STRING> column (do this ONCE in
    * its own projection when several picks follow — the map construction
    * is not cheap and coalesce references it per preference key). */
  def lowerKeys(assets: Column): Column =
    map_from_arrays(transform(map_keys(assets), lower _), map_values(assets))

  /** F5 `_pick` on an already-lowered map: first-match coalesce over the
    * preference keys — pure expressions, no UDF. */
  def pickLowered(lowered: Column, prefs: Seq[String]): Column =
    coalesce(prefs.map(k => element_at(lowered, k.toLowerCase)): _*)

  /** F5 `_pick`: case-insensitive first-match over a preference list on a
    * MAP<STRING,STRING> assets column. */
  def pickAsset(assets: Column, prefs: Seq[String]): Column =
    pickLowered(lowerKeys(assets), prefs)

  /** F5 `_pick` specialized for the common catalog shape where the key SET
    * of each asset-map variant is a plan-time constant (a catalog has a
    * handful of sensor naming conventions, download_landsat_stac.py:64-70,
    * not arbitrary per-row keys). The preference coalesce is resolved at
    * PLAN time — for each variant the first preference key present in its
    * key set is known — so each row evaluates one `when`-dispatch and one
    * `element_at`, instead of lowering the map and probing all preference
    * keys per row. Equivalent to `pickLowered` on the same data (asserted
    * by SceneCatalogSpec); the map keys must be lowercase already. */
  def pickStatic(lowered: Column, variant: Column,
                 variantKeys: Seq[(Int, Seq[String])],
                 prefs: Seq[String]): Column = {
    val lprefs = prefs.map(_.toLowerCase)
    val branches = variantKeys.flatMap { case (v, ks) =>
      val lk = ks.map(_.toLowerCase)
      lprefs.find(lk.contains).map(k => (v, k))
    }
    branches.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (v, k)) => when(variant === v, element_at(lowered, k)).otherwise(acc)
    }
  }

  /** F6 bbox padding (download_landsat_stac.py:44-51): km → degrees with
    * cos(radians(mean_lat)) clamped at 0.01. */
  def padBbox(minx: Column, miny: Column, maxx: Column, maxy: Column,
              padKm: Column): (Column, Column, Column, Column) = {
    val meanLat = (miny + maxy) / 2
    val dLat = padKm / lit(110.574)
    val dLon = padKm / (lit(111.320) * greatest(cos(radians(meanLat)), lit(0.01)))
    (minx - dLon, miny - dLat, maxx + dLon, maxy + dLat)
  }

  /** F7 filename parse (load_to_postgis.py:178-186): 7-part underscore
    * names → (scene_id, sensor, acquisition_date); malformed → null date
    * (callers filter, matching the reference's skip). */
  def parseFilename(stem: Column): DataFrame => DataFrame = df => {
    val parts = split(stem, "_")
    df.withColumn("scene_id", array_join(slice(parts, 1, 7), "_"))
      .withColumn("sensor", element_at(parts, 1))
      .withColumn("acquisition_date", to_date(element_at(parts, 4), "yyyyMMdd"))
  }

  /** S4 glob-scan with name predicates: the reference's three directory
    * scans (`*_NDVI.tif` not clipped / `*_NDVI_clipped.tif` not viz /
    * `*_NDVI_clipped_viz.tif`, load_to_postgis.py:173-279) against a file
    * listing DataFrame (or spark.read with pathGlobFilter for real dirs). */
  def globFull(files: DataFrame, nameCol: String = "name"): DataFrame =
    files.filter(col(nameCol).endsWith("_NDVI.parquet") &&
                 !col(nameCol).contains("clipped"))
  def globClipped(files: DataFrame, nameCol: String = "name"): DataFrame =
    files.filter(col(nameCol).endsWith("_NDVI_clipped.parquet") &&
                 !col(nameCol).contains("viz"))
  def globViz(files: DataFrame, nameCol: String = "name"): DataFrame =
    files.filter(col(nameCol).endsWith("_NDVI_clipped_viz.parquet"))

  /** F10 validation predicates (download_landsat_stac.py:53-62,
    * load_to_postgis.py:190-192): content-type + min-size + nonzero dims.
    * The reference's floor is 1 MiB; the overload takes the floor for
    * synthetic-fixture tests. */
  def validDownload(contentType: Column, sizeBytes: Column): Column =
    validDownload(contentType, sizeBytes, 1024L * 1024L)
  def validDownload(contentType: Column, sizeBytes: Column, minBytes: Long): Column =
    (contentType.contains("tiff") || contentType.contains("geotiff")) &&
      sizeBytes >= lit(minBytes)
  def validRaster(width: Column, height: Column): Column =
    width > 0 && height > 0
}
