package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.raster.{Clip, NdviKernel}
import graft.sink.Writers

/** End-to-end pipeline composition — the reference's §3 trace as ONE lazy
  * DataFrame lineage (reference main.py:94-158): scene-catalog predicates →
  * band pairing (J4/N1) → NDVI kernel (N2–N8) → AOI clip (J5/C5-C6) →
  * per-scene mean (A1) → conflict-semantic sinks (K3–K6).
  *
  * Where the reference materializes GeoTIFFs on the local filesystem
  * between stages (main.py:124-125), this plan pipelines: Catalyst sees
  * filter→join→project→join→aggregate and the only exchanges are the band
  * join and the final aggregation (SURVEY.md §3 "Spark equivalent").
  */
object NdviPipeline {

  /** Extract-stage catalog filtering (F1–F4 on a scene_catalog frame).
    * The end bound is inclusive of the whole end DAY (the reference's
    * STAC "start/end" date range treats a date-only end as end-of-day). */
  def filterCatalog(catalog: DataFrame, maxCloud: Double,
                    start: String, end: String, maxItems: Int): DataFrame =
    catalog
      .filter(col("cloud_cover") <= maxCloud)
      .filter(col("datetime") >= lit(start).cast("timestamp") &&
              col("datetime") < date_add(lit(end).cast("date"), 1).cast("timestamp"))
      .orderBy(col("scene_id")).limit(maxItems) // deterministic L1 bound
      .filter(!col("scene_id").startsWith("LE07"))

  /** Transform stage: tiles of the selected scenes → clipped NDVI tiles +
    * per-scene mean. Returns (ndviTiles, clippedTiles, meanPerScene). */
  def transformStage(tiles: DataFrame, aoi: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val ndvi = NdviKernel.computeNdvi(tiles)
    val clipped = Clip.clipToAoi(ndvi, aoi)
    val mean = NdviKernel.meanNdviPerScene(clipped)
    (ndvi, clipped, mean)
  }

  /** Load stage with reference conflict semantics: ndvi_full is
    * insert-if-absent on scene_id (K4), ndvi_clipped merges on
    * (scene_id, aoi_id) (K5). */
  def loadStage(existingFull: DataFrame, newFull: DataFrame,
                existingClipped: DataFrame, newClipped: DataFrame): (DataFrame, DataFrame) = {
    val full = existingFull.unionByName(
      Writers.insertIfAbsent(existingFull, newFull, Seq("scene_id")))
    val clipped = Writers.merge(existingClipped, newClipped,
      Seq("scene_id", "aoi_id"), tieBreak = "scene_id")
    (full, clipped)
  }

  /** Run summary (A3, reference main.py:114-152): per-scene status rows →
    * totals / successes / failures. */
  case class RunSummary(total: Long, succeeded: Long, failed: Long)

  /** Everything the reference's run produces, as lazy frames; callers
    * write them in stage order (K9 commit ordering). */
  case class Result(full: DataFrame, clipped: DataFrame, viz: DataFrame,
                    overviews: Option[DataFrame], mean: DataFrame,
                    summary: RunSummary)

  /** [[run]] from a bbox-only configuration — the reference's default
    * entry (main.py:100): bootstrap the AOI GeoJSON from
    * `settings.aoi.bbox` if the configured file is missing (K10,
    * `ensure_aoi_geojson_from_bbox`, main.py:68-91), read it back, and
    * run. Idempotent: an existing AOI file is used as-is. */
  def runFromSettings(spark: SparkSession,
                      settings: graft.config.Settings,
                      catalog: DataFrame,
                      tiles: DataFrame,
                      existingFull: DataFrame,
                      existingClipped: DataFrame,
                      runLog: graft.sink.RunLog = graft.sink.RunLog.Noop): Result =
    run(spark, settings, catalog, tiles,
      graft.geo.GeoJson.ensureAndReadAoi(spark, settings),
      existingFull, existingClipped, runLog)

  /** The complete reference trace on one lazy lineage (main.py:94-158):
    * settings → catalog predicates → band pairing + NDVI kernel → AOI
    * clip → overview pyramid → viz warp to products.reproject_crs →
    * per-scene mean → K4/K5 upserts → run summary. */
  def run(spark: SparkSession,
          settings: graft.config.Settings,
          catalog: DataFrame,
          tiles: DataFrame,
          aoi: DataFrame,
          existingFull: DataFrame,
          existingClipped: DataFrame,
          runLog: graft.sink.RunLog = graft.sink.RunLog.Noop): Result = {
    import spark.implicits._
    val tileCols = Seq("scene_id", "band", "tile_col", "tile_row", "width",
      "height", "epsg", "transform", "nodata", "pixels")
    val selected = filterCatalog(catalog,
      settings.download.maxCloudCover,
      settings.dates.start, settings.dates.end,
      settings.download.maxItems)
    val selectedTiles = tiles.join(
      broadcast(selected.select(col("scene_id"))), Seq("scene_id"))
    val ndvi = NdviKernel.computeNdvi(selectedTiles)
    // C4: repair-or-reject invalid AOI geometry at ingest (the reference's
    // union + buffer(0) step, compute_ndvi.py:115-126) — BEFORE the CRS
    // reproject, like the reference's to_crs → buffer(0) order.
    val aoiValid = Clip.validateAoi(aoi)
    // AOI into the tiles' CRS (C3) when the scene grid is projected and
    // uniform; mixed-CRS tile tables clip per-CRS upstream.
    val tileEpsgs = selectedTiles.select("epsg").distinct()
      .collect().map(_.getInt(0))
    val aoiInTileCrs =
      if (tileEpsgs.length == 1) Clip.reprojectAoi(aoiValid, tileEpsgs.head)
      else aoiValid
    // C2: footprint sanity log — selected scenes' envelope reprojected to
    // WGS84, rounded 4dp (compute_ndvi.py:101-106); best-effort like the
    // reference's try/except-pass.
    if (tileEpsgs.length == 1) try {
      val b = Clip.tileBounds(selectedTiles)
        .agg(min(col("t_minx")), min(col("t_miny")),
             max(col("t_maxx")), max(col("t_maxy"))).head
      val corners = Seq((b.getDouble(0), b.getDouble(1)), (b.getDouble(2), b.getDouble(1)),
                        (b.getDouble(0), b.getDouble(3)), (b.getDouble(2), b.getDouble(3)))
        .map { case (x, y) => graft.geo.Geodesy.transformPoint(x, y, tileEpsgs.head, 4326) }
      def r4(v: Double) = math.rint(v * 1e4) / 1e4
      runLog.info(s"Raster bounds (WGS84): (${r4(corners.map(_._1).min)}, " +
        s"${r4(corners.map(_._2).min)}, ${r4(corners.map(_._1).max)}, " +
        s"${r4(corners.map(_._2).max)})")
    } catch { case _: Exception => () }
    val clippedTiles = Clip.clipToAoi(ndvi, aoiInTileCrs)
    // the reference raises eagerly when nothing overlaps
    // (compute_ndvi.py:128-131)
    val nScenes = selected.count()
    Clip.requireOverlap(clippedTiles, inputNonEmpty = nScenes > 0)
    // mean per (scene, aoi) — the reference keys ndvi_clipped.mean_ndvi by
    // (full_id, aoi_id); pooling across AOIs would double-count overlap.
    val mean = NdviKernel.meanNdvi(clippedTiles, Seq("scene_id", "aoi_id"))
    // per-AOI clipped products: the grid key for downstream per-image ops
    // is (scene, aoi), encoded in the warp group key.
    val clippedBands = clippedTiles
      .withColumn("scene_id", concat_ws("#", col("scene_id"), col("aoi_id")))
      .select(tileCols.map(col): _*)
    val overviews =
      if (settings.products.buildOverviews)
        Some(graft.raster.Resample.pyramid(clippedBands))  // [2,4,8,16,32]
      else None
    val vizEpsg = settings.products.reprojectCrs.stripPrefix("EPSG:").toInt
    val viz = graft.raster.Resample.reprojectScenes(spark,
      clippedBands.as[graft.model.RasterModel.BandTile],
      vizEpsg, resM = 0.0 /* derive from source resolution */).toDF()
    // acquisition_date per scene from the catalog's datetime
    // (reference parses it per scene, load_to_postgis.py:178-183)
    val newFull = ndvi.select(col("scene_id")).distinct()
      .join(broadcast(selected.select(col("scene_id"),
        col("datetime").cast("date").as("acquisition_date"))), Seq("scene_id"))
    val newClipped = mean
      .select(col("scene_id"), col("aoi_id"), col("mean_ndvi"))
    val (full, clippedTable) = loadStage(
      existingFull, newFull,
      existingClipped, newClipped)
    val nOk = mean.filter(col("mean_ndvi").isNotNull)
      .select(col("scene_id")).distinct().count()
    runLog.info(s"Run summary: total=$nScenes succeeded=$nOk failed=${nScenes - nOk}")
    Result(full, clippedTable, viz, overviews, mean,
      RunSummary(nScenes, nOk, nScenes - nOk))
  }

  /** K9 with snapshot isolation end-to-end: commit the run's product
    * tables in the reference loader's stage order (full → clipped → viz,
    * main.py:124-152) as [[graft.sink.VersionedTable]] manifest commits —
    * create on first run, overwrite after (each post-merge frame IS the
    * table's complete new state). A reader that resolved a version before
    * stage 3's commit keeps reading that version's immutable files, and
    * the pre-merge ndvi_clipped stays reachable by time travel until
    * expired — the properties the directory-protocol writers can't give.
    * Returns table name → committed version. */
  def commitRun(spark: SparkSession, r: Result, rootDir: String): Map[String, Int] = {
    import graft.sink.VersionedTable
    def commitTable(name: String, df: DataFrame): (String, Int) = {
      val root = s"$rootDir/$name"
      val v =
        if (VersionedTable.currentVersion(spark, root).isEmpty)
          VersionedTable.create(spark, root, df)
        else VersionedTable.overwrite(spark, root, df)
      name -> v
    }
    // stage order is load-bearing (K9): a failure mid-sequence leaves the
    // earlier tables committed and the later ones at their prior version —
    // exactly the reference's stop-on-first-failure loader contract.
    Seq(
      commitTable("ndvi_full", r.full),
      commitTable("ndvi_clipped", r.clipped),
      commitTable("ndvi_viz", r.viz)).toMap
  }

  /** [[commitRun]] upgraded to CROSS-TABLE atomicity: the three product
    * tables stage as normal per-table commits and become visible through
    * ONE [[graft.sink.TxnCatalog]] transaction — the engine's analog of
    * the reference's staged commits inside a single Postgres session
    * (load_to_postgis.py:370-384), where a failure anywhere before the
    * final commit leaves a reader on the PREVIOUS versions of ALL three
    * tables, never a mix. Catalog readers (`TxnCatalog.read(catRoot,
    * name)`) get the consistent run; raw per-table readers keep the
    * stop-on-first-failure view [[commitRun]] documents. Returns the txn
    * number and the per-table pins it published. */
  def commitRunTxn(spark: SparkSession, r: Result, rootDir: String):
      (Int, Map[String, Int]) = {
    import graft.sink.TxnCatalog
    val txn = TxnCatalog.commitTables(spark, s"$rootDir/_catalog",
      Seq("ndvi_full" -> r.full, "ndvi_clipped" -> r.clipped,
        "ndvi_viz" -> r.viz),
      name => s"$rootDir/$name")
    val snap = TxnCatalog.snapshot(spark, s"$rootDir/_catalog")
    (txn, snap.tables.map { case (k, (_, v)) => k -> v })
  }
}
