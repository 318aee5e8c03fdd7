package graft

import org.apache.spark.sql.functions._
import graft.catalog.SceneCatalog
import graft.ext.Multimodal
import graft.streaming.EventsStream

/** Streaming/batch parity + multimodal plumbing + asset-pick semantics. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly rollup equals the batch rollup") {
    val streamed = EventsStream.hourlyRollupStreaming(spark, sf, "t_rollup")
      .select("hour", "event_type", "n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("stateful per-user totals equal the batch group-by") {
    val streamed = EventsStream.perUserTotalsStreaming(spark, sf, "t_user")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming quantile-sketch state is register-sized and estimates honor the error bound") {
    val rows = EventsStream.quantileSketchStreaming(spark, sf, "t_qsketch")
      .collect()
    // one row per (event_type, probe); the streaming STATE (= the
    // register the memory sink drained) stays register-sized
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types * graft.queries.StatQueries.SketchGrid.size)
    rows.foreach(r => assert(r.getLong(4) < 5000,
      s"register blew up: ${r.getLong(4)} cells"))
    // parity + error bound vs exact per-type order statistics
    val exact = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (t, p, rank, est) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
      val e = exact(t)(rank.toInt - 1).toDouble / 100.0
      assert(math.abs(est - e) <= 0.005 * e + 0.01,
        s"$t p=$p: est $est vs exact $e breaks the bound")
    }
  }

  test("streaming drift alert: per-day registers vs the merged reference, alert discriminates") {
    val rows = EventsStream.driftAlertStreaming(spark, sf, "t_drift")
      .collect()
    val days = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts"))).distinct().count()
    // one row per (day, probe)
    assert(rows.length == days * graft.queries.StatQueries.DriftGrid.size)
    // gap/max_gap arithmetic is internally consistent and the alert flag
    // is exactly max_gap > DriftAlertGap
    rows.foreach { r =>
      val (gap, maxGap, alert) =
        (r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(math.abs(gap - math.abs(r.getDouble(2) - r.getDouble(3))) < 1e-12)
      assert(maxGap >= gap - 1e-12)
      assert(alert == (maxGap > EventsStream.DriftAlertGap))
    }
    // the reference register is the per-day registers MERGED — its
    // read-out must match the whole-corpus exact order statistics
    // within the bound (the mergeability claim, observed end to end)
    val exact = Tables.events(spark, sf)
      .select(floor(col("value") * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(_.getLong(0)).sorted
    rows.foreach { r =>
      val (p, estRef) = (r.getDouble(1), r.getDouble(3))
      val e = exact(math.ceil(p * exact.length).toInt - 1).toDouble / 100.0
      assert(math.abs(estRef - e) <= 0.005 * math.abs(e) + 0.01,
        s"p=$p: reference est $estRef vs exact corpus $e breaks the bound")
    }
  }

  test("multimodal decode: schema, determinism, partition preservation") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val decoded = Multimodal.decodeStage(spark, media)
    assert(decoded.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "checksum"))
    val r = decoded.orderBy("media_id").head
    val r2 = Multimodal.decodeStage(spark, media).orderBy("media_id").head
    assert(r == r2)                       // deterministic fake decode
    assert(decoded.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val row = decoded.filter(col("media_id") === 0).head
    assert(row.width >= 64 && row.height >= 64)
  }

  test("segment sampling slices payload bytes") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf)).toDF()
    val seg = Multimodal.sampleSegments(media, segmentBytes = 16, everyK = 2)
    val segs = seg.filter(col("media_id") === 0).head.getSeq[Array[Byte]](2)
    assert(segs.nonEmpty && segs.head.length == 16)
  }

  test("pickAsset: case-insensitive preference order and missing-key null") {
    val df = Seq(
      (1L, Map("Red" -> "r1", "SR_B5" -> "n1")),
      (2L, Map("SR_B3" -> "r2", "NIR08" -> "n2")),
      (3L, Map("B04" -> "x3"))).toDF("id", "assets")
    val out = df.select(col("id"),
        SceneCatalog.pickAsset(col("assets"), SceneCatalog.RedKeys).as("r"),
        SceneCatalog.pickAsset(col("assets"), SceneCatalog.NirKeys).as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "r1" && out(0).getString(2) == "n1")
    assert(out(1).getString(1) == "r2" && out(1).getString(2) == "n2")
    // id=3: B04 matches red prefs (4th choice) AND nir prefs; pick returns it
    assert(out(2).getString(1) == "x3" && out(2).getString(2) == "x3")
  }

  test("pickStatic equals pickLowered when variant key sets are plan-time constants") {
    val variantKeys = Seq(
      0 -> Seq("red", "nir08"), 1 -> Seq("SR_B3", "SR_B5"),
      2 -> Seq("B03", "B05"), 3 -> Seq("red"))
    val rows = (0L until 40L).map { id =>
      val v = (id % 4).toInt
      val ks = variantKeys(v.toInt)._2.map(_.toLowerCase)
      val vs = ks.zipWithIndex.map { case (_, i) => s"href_${id}_$i" }
      (id, v, ks.zip(vs).toMap)
    }
    val df = rows.toDF("id", "v", "lassets")
    Seq(SceneCatalog.RedKeys, SceneCatalog.NirKeys).foreach { prefs =>
      val out = df.select(col("id"),
          SceneCatalog.pickStatic(col("lassets"), col("v"), variantKeys, prefs).as("s"),
          SceneCatalog.pickLowered(col("lassets"), prefs).as("g"))
        .collect()
      out.foreach(r => assert(r.get(1) == r.get(2), s"id=${r.getLong(0)} prefs=$prefs"))
    }
  }

  test("glob-scan name predicates route files to the right product table") {
    val files = Seq("a_NDVI.parquet", "a_NDVI_clipped.parquet",
      "a_NDVI_clipped_viz.parquet", "junk.txt").toDF("name")
    assert(SceneCatalog.globFull(files).as[String].collect().toSeq == Seq("a_NDVI.parquet"))
    assert(SceneCatalog.globClipped(files).as[String].collect().toSeq == Seq("a_NDVI_clipped.parquet"))
    assert(SceneCatalog.globViz(files).as[String].collect().toSeq == Seq("a_NDVI_clipped_viz.parquet"))
  }

  test("streaming-maintained HLL registers equal the batch registers") {
    import graft.ext.Sketches
    val streamed = graft.streaming.EventsStream
      .hllMaintainStreaming(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Sketches
      .hllRegisters(Tables.table(spark, sf, "events"), col("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // register max is associative: micro-batch boundaries and the
    // duplicated landing files must not change a single register
    assert(streamed == batch)
    // the driver-side estimate mirrors the q82 column expression: same
    // registers → an estimate within the sketch's error envelope
    val est = Sketches.estimateFromRegisters(streamed)
    val exact = Tables.table(spark, sf, "events")
      .select(col("event_id")).distinct().count()
    assert(math.abs(est - exact) / exact < 0.35,
      s"estimate $est vs exact $exact out of HLL-64 envelope")
  }

  test("streaming incremental dedup equals batch q135 row-for-row") {
    val stream = SparkEntry.queries("q150_stream_incr_dedup")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q135_incremental_dedup")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream.nonEmpty)
    assert(stream == batch, "stream/batch parity broken")
  }

  test("q150 late arrival + re-delivered batch: still byte-identical to batch q135") {
    import graft.streaming.DocsStream
    import java.nio.file.{Files, Path, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val work = Files.createTempDirectory("graft_backfill")
    val landing = work.resolve("landing"); Files.createDirectories(landing)
    val ckpt = work.resolve("ckpt"); val target = work.resolve("t").toString
    def copyTree(from: Path, to: Path): Unit =
      Files.walk(from).iterator().asScala.foreach { p =>
        val dst = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    def deleteTree(p: Path): Unit =
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = work.resolve(s"${name}_stage")
      df.coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      Files.move(part, landing.resolve(s"$name.parquet"))
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 4)
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)
    // 1) the CHRONOLOGICALLY LATER half arrives first
    deliver(docs.filter(col("doc_id") >= mid), "b_late_half")
    DocsStream.drainIncrementalDedup(spark, sf, landing.toString,
      ckpt.toString, target, "graft_backfill_1")
    // snapshot the checkpoint as it stands after batch 0
    val snap = work.resolve("ckpt_snap"); copyTree(ckpt, snap)
    // 2) the EARLIER half arrives late (out-of-order backfill)
    deliver(docs.filter(col("doc_id") < mid), "a_early_half")
    DocsStream.drainIncrementalDedup(spark, sf, landing.toString,
      ckpt.toString, target, "graft_backfill_2")
    val afterBackfill = graft.sink.VersionedTable.read(spark, target)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q135_incremental_dedup")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(afterBackfill.nonEmpty && afterBackfill == batch,
      "out-of-order delivery must not change the drained relation")
    val versionsBefore = graft.sink.VersionedTable.versions(spark, target)
    // 3) roll the checkpoint back to the post-batch-0 snapshot: the file
    // source forgets the early half and RE-DELIVERS it under the same
    // batch id — the versioned txn ledger must refuse the double-apply
    deleteTree(ckpt); Files.createDirectories(ckpt); copyTree(snap, ckpt)
    DocsStream.drainIncrementalDedup(spark, sf, landing.toString,
      ckpt.toString, target, "graft_backfill_3")
    assert(graft.sink.VersionedTable.versions(spark, target) == versionsBefore,
      "a re-delivered batch must not commit a new version")
    val afterRedelivery = graft.sink.VersionedTable.read(spark, target)
      .collect().map(_.toSeq).toSet
    assert(afterRedelivery == batch, "re-delivery must be idempotent")
  }
}
