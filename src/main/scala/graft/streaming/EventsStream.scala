package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest (SURVEY.md §2.11): the reference is batch-
  * only (its per-scene loop is micro-batch-like, reference main.py:118-139),
  * so the streaming surface is the engine's forward-looking parity path:
  * file-source stream → watermark → tumbling-window rollup → sink.
  *
  * At scale this is the standard continuous-ingest topology: new scene/
  * event files land in a directory, `maxFilesPerTrigger` paces ingestion,
  * the watermark bounds state, and `foreachBatch` drives the K3–K6 merge
  * writers exactly-once per epoch.
  */
object EventsStream {

  /** The parquet file-stream source requires a directory; the driver test
    * data is one file per table, so stage the file into a scratch dir
    * (what a real deployment has anyway: a landing directory files arrive
    * in). Staged dirs are CACHED per (sfDir, table, copies) for the JVM's
    * lifetime — repeated streaming queries in one session (bench, specs)
    * reuse the same landing dir instead of re-copying per call. */
  def stageEvents(sfDir: String, copies: Int): String =
    stageDir(sfDir, "events", copies)

  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), String]()

  /** Temp dir with best-effort recursive cleanup at JVM exit —
    * File.deleteOnExit cannot remove a non-empty directory, so a shutdown
    * hook walks the tree instead. */
  private[graft] def scratchDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(): Unit
      }
      del(dir.toFile)
    }))
    dir
  }

  private[streaming] def stageDir(sfDir: String, table: String, copies: Int = 1): String =
    stagedDirs.computeIfAbsent((sfDir, table, copies), { _ =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dir = scratchDir(s"graft_stream_$table")
      val src = Paths.get(s"$sfDir/$table.parquet")
      (0 until copies).foreach { i =>
        if (Files.isDirectory(src)) {
          // a Spark-written parquet DIRECTORY (the MakeSf sf1 corpus):
          // stage its part files individually — Files.copy on the dir
          // itself copies only an EMPTY directory entry, which silently
          // turned every sf1 streaming measurement into an empty-stream
          // drain (sublinear α for free — r18 find)
          val it = Files.list(src).iterator()
          var j = 0
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(".parquet")) {
              Files.copy(p, dir.resolve(f"${table}%s_${i}%d_$j%05d.parquet"),
                StandardCopyOption.REPLACE_EXISTING)
              j += 1
            }
          }
        } else {
          Files.copy(src, dir.resolve(s"${table}_$i.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      dir.toString
    })

  /** Streaming queries plan their shuffle/state partitioning from
    * spark.sql.shuffle.partitions at START time, and every micro-batch
    * commits one state-store delta file PER partition. For the group
    * cardinalities here (10³–10⁴ keys), 8 partitions bound that commit
    * fan-out; the session's batch setting is restored afterwards. At real
    * scale this is the `spark.sql.streaming` sizing knob — state partitions
    * ≈ executor cores, not the batch shuffle width. */
  private[streaming] def withStreamPartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, old)
  }

  /** Hourly tumbling-window rollup of the events table, executed as a real
    * streaming query over the parquet directory and drained synchronously
    * (memory sink, complete mode). Returns the final result table —
    * identical to the batch hourly rollup (verified against the same
    * DuckDB oracle as the batch query). */
  def hourlyRollupStreaming(spark: SparkSession, sfDir: String,
                            queryName: String = "graft_stream_rollup"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // no maxFilesPerTrigger: AvailableNow drains everything in one batch —
    // per-file trigger pacing only adds micro-batch overhead here (multi-
    // batch accumulation semantics are exercised by streamMergeInto).
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    withStreamPartitions(spark, 8) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(queryName)
  }

  /** Streaming quantile monitoring with BOUNDED state: the q248 register
    * sketch (3-significant-decimal-digit relative-error cells, pure
    * integer bucketing) maintained as a streaming aggregation keyed on
    * (event_type, cell). The streaming STATE is the register — ≤ ~900
    * cells per decade per event type, regardless of how many events
    * flow — which is the whole point at 100 TB/day: exact-count
    * quantile state that never grows with the stream. Counts are
    * order-free, so the drained table is deterministic across
    * micro-batch boundaries. The batch READ-OUT (rank walk at the
    * SketchGrid probes, cell-midpoint estimates — ±0.5% relative) runs
    * on the register-sized result, and the DuckDB oracle replays the
    * identical arithmetic over the raw events (stream/batch parity). */
  def quantileSketchStreaming(spark: SparkSession, sfDir: String,
                              queryName: String = "graft_stream_qsketch"): DataFrame = {
    import graft.queries.StatQueries.{sketchW, sketchCell, sketchMid, SketchGrid}
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
    val reg = stream
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("x"))
      .withColumn("w", sketchW(col("x")))
      .select(col("event_type"), sketchCell(col("x"), col("w")).as("cell"))
      .groupBy(col("event_type"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
    withStreamPartitions(spark, 8) {
      val q = reg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch read-out over the drained REGISTER (register-sized frames);
    // checkpointed: the memory-sink view cannot self-join (duplicate
    // attribute ids), and the register is tiny anyway
    val cells = spark.table(queryName).localCheckpoint()
    val cum = cells.withColumn("cum",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cell"))))
    val grid = cells.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_cells"))
      .select(col("event_type"), col("n"), col("n_cells"),
        explode(array(SketchGrid.map(lit): _*)).as("p"))
      .withColumn("rank_r",
        ceil(col("p") * col("n").cast("double")).cast("long"))
    grid.join(cum, Seq("event_type"))
      .filter(col("cum") >= col("rank_r") &&
        col("cum") - col("cnt") < col("rank_r"))
      .select(col("event_type"), col("p"), col("rank_r"),
        sketchMid(col("cell"), 200.0).as("est_value"),
        col("n_cells"))
  }

  /** Drift-alert threshold for [[driftAlertStreaming]]: a day whose
    * worst probe-gap vs the reference register exceeds this (in value
    * units) alerts. Chosen between the observed quiet-day (~2–8) and
    * shifted-day (~14–23) gaps of the synthetic stream so the flag
    * actually discriminates; in production this is the operator's SLO
    * knob, not a statistic. */
  val DriftAlertGap = 10.0

  /** Streaming drift ALERTING — q249 (register drift table) composed
    * with q250 (register as streaming state): the stream maintains one
    * register PER DAY keyed on (day, cell) — bounded state per window
    * (≤ ~900 cells/decade/day) no matter how many events flow — and
    * the read-out compares each day's quantile probes against the
    * corpus-wide REFERENCE register, which is the per-day registers
    * RE-AGGREGATED (mergeability: no second pass over the data). A day
    * whose max probe gap exceeds [[DriftAlertGap]] raises the alert
    * flag — the "traffic looks weird today" monitor computed entirely
    * inside the stream's bounded state. Counts are order-free, so
    * micro-batch boundaries cannot move a cell (stream/batch parity:
    * the DuckDB oracle replays the identical register arithmetic over
    * the raw events). At 100 TB/day the state is still registers —
    * days × cells — and the comparison frames never leave
    * register size. */
  def driftAlertStreaming(spark: SparkSession, sfDir: String,
                          queryName: String = "graft_stream_drift"): DataFrame = {
    import graft.queries.StatQueries.{sketchW, sketchCell, sketchMid, DriftGrid}
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
    val reg = stream
      .select(date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("x"))
      .withColumn("w", sketchW(col("x")))
      .select(col("day"), sketchCell(col("x"), col("w")).as("cell"))
      .groupBy(col("day"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
    withStreamPartitions(spark, 8) {
      val q = reg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch read-out over the drained per-day registers; the reference
    // register is their cell-wise re-aggregation (merge, not rescan)
    val cells = spark.table(queryName)
      .select(col("day").cast("date").cast("string").as("k"),
        col("cell"), col("cnt"))
      .localCheckpoint()
    val ref = cells.groupBy(col("cell")).agg(sum(col("cnt")).as("cnt"))
      .select(lit("__ref__").as("k"), col("cell"), col("cnt"))
    // register-sized; the checkpoint also sidesteps Catalyst's union
    // constraint-rewrite over the shared-lineage (cells, agg-of-cells)
    // pair under a Window (NoSuchElementException in rewriteConstraints)
    val all = cells.unionByName(ref).localCheckpoint()
    val cum = all.withColumn("cum",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("cell"))))
    val grid = all.groupBy(col("k")).agg(sum(col("cnt")).as("n"))
      .select(col("k"), col("n"),
        explode(array(DriftGrid.map(lit): _*)).as("p"))
      .withColumn("rank_r",
        ceil(col("p") * col("n").cast("double")).cast("long"))
    val ests = grid.join(cum, Seq("k"))
      .filter(col("cum") >= col("rank_r") &&
        col("cum") - col("cnt") < col("rank_r"))
      .select(col("k"), col("p"), sketchMid(col("cell"), 200.0).as("est"))
    val gaps = ests.filter(col("k") =!= "__ref__")
      .join(broadcast(ests.filter(col("k") === "__ref__")
        .select(col("p"), col("est").as("est_ref"))), Seq("p"))
      .withColumn("gap", abs(col("est") - col("est_ref")))
    gaps.join(gaps.groupBy(col("k")).agg(max(col("gap")).as("max_gap")),
        Seq("k"))
      .select(col("k").as("day"), col("p"), col("est").as("est_day"),
        col("est_ref"), col("gap"), col("max_gap"),
        (col("max_gap") > DriftAlertGap).as("alert"))
  }

  /** Number of key-hash buckets the merge target is partitioned into.
    * Locally 32 keeps partition dirs ≈ core count; at 100 TB this is the
    * knob that bounds per-batch rewrite I/O to |touched buckets| / nBuckets
    * of the target. */
  val MergeBuckets = 32

  /** Streaming exact deduplication — the streaming twin of the batch
    * exact-dedup operator: duplicates (the landing dir stages the events
    * file TWICE, so every event arrives twice) are dropped by event_id
    * within the watermark via dropDuplicatesWithinWatermark, then the
    * per-user event counts are aggregated. At scale this is the standard
    * at-least-once-ingest → exactly-once-corpus repair: dedup state is
    * bounded by the watermark delay, not the stream's lifetime. */
  def dedupStreaming(spark: SparkSession, sfDir: String,
                     queryName: String = "graft_stream_dedup"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events", copies = 2))
      .transform(graft.Tables.normalizeTs)
      .select(col("user_id"), col("event_id"), col("ts"))
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    withStreamPartitions(spark, 8) {
      val q = deduped.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(queryName)
  }

  /** Streaming sessionization via session_window (gap 4 h): the streaming
    * twin of the batch gaps-and-islands operator. Session-window semantics
    * start a NEW session when the inter-event gap is >= the gap duration
    * (windows [t, t+gap) merge only when they overlap), so the batch
    * oracle uses the same >= rule. State per key is one open session
    * bounded by the watermark — at 100 TB this is the standard
    * user-activity rollup: state size ~ |active users|, not |events|. */
  def sessionizeStreaming(spark: SparkSession, sfDir: String,
                          queryName: String = "graft_stream_sessions"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"),
           min(unix_seconds(col("ts"))).as("start_s"),
           max(unix_seconds(col("ts"))).as("end_s"))
      .select(col("user_id"), col("n_events"), col("start_s"), col("end_s"))
    withStreamPartitions(spark, 8) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(queryName)
  }

  /** Stream-stream inner join with a time-range condition: every purchase
    * matched to the same user's clicks in the preceding hour. Both sides
    * carry watermarks so buffered state is bounded by the join window +
    * delay, not the stream's lifetime — the canonical funnel-attribution
    * topology at scale. Inner joins emit eagerly, so an AvailableNow drain
    * surfaces every match. */
  def clickPurchaseJoinStreaming(spark: SparkSession, sfDir: String,
                                 queryName: String = "graft_stream_join"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // ONE stream source, two filtered views — a stream self-join scans the
    // landing dir once per micro-batch, not once per side
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val joined = clicks.join(purchases,
        expr("user_id = p_user AND pts >= cts AND pts <= cts + interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_seconds(col("pts")) - unix_seconds(col("cts"))).as("lag_s"))
    withStreamPartitions(spark, 8) {
      val q = joined.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(queryName)
  }

  /** Stream-stream LEFT OUTER join — the state-EXPIRY semantics the
    * inner join never exercises: a click with no purchase in its 1 h
    * window emits (click, NULL) only once the watermark proves no match
    * can still arrive, i.e. the engine must hold the click in state,
    * watch the watermark pass cts + 1 h + delay, and emit-on-expiry.
    *
    * Drain mechanics, which ARE the point: outer results flush only when
    * the watermark ADVANCES PAST the open windows, and the watermark is
    * the min over both sides, computed at batch boundaries. So the
    * landing dir stages the real events plus a LATER sentinel file (one
    * far-future click + one far-future purchase under unmatchable
    * user_ids, different keys so they cannot join each other);
    * maxFilesPerTrigger=1 sequences it into its own micro-batch, whose
    * end-of-batch watermark update unlocks every real click's expiry,
    * and the engine's no-data micro-batch then emits the outer rows.
    * Sentinel artifacts filter out by click_id < 0. */
  def clickPurchaseLeftJoinStreaming(spark: SparkSession, sfDir: String,
                                     queryName: String = "graft_stream_ljoin"): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val landing = stagedDirs.computeIfAbsent((sfDir, "events_lj", 1), { _ =>
      val dir = scratchDir("graft_stream_events_lj")
      Files.copy(Paths.get(s"$sfDir/events.parquet"),
        dir.resolve("a_events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      // Sentinel rows: one per SIDE (the global watermark is the min over
      // both inputs), a day past the corpus horizon. Staged OUTSIDE the
      // landing dir, then copied in TWICE: the first sentinel batch's END
      // advances the watermark to the far future, and outer-state
      // eviction only runs during a batch — the second sentinel batch is
      // that batch, flushing even the click whose expiry sat between the
      // real data's end-watermark and the sentinel's.
      val batch = spark.read.parquet(s"$sfDir/events.parquet")
      // a day past the corpus horizon, in the SOURCE's own ts domain
      // (nanos BIGINT or TIMESTAMP_NTZ depending on the testdata
      // generation) so the staged sentinel unions cleanly with raw files
      val far: Column = batch.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          lit(batch.agg(max(col("ts"))).head.getLong(0) + 86400L * 1000000000L)
        case _ =>
          lit(batch.agg(max(col("ts"))).head
            .getAs[java.time.LocalDateTime](0).plusDays(1))
      }
      val one = batch.limit(1)
      val stage = scratchDir("graft_stream_events_lj_stage")
      one.withColumn("ts", far)
        .withColumn("event_id", lit(-1L)).withColumn("user_id", lit(-999999L))
        .withColumn("event_type", lit("click"))
        .unionByName(one.withColumn("ts", far)
          .withColumn("event_id", lit(-2L)).withColumn("user_id", lit(-888888L))
          .withColumn("event_type", lit("purchase")))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).toArray
        .map(_.toString).find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), dir.resolve("z1_sentinel.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.copy(Paths.get(part), dir.resolve("z2_sentinel.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    })
    // Watermark policy MAX, scoped to this query: both watermark nodes
    // are filtered views of the SAME source, so the source's true
    // event-time high watermark is the max over the views — min-policy
    // tracks whichever view is sparser (measured: the clicks view's
    // node pinned the global watermark at its batch-0 max forever and
    // the last unmatched click never flushed). With one event-time line
    // there is no cross-source skew for min to protect against.
    val wmKey = "spark.sql.streaming.multipleWatermarkPolicy"
    val oldPolicy = spark.conf.getOption(wmKey)
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
      .transform(graft.Tables.normalizeTs)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val joined = clicks.join(purchases,
        expr("user_id = p_user AND pts >= cts AND pts <= cts + interval 1 hour"),
        "leftOuter")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_seconds(col("pts")) - unix_seconds(col("cts"))).as("lag_s"))
      .filter(col("click_id") >= 0)
    withStreamPartitions(spark, 8) {
      spark.conf.set(wmKey, "max")
      try {
        val q = joined.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(queryName)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally oldPolicy match {
        case Some(v) => spark.conf.set(wmKey, v)
        case None => spark.conf.unset(wmKey)
      }
    }
    spark.table(queryName)
  }

  /** Streaming micro-batches committing a BASE table AND its derived MV
    * through ONE [[graft.sink.TxnCatalog]] transaction each — the
    * cross-table exactly-once topology: at-least-once file ingest (the
    * landing dir stages every event TWICE), per-batch incremental dedup
    * against the base (left-anti on event_id), an incremental MV merge
    * of DECIMAL partials, and one catalog claim that makes base and MV
    * visible TOGETHER. A reader through the catalog can never observe a
    * base that its MV hasn't caught up to — the invariant foreachBatch
    * pipelines usually only get per-table. Replay safety is layered:
    * the tables' txn ledgers refuse re-applied batch ids, and a catalog
    * txn that would pin the already-current versions is elided, so a
    * FRESH-checkpoint re-run (full re-delivery) changes nothing.
    * Per-batch driver actions: one emptiness probe on the deduped
    * increment (bounded; skips all three commits for a fully-duplicate
    * batch). Returns the MV read through the catalog. */
  def txnMvStreaming(spark: SparkSession, sfDir: String,
                     workDir: Option[java.nio.file.Path] = None): DataFrame = {
    import graft.sink.{TxnCatalog, VersionedTable}
    val work = workDir.getOrElse(scratchDir("graft_txn_mv"))
    val baseRoot = work.resolve("base").toString
    val mvRoot = work.resolve("mv").toString
    val cat = work.resolve("cat").toString
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // landing dir: the corpus in THREE slice files (three genuinely
    // incremental micro-batches) plus one DUPLICATE of the middle slice
    // (the at-least-once re-delivery the dedup must absorb)
    val landing = stagedDirs.computeIfAbsent((sfDir, "events_txnmv", 4), { _ =>
      val dir = scratchDir("graft_stream_events_txnmv")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      (0 until 3).foreach { k =>
        ev.filter(col("event_id") % 3 === k)
          .coalesce(1).write.mode("append").parquet(dir.toString)
      }
      ev.filter(col("event_id") % 3 === 1)
        .coalesce(1).write.mode("append").parquet(dir.toString)
      dir.toString
    })
    def drain(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(batchSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .select(col("event_id"), col("user_id"), col("value"))
      withStreamPartitions(spark, 8) {
        val q = stream.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, id: Long) =>
            applyTxnMvBatch(spark, baseRoot, mvRoot, cat, b, id)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    drain(work.resolve("ckpt1").toString)
    drain(work.resolve("ckpt2").toString) // fresh checkpoint: full replay, all refused
    TxnCatalog.read(spark, cat, "mv")
      .select(col("user_id"), col("n_events"),
        col("sv").cast("double").as("sum_value"))
  }

  /** One micro-batch of the txn-MV pipeline — the foreachBatch kernel of
    * [[txnMvStreaming]], public so specs can drive its crash windows
    * deterministically.
    *
    * Two invariants this body carries:
    *
    *  1. Dedup and MV merge run against the catalog-PINNED snapshots,
    *     never the table HEADs. A writer can crash BETWEEN
    *     `appendTxn(base)` and the catalog commit; on replay the base
    *     head already holds the batch's events while the catalog (and
    *     therefore the MV) does not. Head-dedup would anti-join the
    *     replay away as "duplicate" and the MV would permanently miss
    *     the batch — a torn catalog state. Pinned-dedup lets the batch
    *     through; the base's txn ledger absorbs the re-apply as a
    *     no-op, the MV merge (from the pinned MV) catches up, and one
    *     claim re-aligns both.
    *  2. The dedup probe is FILE-PRUNED: each batch attaches its
    *     batch-union bloom ([[graft.sink.VersionedTable.buildBloom]]
    *     from the IN-MEMORY frame — no disk re-read, no shuffle) to the
    *     files it wrote ([[graft.sink.VersionedTable.attachBlooms]], a
    *     metadata-only commit; sound because a union bloom is a
    *     superset of every member file's keys), and the next batch
    *     anti-joins only [[graft.sink.VersionedTable
    *     .bloomCandidateFiles]] of the pinned version — O(batch-
    *     relevant files), not O(base). At a 100 TB append-only ledger
    *     the previous full-base probe was the hot-path scale-killer;
    *     bloom misses fall back to scanning nothing (an absent key
    *     needs no file), and files without blooms always survive the
    *     pruning, so the anti-join stays exactly as sound as a full
    *     scan. */
  def applyTxnMvBatch(spark: SparkSession, baseRoot: String, mvRoot: String,
                      cat: String, batch: DataFrame, id: Long,
                      baseName: String = "base", mvName: String = "mv"): Unit = {
    import graft.sink.{TxnCatalog, VersionedTable}
    val pinned = TxnCatalog.currentTxn(spark, cat)
      .map(t => TxnCatalog.snapshot(spark, cat, Some(t)).tables)
    val keysDf = batch.select(col("event_id").cast("string"))
    // ONE pass over the batch both prunes the duplicate-probe read set
    // and builds the bloom this batch will attach to its own files
    val (candidates, batchBloom) = pinned.flatMap(_.get(baseName)) match {
      case None =>
        (Seq.empty[String], VersionedTable.buildBloom(spark, "event_id", keysDf))
      case Some((_, vPin)) =>
        VersionedTable.probeAndBuildBloom(spark, baseRoot, "event_id",
          keysDf, Some(vPin))
    }
    val fresh = (pinned.flatMap(_.get(baseName)) match {
      case None => batch
      case Some((_, vPin)) =>
        if (candidates.isEmpty) batch // no pinned file can hold any batch key
        else batch.join(
          VersionedTable.readSubset(spark, baseRoot, candidates, Some(vPin))
            .select(col("event_id")),
          Seq("event_id"), "left_anti")
    }).localCheckpoint()
    if (!fresh.isEmpty) { // bounded probe: skip fully-duplicate batches
      VersionedTable.appendTxn(spark, baseRoot, fresh, id)
      // zero-rescan index maintenance, scoped to THIS txn's files: the
      // batch-union bloom is a superset of their keys (fresh ⊆ batch) —
      // and of NO other file's. Stamping every un-bloomed file instead
      // would mis-bloom files this batch never wrote (a maintenance
      // compaction's rewrites, a pre-seeded base), silently pruning their
      // keys out of the dedup probe. A crash-window replay still heals:
      // the crashed commit CARRIES this txn id, so its files are found.
      val owed = VersionedTable.filesAddedByTxn(spark, baseRoot, id)
        .intersect(VersionedTable.unbloomedFiles(spark, baseRoot, "event_id"))
      val vBase =
        if (owed.isEmpty) VersionedTable.currentVersion(spark, baseRoot).get
        else VersionedTable.attachBlooms(spark, baseRoot,
          owed.map(_ -> Seq(batchBloom)).toMap)
      val partial = fresh.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      val merged = (pinned.flatMap(_.get(mvName)) match {
        case None => partial
        case Some((_, vPin)) =>
          VersionedTable.read(spark, mvRoot, Some(vPin)).unionByName(partial)
      })
        .groupBy(col("user_id"))
        .agg(sum(col("n_events")).as("n_events"), sum(col("sv")).as("sv"))
      val vMv = VersionedTable.overwriteTxn(spark, mvRoot, merged, id)
      val pins = Map(baseName -> (baseRoot, vBase), mvName -> (mvRoot, vMv))
      // elide the no-op txn a REPLAYED batch would publish — compare
      // only OUR pins (a shared catalog carries other pipelines' tables
      // too, so whole-snapshot equality would never elide)
      val already = pinned.exists(m =>
        pins.forall { case (k, v) => m.get(k).contains(v) })
      if (!already) TxnCatalog.commit(spark, cat, pins)
    }
    ()
  }

  /** Stream-static enrichment: the event stream joined to a STATIC
    * dimension (batch nation table keyed by user_id mod 25) inside the
    * streaming query — Spark broadcasts the static side into every
    * micro-batch; no state, no shuffle of the stream. The standard
    * dimension-enrichment topology for continuous ingest. */
  def enrichedRollupStreaming(spark: SparkSession, sfDir: String,
                              queryName: String = "graft_stream_enrich"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dim = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .transform(graft.Tables.normalizeTs)
      // % (truncated modulo, Remainder) rather than pmod: the DuckDB oracle
      // uses user_id % 25, and the two only agree when the sign convention
      // matches — pmod would silently diverge on negative user_ids.
      .withColumn("nk", col("user_id") % lit(25L))
    val agg = stream
      .join(broadcast(dim), col("nk") === col("n_nationkey"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("n_name"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    withStreamPartitions(spark, 8) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(queryName)
  }

  /** foreachBatch merge sink (SURVEY.md §2.11): each micro-batch upserts
    * into a parquet target — the streaming side of the reference's
    * ON CONFLICT DO UPDATE loads. Counts ACCUMULATE across batches
    * (max event_id, summed n); exactly-once across restarts comes from
    * `checkpoint` — re-running with the same checkpoint skips processed
    * files, so the target is not double-counted.
    *
    * The target is PARTITIONED by a key-hash bucket (`bucket =
    * user_id mod nBuckets`) and each batch rewrites ONLY the buckets its
    * keys touch, via dynamic-partition-overwrite: read back just the
    * touched partitions (partition-pruned scan), merge, write those
    * partitions in a single job. Untouched partitions' files are not read
    * or rewritten — per-batch I/O is O(|touched buckets|), not O(|target|)
    * (a full-target read+rewrite per micro-batch is a scale-killer).
    *
    * Target existence is checked explicitly: a read failure on an
    * existing target PROPAGATES (a swallowed error here would silently
    * reset accumulated state to the current batch). */
  def streamMergeInto(spark: SparkSession, sourceDir: String, targetPath: String,
                      checkpoint: String,
                      queryName: String = "graft_stream_merge",
                      nBuckets: Int = MergeBuckets): Unit = {
    val batchSchema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .select(col("user_id"), col("event_id"), col("value"))
    val q = stream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = batch.groupBy("user_id")
          .agg(max(col("event_id")).as("event_id"), count(lit(1)).as("n"))
          .withColumn("bucket", pmod(col("user_id"), lit(nBuckets)).cast("int"))
        val touched = incoming.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        // localCheckpoint materializes the touched partitions BEFORE the
        // write: Spark (correctly) refuses to overwrite a path that is
        // also being read in the same plan; the checkpoint holds exactly
        // the state being merged — O(|touched|), not O(|target|).
        val existingTouched =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(targetPath)))
            spark.read.parquet(targetPath)  // real read errors propagate
              .filter(col("bucket").isin(touched.map(Int.box): _*))
              .localCheckpoint()
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema)
        existingTouched.unionByName(incoming)
          .groupBy("user_id", "bucket")
          .agg(max(col("event_id")).as("event_id"), sum(col("n")).as("n"))
          .select(col("user_id"), col("event_id"), col("n"), col("bucket"))
          .write
          .partitionBy("bucket")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(targetPath)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming append into a [[graft.sink.VersionedTable]]: every
    * micro-batch commits as one table version, with the batch id recorded
    * as the commit's transaction id — exactly-once by construction even
    * across CHECKPOINT LOSS (re-delivered batches hit the txn ledger and
    * no-op), not just across checkpoint-tracked restarts. At 100 TB this
    * is the continuous-ingest sink: appends are new immutable files + one
    * manifest rename, readers stay snapshot-isolated, and the compaction/
    * expiry maintenance runs as ordinary commits on the same table. */
  def appendVersionedStreaming(spark: SparkSession, sourceDir: String,
                               tableRoot: String, checkpoint: String,
                               queryName: String = "graft_stream_versioned"): Unit = {
    val batchSchema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = stream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sink.VersionedTable.appendTxn(spark, tableRoot, batch, batchId)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stateful per-user running aggregate via the typed state API —
    * flatMapGroupsWithState with state = (count, sum-of-cents). Cents keep
    * the accumulation exact and order-independent (double addition in
    * arbitrary micro-batch order would be nondeterministic in the last
    * ulp; the oracle hash requires exactness). */
  def perUserTotalsStreaming(spark: SparkSession, sfDir: String,
                             queryName: String = "graft_stream_user"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val counted = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Long)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0L))
          var c = c0; var cents = s0
          rows.foreach { r => c += 1; cents += math.round(r._2 * 100.0) }
          state.update((c, cents))
          Iterator((userId, c, cents))
      }.toDF("user_id", "n_events", "sum_cents")
    withStreamPartitions(spark, 8) {
      val q = counted.writeStream
        .outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // last update per user = final state
    import org.apache.spark.sql.expressions.Window
    spark.table(queryName)
      .withColumn("_r", row_number().over(
        Window.partitionBy("user_id").orderBy(col("n_events").desc)))
      .filter(col("_r") === 1).drop("_r")
  }

  /** Incremental sketch maintenance: each micro-batch computes its own
    * 64-row HLL register partial and foreachBatch merges it into a
    * driver-held register store (union + per-bucket max — associative, so
    * batch boundaries cannot change the result). The registers are
    * driver-size BY CONSTRUCTION — 64 entries regardless of stream volume
    * — which is exactly why a 100 TB continuous distinct-count keeps its
    * whole state in the sketch, not in per-key stream state. Two staged
    * copies + one file per trigger force a genuinely multi-batch run (and
    * prove duplicate arrivals don't perturb a distinct sketch).
    * Returns the final (bucket, mx) register table. */
  def hllMaintainStreaming(spark: SparkSession, sfDir: String,
                           queryName: String = "graft_stream_hll"): DataFrame = {
    val store = scala.collection.mutable.Map[Long, Long]()
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir(sfDir, "events", copies = 2))
      .select(col("event_id"))
    withStreamPartitions(spark, 8) {
      val q = stream.writeStream
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val partial = graft.ext.Sketches
            .hllRegisters(batch, col("event_id")).collect()
          store.synchronized {
            partial.foreach { r =>
              val (b, mx) = (r.getLong(0), r.getLong(1))
              store(b) = math.max(store.getOrElse(b, 0L), mx)
            }
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    import spark.implicits._
    store.toSeq.sortBy(_._1).toDF("bucket", "mx")
  }
}
