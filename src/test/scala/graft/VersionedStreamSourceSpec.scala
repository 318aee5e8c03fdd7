package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.VersionedTable

/** The versioned table as a first-class streaming SOURCE:
  * `readStream.format("graft-versioned")` follows the commit log with
  * offset = version number. Contract under test: initial snapshot then
  * per-commit deltas across checkpoint restarts (exactly-once), the
  * append-only guard on rewriting commits (with the ignoreChanges
  * escape hatch), startingVersion, and composition with a downstream
  * streaming aggregate — the capability followChanges' foreachBatch
  * face cannot offer. */
class VersionedStreamSourceSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_vss").resolve("t").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10)
  }

  /** Drain all available commits into a parquet sink (checkpointable),
    * return the accumulated ids (sorted, with duplicates preserved). */
  /** Busy-wait until the wall clock strictly passed `ts` — the next
    * commit's in-commit stamp is then strictly greater, making
    * stamp-boundary assertions deterministic (same-millisecond commits
    * legitimately share a monotonized stamp). */
  private def awaitClockPast(ts: Long): Unit =
    while (System.currentTimeMillis() <= ts) Thread.sleep(1)

  private def drain(root: String, checkpoint: String, outDir: String,
                    options: Map[String, String] = Map.empty): Seq[Long] = {
    val reader = spark.readStream.format("graft-versioned")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
  }

  test("initial snapshot, then per-commit deltas, exactly once across restarts") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    VersionedTable.append(spark, root, df(3))    // v2
    val ckpt = Files.createTempDirectory("vss_ckpt").toString
    val out = Files.createTempDirectory("vss_out").toString
    assert(drain(root, ckpt, out) == Seq(1L, 2L, 3L),
      "first drain = the current snapshot")
    // new commits after the checkpointed offset: ONLY the delta arrives
    VersionedTable.append(spark, root, df(4))    // v3
    VersionedTable.appendCas(spark, root, df(5)) // v4
    assert(drain(root, ckpt, out) == Seq(1L, 2L, 3L, 4L, 5L),
      "restart delivers exactly the two new commits, nothing re-emitted")
    // no new commits -> drain is a no-op
    assert(drain(root, ckpt, out) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a rewriting commit fails the append-only feed; ignoreChanges re-delivers") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    val ckpt = Files.createTempDirectory("vss_ckpt2").toString
    val out = Files.createTempDirectory("vss_out2").toString
    assert(drain(root, ckpt, out) == Seq(1L, 2L))
    VersionedTable.overwrite(spark, root, df(9)) // removes v1's files
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckpt, out)
    }
    assert(e.getMessage.contains("not an append-only feed"),
      s"expected the append-only guard, got: ${e.getMessage}")
    // opting in re-delivers the rewritten files' rows on a fresh feed
    val ckpt2 = Files.createTempDirectory("vss_ckpt3").toString
    val out2 = Files.createTempDirectory("vss_out3").toString
    assert(drain(root, ckpt2, out2, Map("ignoreChanges" -> "true")) == Seq(9L))
  }

  test("startingVersion skips the history before it") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    VersionedTable.append(spark, root, df(3))    // v2
    VersionedTable.append(spark, root, df(4))    // v3
    val ckpt = Files.createTempDirectory("vss_ckpt4").toString
    val out = Files.createTempDirectory("vss_out4").toString
    assert(drain(root, ckpt, out, Map("startingVersion" -> "2")) == Seq(3L, 4L),
      "versions before startingVersion never deliver")
  }

  test("startingTimestamp resolves to the first commit at or after the bound") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    // same-millisecond commits share a monotonized stamp and an
    // equal-stamp bound resolves to the EARLIER version — wait out v1's
    // stamp so the v2 boundary below is deterministic, and assert it
    awaitClockPast(VersionedTable.commitTimestamps(spark, root).toMap.apply(1))
    VersionedTable.append(spark, root, df(3))    // v2
    VersionedTable.append(spark, root, df(4))    // v3
    val stamps = VersionedTable.commitTimestamps(spark, root).toMap
    assert(stamps(1) < stamps(2), "the boundary stamps must be strict")
    // the bound = v2's exact in-commit stamp: v2 is "at or after" it
    val ckpt = Files.createTempDirectory("vss_ckptT").toString
    val out = Files.createTempDirectory("vss_outT").toString
    assert(drain(root, ckpt, out,
      Map("startingTimestamp" -> stamps(2).toString)) == Seq(3L, 4L),
      "streaming from v2's stamp delivers v2 and v3, never v1")
    // a bound past the newest commit: FUTURE commits only — the
    // tail-a-live-table shape (nothing delivered until a new commit)
    val ckpt2 = Files.createTempDirectory("vss_ckptT2").toString
    val out2 = Files.createTempDirectory("vss_outT2").toString
    val futureOpt = Map("startingTimestamp" -> (stamps(3) + 1L).toString)
    locally { // drain without the parquet read-back (sink may be empty)
      val reader = spark.readStream.format("graft-versioned")
      futureOpt.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load(root)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(!new java.io.File(out2).listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "a future bound delivers nothing yet")
    Thread.sleep(30) // v4's stamp must land past the bound
    VersionedTable.append(spark, root, df(5))    // v4, after the bound
    assert(drain(root, ckpt2, out2, futureOpt) == Seq(5L),
      "the next commit streams")
    // mutual exclusion with startingVersion
    val e = intercept[Exception] {
      drain(root, Files.createTempDirectory("x").toString,
        Files.createTempDirectory("y").toString,
        Map("startingTimestamp" -> "0", "startingVersion" -> "2"))
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }

  test("startingVersion = latest streams only post-start commits (Delta parity)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    VersionedTable.append(spark, root, df(3))    // v2
    val ckpt = Files.createTempDirectory("vss_ckptL").toString
    val out = Files.createTempDirectory("vss_outL").toString
    // ONE running stream: "latest" resolves at stream start (like
    // Delta, the resolution persists through the checkpoint only once
    // a batch commits, so the observable contract is within-run)
    val q = spark.readStream.format("graft-versioned")
      .option("startingVersion", "latest").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(!new java.io.File(out).listFiles()
        .exists(_.getName.endsWith(".parquet")),
        "latest = nothing from pre-start history")
      VersionedTable.append(spark, root, df(9))  // v3, post-start
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(9L),
      "only the post-start commit streams")
  }

  test("batch CDF takes startingTimestamp/endingTimestamp range bounds") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1)) // v1
    // both [v2, v2] boundaries must be strict: a v1/v2 (or v2/v3) stamp
    // tie would pull the neighbor version into the wall-clock range
    awaitClockPast(VersionedTable.commitTimestamps(spark, root).toMap.apply(1))
    VersionedTable.append(spark, root, df(2)) // v2
    awaitClockPast(VersionedTable.commitTimestamps(spark, root).toMap.apply(2))
    VersionedTable.append(spark, root, df(3)) // v3
    val stamps = VersionedTable.commitTimestamps(spark, root).toMap
    assert(stamps(1) < stamps(2) && stamps(2) < stamps(3))
    val got = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", stamps(2).toString)
      .option("endingTimestamp", stamps(2).toString)
      .load(root)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, "insert", 2L)),
      s"the wall-clock range [v2, v2] is exactly v2's delta: $got")
    // a starting bound past the head REFUSES on the batch face (an
    // empty table_changes range is a caller bug, Delta parity)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", (stamps(3) + 60000L).toString)
        .load(root).count()
    }
    assert(e.getMessage.contains("after the newest commit"), e.getMessage)
  }

  test("maxVersionsPerTrigger bounds each micro-batch to N commits") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1)) // v1
    VersionedTable.append(spark, root, df(2)) // v2
    VersionedTable.append(spark, root, df(3)) // v3
    val out = Files.createTempDirectory("vss_out5").toString
    val q = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("vss_ckpt5").toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // the drain ran as three single-commit batches, not one big one
    val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
    assert(nonEmpty >= 3, s"expected >=3 rate-limited batches, saw $nonEmpty")
  }

  test("streaming SINK: each micro-batch commits exactly-once; source->sink round-trips") {
    // build a versioned SOURCE table in three commits
    val src = freshRoot()
    VersionedTable.create(spark, src, df(1, 2))
    VersionedTable.append(spark, src, df(3))
    VersionedTable.append(spark, src, df(4, 5))
    // stream it INTO a versioned SINK table, one commit per micro-batch
    val dst = freshRoot()
    val ckpt = Files.createTempDirectory("vsk_ckpt").toString
    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("graft-versioned")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    drainOnce()
    assert(spark.read.format("graft-versioned").load(dst)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // each micro-batch became one commit, txn-stamped
    assert(VersionedTable.versions(spark, dst).size == 3)
    assert(VersionedTable.committedTxns(spark, dst) == Set(0L, 1L, 2L))
    // replay with a FRESH checkpoint re-delivers every batch: the txn
    // ledger... uses batch ids, which restart at 0 — a fresh checkpoint
    // re-applies txns 0..2 and the ledger refuses all three
    val ckpt2 = Files.createTempDirectory("vsk_ckpt2").toString
    val q2 = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.format("graft-versioned")
      .option("path", dst)
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.format("graft-versioned").load(dst)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "re-delivered batches must be refused by the txn ledger")
    // new source commits flow through incrementally on the ORIGINAL checkpoint
    VersionedTable.append(spark, src, df(6))
    drainOnce()
    assert(spark.read.format("graft-versioned").load(dst)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == (1L to 6L))
  }

  test("streaming sink in Complete mode republishes the aggregate per batch") {
    val src = freshRoot()
    VersionedTable.create(spark, src, df(1, 2, 3))
    VersionedTable.append(spark, src, df(4, 5))
    val dst = freshRoot()
    val q = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(src)
      .groupBy((col("id") % 2).as("parity"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("graft-versioned").option("path", dst)
      .option("checkpointLocation", Files.createTempDirectory("vsk_ckpt3").toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val got = VersionedTable.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 2L), (1L, 3L)), s"final snapshot = batch aggregate: $got")
    // each batch overwrote: final version = #batches, snapshot is newest only
    assert(VersionedTable.versions(spark, dst).size >= 2)
  }

  test("the stream composes with a downstream streaming aggregate") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))
    VersionedTable.append(spark, root, df(4, 5))
    val q = spark.readStream.format("graft-versioned").load(root)
      .groupBy((col("id") % 2).as("parity"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("p"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("vss_agg")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT parity, n, p FROM vss_agg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 2L, 60L), (1L, 3L, 90L)),
      s"streaming agg over the table feed: $got")
  }

  test("native sink under adversarial delivery: duplicated and out-of-order batches; final table == batch") {
    import org.apache.spark.sql.streaming.OutputMode
    // drive the sink's addBatch DIRECTLY with the delivery schedule a
    // failing/zombie driver produces: commit 0, skip ahead to 2, a LATE
    // batch 1 lands afterwards, then batch 2 is re-delivered mid-stream
    // (engine retry after a partial failure). Appends commute, so the
    // final table must equal the one-of-each union no matter the order;
    // the txn ledger must refuse exactly the re-delivery.
    val dst = freshRoot()
    val sink = new graft.sources.VersionedSource().createSink(
      spark.sqlContext, Map("path" -> dst), Seq.empty, OutputMode.Append())
    val b0 = df(1, 2); val b1 = df(3); val b2 = df(4, 5)
    sink.addBatch(0, b0)
    sink.addBatch(2, b2)            // arrives before its predecessor
    sink.addBatch(1, b1)            // the late batch — genuinely new, applies
    sink.addBatch(2, df(99, 100))   // duplicated mid-stream: MUST be refused,
                                    // even carrying different (corrupt) data
    val ids = spark.read.format("graft-versioned").load(dst)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L),
      s"adversarial delivery must converge to the batch union, got $ids")
    assert(VersionedTable.committedTxns(spark, dst) == Set(0L, 1L, 2L))
    // and the same union through the REAL engine equals it byte-for-byte:
    // stream a 3-commit source into a fresh sink and compare contents
    val src = freshRoot()
    VersionedTable.create(spark, src, b0)
    VersionedTable.append(spark, src, b1)
    VersionedTable.append(spark, src, b2)
    val dst2 = freshRoot()
    val q = spark.readStream.format("graft-versioned")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.format("graft-versioned").option("path", dst2)
      .option("checkpointLocation", Files.createTempDirectory("vss_adv").toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val viaEngine = spark.read.format("graft-versioned").load(dst2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaAdversary = spark.read.format("graft-versioned").load(dst)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaEngine == viaAdversary, "order/duplication must be invisible in the rows")
  }

  test("readChangeFeed: typed inserts/deletes; a compaction delivers NOTHING") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3).coalesce(1))  // v1
    VersionedTable.append(spark, root, df(4).coalesce(1))        // v2
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)        // v3: MoR delete
    VersionedTable.compact(spark, root, targetBytes = Long.MaxValue / 4) // v4: rewrite
    val out = Files.createTempDirectory("vss_cdf_out").toString
    val q = spark.readStream.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("vss_cdf_ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.read.parquet(out)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // v1 snapshot as inserts, v2's append, v3's vectored delete as a
    // typed delete row; v4's compaction (a pure rewrite that also
    // materializes the vector) cancels in the diff and delivers nothing
    assert(feed == Seq((1L, "insert"), (2L, "delete"), (2L, "insert"),
      (3L, "insert"), (4L, "insert")), s"got $feed")
  }

  /** Run `body` while a continuously-triggered stream over `root` is
    * live (its schema pinned at start), then drain what body committed.
    * Returns the query so the caller asserts delivery or failure. */
  private def withLiveStream(root: String, out: String, ckpt: String,
                             options: Map[String, String] = Map.empty)
      (body: => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.format("graft-versioned")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable() // the initial snapshot, under the pinned schema
    body
    q
  }

  test("schema evolution refuses a LIVE pre-change stream; a restart adopts it") {
    // the contract (ignoreChanges precedent): a RUNNING stream pinned
    // its schema before the addColumn, so delivering the widened
    // commits would silently drop the new column — refuse with the
    // restart instruction. A restart re-pins the current schema, so the
    // same checkpoint then replays and continues CORRECTLY (null-fill
    // for pre-evolution files) — the remedy the error names must work.
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    val out = Files.createTempDirectory("vss_ev_out").toString
    val ckpt = Files.createTempDirectory("vss_ev_ck").toString
    val q = withLiveStream(root, out, ckpt) {
      VersionedTable.addColumn(spark, root, "score", "double") // v2: widen
      VersionedTable.append(spark, root,
        df(3).withColumn("score", lit(0.5))) // v3: rows WITH the new column
    }
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("changed the table schema"),
      s"expected the schema-evolution guard, got: ${e.getMessage}")
    assert(e.getMessage.contains("ignoreSchemaChanges"),
      "the refusal must name the escape hatch")
    // restart on the SAME checkpoint (the failed batch never committed):
    // the new run pins the widened schema and the replay passes the
    // guard — restart-after-addColumn cannot wedge
    val q2 = spark.readStream.format("graft-versioned").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L), "the restarted stream delivers the refused commits")
    assert(got.columns.contains("score"))
    assert(got.filter(col("id") === 3).select("score")
      .collect().head.getDouble(0) == 0.5,
      "post-restart delivery carries the new column")
  }

  test("maxBytesPerTrigger splits a large commit across triggers, exactly once") {
    val root = freshRoot()
    import spark.implicits._
    // v1: one big snapshot commit in 8 files; v2: 4 more
    VersionedTable.create(spark, root,
      (1L to 400L).toDF("id").withColumn("payload", col("id") * 10)
        .repartition(8))
    VersionedTable.append(spark, root,
      (401L to 500L).toDF("id").withColumn("payload", col("id") * 10)
        .repartition(4))
    val ckpt = Files.createTempDirectory("vss_bytes_ck").toString
    val out = Files.createTempDirectory("vss_bytes_out").toString
    val opts = Map("maxBytesPerTrigger" -> "2500")
    assert(drain(root, ckpt, out, opts) == (1L to 500L),
      "every row arrives exactly once despite the byte cap")
    val batches = new java.io.File(ckpt, "offsets").list()
      .count(!_.startsWith("."))
    assert(batches > 3,
      s"a ~2.5 KB budget must split the 12-file log into many " +
        s"micro-batches, got $batches")
    // restart on the same checkpoint: nothing re-delivers
    assert(drain(root, ckpt, out, opts) == (1L to 500L))
    // the feed keeps following new commits, still byte-capped
    VersionedTable.append(spark, root,
      (501L to 520L).toDF("id").withColumn("payload", col("id") * 10)
        .coalesce(1))
    assert(drain(root, ckpt, out, opts) == (1L to 520L))
    // a budget smaller than any single file still progresses (one file
    // per batch), and a version-cap composes with the byte cap
    val root2 = freshRoot()
    VersionedTable.create(spark, root2,
      (1L to 50L).toDF("id").withColumn("payload", col("id")).repartition(5))
    val ck2 = Files.createTempDirectory("vss_bytes_ck2").toString
    val out2 = Files.createTempDirectory("vss_bytes_out2").toString
    assert(drain(root2, ck2, out2, Map("maxBytesPerTrigger" -> "10"))
      == (1L to 50L))
    assert(new java.io.File(ck2, "offsets").list().count(!_.startsWith("."))
      >= 5, "a sub-file budget admits exactly one file per batch")
  }

  test("byte-capped admission survives retention-expired intermediate manifests") {
    // Byte-capped admission sizes each version's ADDED files, which
    // needs every intermediate manifest (addedOf(x) reads x AND x-1);
    // a fresh byte-capped stream on a table whose early history was
    // expired would die in latestOffset. The contract: forfeit the
    // byte cap for the unsizable range and deliver whole-version (the
    // endpoint manifests are all that path needs) — never fail a feed
    // that an UNCAPPED stream would serve fine.
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))  // v1
    VersionedTable.append(spark, root, df(3))     // v2
    VersionedTable.append(spark, root, df(4))     // v3
    // expire v1's manifest; v3 still references the surviving files
    VersionedTable.expire(spark, root, keepLast = 2)
    intercept[IllegalArgumentException] {
      VersionedTable.filesOf(spark, root, Some(1))
    }
    val ckpt = Files.createTempDirectory("vss_exp_ck").toString
    val out = Files.createTempDirectory("vss_exp_out").toString
    assert(drain(root, ckpt, out, Map("maxBytesPerTrigger" -> "10"))
      == Seq(1L, 2L, 3L, 4L),
      "the feed delivers the snapshot despite the unsizable range")
    // new commits AFTER the expired range are sizable again: the byte
    // cap re-engages and the delta arrives exactly once
    VersionedTable.append(spark, root, df(5))     // v4
    assert(drain(root, ckpt, out, Map("maxBytesPerTrigger" -> "10"))
      == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a commit racing between schema pin and source construction still refuses") {
    // the guard must anchor on the PINNED SCHEMA, not a version captured
    // at construction: an addColumn landing between sourceSchema's pin
    // and the source's construction makes any construction-time anchor
    // agree with toV (both post-change) while the stream would deliver
    // the pre-change pin — silently dropping the new column.
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                   // v1
    val pinned = VersionedTable.schemaOf(spark, root)              // pin at v1
    VersionedTable.addColumn(spark, root, "score", "double")       // v2 (the race)
    VersionedTable.append(spark, root,
      df(3).withColumn("score", lit(0.5)))                         // v3
    val src = new graft.sources.VersionedStreamSource(
      spark.sqlContext, root, pinned,
      startingVersion = None, ignoreChanges = false)
    val e = intercept[IllegalStateException] {
      src.getBatch(None, graft.sources.VersionOffset(3L))
    }
    assert(e.getMessage.contains("changed the table schema"),
      s"the initial batch must refuse the raced evolution, got: ${e.getMessage}")
  }

  test("ignoreSchemaChanges keeps a live stream delivering under its pinned schema") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2)) // v1
    val out = Files.createTempDirectory("vss_ev_out2").toString
    val q = withLiveStream(root, out,
      Files.createTempDirectory("vss_ev_ck2").toString,
      Map("ignoreSchemaChanges" -> "true")) {
      VersionedTable.addColumn(spark, root, "score", "double")
      VersionedTable.append(spark, root, df(3).withColumn("score", lit(0.5)))
    }
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L), "opting in keeps the feed alive across the change")
    assert(!got.columns.contains("score"),
      "pinned-schema delivery drops the post-evolution column")
  }

  test("the change feed refuses mid-stream schema evolution the same way") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1).coalesce(1)) // v1
    val out = Files.createTempDirectory("vss_cdf_ev").toString
    val q = spark.readStream.format("graft-versioned")
      .option("readChangeFeed", "true").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("vss_cdf_ev_ck").toString)
      .start()
    q.processAllAvailable() // snapshot batch under the v1 schema
    VersionedTable.addColumn(spark, root, "tag", "string")    // v2
    VersionedTable.append(spark, root,
      df(2).withColumn("tag", lit("t")).coalesce(1))          // v3
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("changed the table schema") &&
      e.getMessage.contains("ignoreSchemaChanges"),
      s"the CDF mode shares the guard, got: ${e.getMessage}")
  }
}
