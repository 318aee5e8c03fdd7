package graft

import org.apache.spark.sql.functions._
import graft.sink.{TxnCatalog, VersionedTable}

/** Contract tests for multi-table transactions: one catalog claim makes a
  * batch of table versions visible together; a crash between stages
  * leaves snapshot readers on the old versions of ALL tables; concurrent
  * catalog txns rebase when disjoint and conflict when overlapping;
  * single-table CAS writers keep working underneath pinned snapshots. */
class TxnCatalogSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_txn").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10)
  }

  private def idsOf(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
    frame.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("one txn makes a batch of table versions visible together; time travel works") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    val t1 = TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1, 2), "b" -> df(10)), n => s"$dir/$n")
    assert(t1 == 1)
    val t2 = TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1, 2, 3), "b" -> df(10, 20)), n => s"$dir/$n")
    assert(t2 == 2)
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(1L, 2L, 3L))
    assert(idsOf(TxnCatalog.read(spark, cat, "b")) == Seq(10L, 20L))
    // txn 1 is a consistent historical snapshot of BOTH tables
    assert(idsOf(TxnCatalog.read(spark, cat, "a", Some(1))) == Seq(1L, 2L))
    assert(idsOf(TxnCatalog.read(spark, cat, "b", Some(1))) == Seq(10L))
  }

  test("catalog reads go through the relation face: pushdown + metadata count") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1L to 50L: _*)), n => s"$dir/$n")
    // a catalog-consistent count(*) is one manifest read, no scan
    val c = TxnCatalog.read(spark, cat, "a").agg(count(lit(1)).as("n"))
    assert(c.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    }.isEmpty, "catalog count(*) must answer from the manifest")
    assert(c.collect().head.getLong(0) == 50L)
    // pushed filters reach the manifest pruning layer through the catalog
    graft.sources.VersionedSource.lastScan = None
    assert(idsOf(TxnCatalog.read(spark, cat, "a")
      .filter(col("id") <= 3L)) == Seq(1L, 2L, 3L))
    assert(graft.sources.VersionedSource.lastScan.nonEmpty,
      "catalog reads must scan through the pruning relation")
  }

  test("crash between stages: catalog readers stay on the OLD versions of ALL tables") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1), "b" -> df(10)), n => s"$dir/$n")
    // simulate the crash: stage 1 (table a) commits at the TABLE level,
    // then the writer dies before staging b and before the catalog claim
    VersionedTable.overwrite(spark, s"$dir/a", df(99))
    // raw per-table readers see the orphaned new version...
    assert(idsOf(VersionedTable.read(spark, s"$dir/a")) == Seq(99L))
    // ...but the transactional view is still the old state of BOTH —
    // never a's new data with b's old data
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(1L))
    assert(idsOf(TxnCatalog.read(spark, cat, "b")) == Seq(10L))
    // recovery = simply re-running the transaction; both flip together
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(99), "b" -> df(77)), n => s"$dir/$n")
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(99L))
    assert(idsOf(TxnCatalog.read(spark, cat, "b")) == Seq(77L))
  }

  test("a snapshot resolved before a later txn keeps reading its pinned versions") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1), "b" -> df(10)), n => s"$dir/$n")
    val pinnedA = TxnCatalog.read(spark, cat, "a")
    val pinnedB = TxnCatalog.read(spark, cat, "b")
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(5), "b" -> df(50)), n => s"$dir/$n")
    assert(idsOf(pinnedA) == Seq(1L) && idsOf(pinnedB) == Seq(10L))
  }

  test("expectedTxn (CAS form) refuses to publish over an unseen catalog state") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(1)), n => s"$dir/$n")
    val va = VersionedTable.overwrite(spark, s"$dir/a", df(2))
    // another txn lands in between
    TxnCatalog.commit(spark, cat, Map("b" -> (s"$dir/b_x", 1)))
    intercept[TxnCatalog.ConcurrentTxnException] {
      TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", va)),
        expectedTxn = Some(1))
    }
  }

  test("concurrent catalog txns: disjoint sets both land via rebase; overlap conflicts") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1), "b" -> df(10), "c" -> df(100)), n => s"$dir/$n")
    val va = VersionedTable.overwrite(spark, s"$dir/a", df(2))
    val vb = VersionedTable.overwrite(spark, s"$dir/b", df(20))
    val vc = VersionedTable.overwrite(spark, s"$dir/c", df(200))
    // three writers race txns over DISJOINT tables — all must land
    val fs = Seq("a" -> va, "b" -> vb, "c" -> vc).map { case (t, v) =>
      Future(TxnCatalog.commit(spark, cat, Map(t -> (s"$dir/$t", v))))
    }
    val got = Await.result(Future.sequence(fs), 60.seconds)
    assert(got.sorted == Seq(2, 3, 4), s"all disjoint txns land, got $got")
    val snap = TxnCatalog.snapshot(spark, cat)
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(2L))
    assert(idsOf(TxnCatalog.read(spark, cat, "b")) == Seq(20L))
    assert(idsOf(TxnCatalog.read(spark, cat, "c")) == Seq(200L))
    // overlapping txns: loser is refused, not silently last-writer-wins
    val va2 = VersionedTable.overwrite(spark, s"$dir/a", df(3))
    val va3 = VersionedTable.overwrite(spark, s"$dir/a", df(4))
    val both = Seq(va2, va3).map { v =>
      Future(
        try Right(TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", v))))
        catch { case e: TxnCatalog.ConcurrentTxnException => Left(e) })
    }
    val results = Await.result(Future.sequence(both), 60.seconds)
    val (losers, winners) = results.partition(_.isLeft)
    // serial schedules are legal too (both land in sequence); the races
    // that DO collide must surface the conflict, never drop a pin
    assert(winners.nonEmpty, "at least one overlapping txn must land")
    assert(winners.size + losers.size == 2)
    val finalA = TxnCatalog.snapshot(spark, cat).tables("a")._2
    assert(Seq(va2, va3).contains(finalA), "final pin is one of the contenders")
  }

  test("single-table CAS writers keep landing underneath a pinned catalog") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(0)), n => s"$dir/$n")
    val writers = (1 to 3).map { w =>
      Future((1 to 3).foreach { k =>
        VersionedTable.appendCas(spark, s"$dir/a", df(w * 10L + k))
      })
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // every append landed at the table level...
    val expected = (Seq(0L) ++ (for (w <- 1 to 3; k <- 1 to 3) yield w * 10L + k)).sorted
    assert(idsOf(VersionedTable.read(spark, s"$dir/a")) == expected)
    // ...while the catalog still serves the pinned txn-1 state
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(0L))
    // and the next txn can pin the advanced table
    val cur = VersionedTable.currentVersion(spark, s"$dir/a").get
    TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", cur)))
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == expected)
  }

  test("registerViews: spark.sql reads a consistent pinned snapshot, incl. historical txns") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1, 2), "b" -> df(10)), n => s"$dir/$n")
    TxnCatalog.commitTables(spark, cat,
      Seq("a" -> df(1, 2, 3), "b" -> df(10, 20)), n => s"$dir/$n")
    // current snapshot through SQL
    assert(TxnCatalog.registerViews(spark, cat) == Seq("txn_a", "txn_b"))
    val cur = spark.sql(
      "SELECT (SELECT count(*) FROM txn_a) AS na, (SELECT count(*) FROM txn_b) AS nb")
      .head
    assert((cur.getLong(0), cur.getLong(1)) == ((3L, 2L)))
    // txn 1, time-traveled, under its own prefix — and immune to a
    // table-level commit racing ahead
    VersionedTable.overwrite(spark, s"$dir/a", df(99))
    TxnCatalog.registerViews(spark, cat, prefix = "t1", txn = Some(1))
    val old = spark.sql(
      "SELECT (SELECT count(*) FROM t1_a) AS na, (SELECT count(*) FROM t1_b) AS nb")
      .head
    assert((old.getLong(0), old.getLong(1)) == ((2L, 1L)))
  }

  test("table expire keeps versions pinned by live txns; catalog expire releases them") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    // txn 1 pins a@v1; the table then advances through four more versions
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(1)), n => s"$dir/$n")
    (2 to 5).foreach(k => VersionedTable.overwrite(spark, s"$dir/a", df(k.toLong)))
    assert(VersionedTable.versions(spark, s"$dir/a") == (1 to 5))
    // aggressive table GC: v1 is OLD but PINNED — it must survive with
    // its files; the unpinned middle history goes
    val (dropped, _) = VersionedTable.expire(spark, s"$dir/a", keepLast = 1)
    assert(dropped == 3, s"v2..v4 age out, pinned v1 survives (dropped $dropped)")
    assert(VersionedTable.versions(spark, s"$dir/a") == Seq(1, 5))
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(1L),
      "the pinned snapshot still reads after table GC")
    // commit txn 2 pinning v5, then expire the CATALOG down to it: txn 1's
    // pin is released and the next table expire ages v1 out
    TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", 5)))
    assert(TxnCatalog.expire(spark, cat, keepLast = 1) == 1)
    val (dropped2, _) = VersionedTable.expire(spark, s"$dir/a", keepLast = 1)
    assert(dropped2 == 1 && VersionedTable.versions(spark, s"$dir/a") == Seq(5))
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(5L))
    // a marker whose catalog is deleted entirely is retired: expire runs
    // clean and keeps only the tail
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(): Unit
    }
    rmrf(new java.io.File(cat))
    VersionedTable.overwrite(spark, s"$dir/a", df(6))
    val (dropped3, _) = VersionedTable.expire(spark, s"$dir/a", keepLast = 1)
    assert(dropped3 == 1 && VersionedTable.versions(spark, s"$dir/a") == Seq(6))
  }

  test("q189 invariant: at EVERY committed txn, the MV equals the rollup of the base at that txn") {
    import org.apache.spark.sql.functions.{count => cnt, _}
    // the atomicity claim itself, checked at every historical snapshot:
    // a catalog reader at txn t sees a base and an MV that agree — not
    // just at the end, but at every intermediate commit point
    val work = java.nio.file.Files.createTempDirectory("graft_txn_mv_spec")
    graft.streaming.EventsStream.txnMvStreaming(spark, sf, Some(work)).collect()
    val cat = work.resolve("cat").toString
    val ts = TxnCatalog.txns(spark, cat)
    assert(ts.size >= 2, s"expected multiple incremental txns, got $ts")
    ts.foreach { t =>
      val base = TxnCatalog.read(spark, cat, "base", Some(t))
      val mv = TxnCatalog.read(spark, cat, "mv", Some(t))
      val recomputed = base.groupBy(col("user_id"))
        .agg(cnt(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).stripTrailingZeros)).toSet
      val got = mv.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
      assert(got == recomputed, s"txn $t: MV must equal its base's rollup")
    }
    // and the base at the LAST txn is the deduped corpus exactly once
    val last = TxnCatalog.read(spark, cat, "base", Some(ts.last))
    val ids = last.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ids.distinct, "no duplicate events survive")
  }

  test("pipeline commitRunTxn: the three product tables flip in one claim") {
    val dir = freshDir()
    // build a tiny Result-shaped trio through the real pipeline tables
    import spark.implicits._
    val full = Seq((1L, 0.5)).toDF("scene_id", "ndvi")
    val clipped = Seq((1L, 0.4)).toDF("scene_id", "ndvi")
    val viz = Seq((1L, 128)).toDF("scene_id", "gray")
    val r = graft.pipeline.NdviPipeline.Result(full, clipped, viz,
      None, spark.emptyDataFrame,
      graft.pipeline.NdviPipeline.RunSummary(1, 1, 0))
    val (txn, vs) = graft.pipeline.NdviPipeline.commitRunTxn(spark, r, dir)
    assert(txn == 1)
    assert(vs.keySet == Set("ndvi_full", "ndvi_clipped", "ndvi_viz"))
    val cat = s"$dir/_catalog"
    assert(TxnCatalog.read(spark, cat, "ndvi_full").count() == 1)
    assert(TxnCatalog.read(spark, cat, "ndvi_clipped").count() == 1)
    assert(TxnCatalog.read(spark, cat, "ndvi_viz").count() == 1)
  }

  private def eventsDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, i.toLong % 7, i.toDouble))
      .toDF("event_id", "user_id", "value")
  }

  test("txn-MV crash window: base landed but catalog didn't — the replayed batch still reaches the MV") {
    // The exactly-once hazard the pinned-snapshot dedup closes: a writer
    // crashes BETWEEN appendTxn(base) and the catalog commit, so the
    // base HEAD holds the batch while the catalog (and the MV) do not.
    // A head-deduping replay would anti-join the batch away as
    // "duplicate" and the MV would permanently miss it — the next txn
    // would then pin a base containing events its MV never saw. The
    // pinned-base dedup lets the replay through; the base txn ledger
    // absorbs the re-apply and one claim re-aligns both tables.
    import graft.streaming.EventsStream
    val dir = freshDir()
    val base = s"$dir/base"; val mv = s"$dir/mv"; val cat = s"$dir/_catalog"
    EventsStream.applyTxnMvBatch(spark, base, mv, cat, eventsDf(0 until 50), 0L)
    // the crash: batch 1 reaches the base, then the writer dies
    VersionedTable.appendTxn(spark, base, eventsDf(50 until 100), 1L)
    assert(TxnCatalog.read(spark, cat, "base").count() == 50,
      "catalog still on the pre-crash snapshot")
    // recovery = replaying batch 1 under the same id
    EventsStream.applyTxnMvBatch(spark, base, mv, cat, eventsDf(50 until 100), 1L)
    val gotBase = TxnCatalog.read(spark, cat, "base")
    val ids = gotBase.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 100L), "every event exactly once — no duplicate, no loss")
    // the MV caught up: it equals the rollup of the base it is pinned with
    val expect = gotBase.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
    val got = TxnCatalog.read(spark, cat, "mv")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
    assert(got == expect, "MV must equal the pinned base's rollup after recovery")
  }

  test("a base compaction between batches cannot poison the dedup blooms") {
    // the bloom-maintenance soundness hazard: a maintenance compaction
    // rewrites the base into NEW files that carry no blooms. If the next
    // batch stamped every un-bloomed file with ITS union bloom, the
    // compacted file holding the whole history would advertise only the
    // new batch's keys — a later at-least-once re-delivery of an OLD
    // span would be bloom-pruned out of the duplicate probe and appended
    // twice. Bloom attachment is scoped to the batch's OWN txn files, so
    // the compacted file stays bloom-less (always probed) and the
    // re-delivery is absorbed.
    import graft.streaming.EventsStream
    val dir = freshDir()
    val base = s"$dir/base"; val mv = s"$dir/mv"; val cat = s"$dir/_catalog"
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(0 until 100).repartition(3), 0L)
    // routine maintenance: 3 files -> 1; the rewrite has NO bloom
    VersionedTable.compact(spark, base, targetBytes = Long.MaxValue / 4)
    assert(VersionedTable.filesOf(spark, base).size == 1)
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(100 until 150).coalesce(1), 1L)
    // the compacted history file must NOT have been stamped with batch
    // 1's bloom (it holds ids 0..99, none of which are in that bloom)
    val owed = VersionedTable.unbloomedFiles(spark, base, "event_id")
    assert(owed.nonEmpty,
      "the compaction rewrite must remain bloom-less, not mis-bloomed")
    // at-least-once re-delivery of the OLD span under a fresh batch id:
    // the probe must still find the duplicates (bloom-less files always
    // survive pruning) and refuse them
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(0 until 100).coalesce(1), 2L)
    val ids = TxnCatalog.read(spark, cat, "base")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 150L),
      "re-delivered old span must be absorbed despite the compaction")
  }

  test("txn-MV dedup probe scans only bloom-relevant files of the pinned base") {
    // the 100 TB posture: each micro-batch's duplicate probe must be
    // O(batch-relevant files), never a full-ledger scan — proven here by
    // the candidate set excluding files whose blooms cannot hold any
    // batch key, while the end state stays exactly-once correct
    import graft.streaming.EventsStream
    val dir = freshDir()
    val base = s"$dir/base"; val mv = s"$dir/mv"; val cat = s"$dir/_catalog"
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(0 until 100).coalesce(1), 0L)
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(100 until 200).coalesce(1), 1L)
    val snap = TxnCatalog.snapshot(spark, cat)
    val (_, vPin) = snap.tables("base")
    val files = VersionedTable.filesOf(spark, base, Some(vPin))
    assert(files.size >= 2)
    // a third batch re-delivering batch 1's span probes the pinned base:
    // batch-0's file holds none of its keys and must be pruned away
    val cand = VersionedTable.bloomCandidateFiles(spark, base, "event_id",
      eventsDf(100 until 200).select(col("event_id").cast("string")),
      Some(vPin)).toSet
    import spark.implicits._
    val keysOf: Map[String, Set[Long]] = files.map(f =>
      f -> VersionedTable.readSubset(spark, base, Seq(f), Some(vPin))
        .select("event_id").as[Long].collect().toSet).toMap
    val probe = (100L until 200L).toSet
    keysOf.foreach { case (f, ks) =>
      if ((ks & probe).nonEmpty) assert(cand.contains(f), s"$f wrongly pruned")
      else assert(!cand.contains(f),
        s"bloom-irrelevant file $f must be excluded from the probe")
    }
    // and the duplicate re-delivery stays invisible end-to-end
    EventsStream.applyTxnMvBatch(spark, base, mv, cat,
      eventsDf(100 until 200).coalesce(1), 2L)
    val ids = TxnCatalog.read(spark, cat, "base")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 200L), "re-delivered batch must be fully absorbed")
  }

  test("two disjoint streaming pipelines race ONE catalog: every txn lands via rebase, no torn read at any txn") {
    // The symmetric multi-writer case: pipeline A (base_a, mv_a) and
    // pipeline B (base_b, mv_b) each publish base+MV txns into the SAME
    // catalog, concurrently. Their update sets are disjoint, so every
    // claim loss must REBASE (carrying the winner's pins), never
    // conflict — and at every committed txn, each pipeline present must
    // be internally consistent (its MV equals its pinned base's rollup):
    // the q189 atomicity invariant, now under genuine catalog races.
    import graft.streaming.EventsStream
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    def run(tag: String, offset: Int): Future[Unit] = Future {
      (0 until 3).foreach { k =>
        EventsStream.applyTxnMvBatch(spark,
          s"$dir/base_$tag", s"$dir/mv_$tag", cat,
          eventsDf(offset + k * 40 until offset + (k + 1) * 40), k.toLong,
          baseName = s"base_$tag", mvName = s"mv_$tag")
      }
    }
    Await.result(Future.sequence(Seq(run("a", 0), run("b", 1000))), 300.seconds)
    val ts = TxnCatalog.txns(spark, cat)
    assert(ts.size == 6, s"all six txns land (disjoint races rebase): $ts")
    for (t <- ts; tag <- Seq("a", "b")) {
      val snap = TxnCatalog.snapshot(spark, cat, Some(t))
      if (snap.tables.contains(s"base_$tag")) {
        assert(snap.tables.contains(s"mv_$tag"),
          s"txn $t pins base_$tag without mv_$tag — a torn pipeline")
        val base = TxnCatalog.read(spark, cat, s"base_$tag", Some(t))
        val expect = base.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).as("sv"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDecimal(2).stripTrailingZeros)).toSet
        val got = TxnCatalog.read(spark, cat, s"mv_$tag", Some(t))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDecimal(2).stripTrailingZeros)).toSet
        assert(got == expect, s"txn $t: mv_$tag must equal base_$tag's rollup")
      }
    }
    // final state: both pipelines complete, exactly once each
    assert(TxnCatalog.read(spark, cat, "base_a").count() == 120)
    assert(TxnCatalog.read(spark, cat, "base_b").count() == 120)
  }

  test("GC race closed: .txnpin markers are registered BEFORE any claim attempt") {
    // The hazard: a txn that wins the catalog claim but crashes before
    // registering its GC back-reference leaves a published txn whose
    // pinned table versions a concurrent table-level expire can delete.
    // The contract is therefore register-FIRST: by the time commit does
    // anything that could publish (or even read the catalog), the
    // marker must already exist. Proven deterministically by a commit
    // that dies at its earliest possible later point — the expectedTxn
    // entry check — and still left the marker behind.
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(1)), n => s"$dir/$n")
    val vb = VersionedTable.create(spark, s"$dir/b", df(10))
    def pinMarkers(root: String): Seq[String] = {
      val d = new java.io.File(root)
      if (!d.exists) Seq.empty
      else d.listFiles.flatMap { sub =>
        Option(sub.listFiles).getOrElse(Array.empty[java.io.File]) :+ sub
      }.map(_.getName).filter(_.startsWith(".txnpin-")).toSeq
    }
    assert(pinMarkers(s"$dir/b").isEmpty, "fresh table has no marker yet")
    intercept[TxnCatalog.ConcurrentTxnException] {
      TxnCatalog.commit(spark, cat, Map("b" -> (s"$dir/b", vb)),
        expectedTxn = Some(999)) // dies before any claim
    }
    assert(pinMarkers(s"$dir/b").nonEmpty,
      "marker must exist even though the txn never published — " +
        "registration precedes the claim, closing the expire window")
    // and the marker-without-txn is benign: table expire still works and
    // the catalog never saw table b
    assert(!TxnCatalog.snapshot(spark, cat).tables.contains("b"))
  }

  test("expectedTxn loser to a DISJOINT claim-time winner rebases (not a spurious CAS failure)") {
    // Interleaving: caller verifies expectedTxn=1 at entry, then a
    // disjoint txn (table c) claims t2 at the exact claim point (the
    // onBeforeClaim seam). The caller's precondition held when checked,
    // so per the scaladoc it must REBASE onto the disjoint winner and
    // land as t3 — re-throwing ConcurrentTxnException here was the
    // doc/code disagreement this spec pins.
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(1)), n => s"$dir/$n")
    val vb = VersionedTable.create(spark, s"$dir/b", df(10))
    val vc = VersionedTable.create(spark, s"$dir/c", df(100))
    var injected = false
    val got = TxnCatalog.commit(spark, cat, Map("b" -> (s"$dir/b", vb)),
      expectedTxn = Some(1),
      onBeforeClaim = { _ =>
        if (!injected) {
          injected = true
          TxnCatalog.commit(spark, cat, Map("c" -> (s"$dir/c", vc)))
        }
      })
    assert(got == 3, s"loser rebases over the disjoint winner, got txn $got")
    val snap = TxnCatalog.snapshot(spark, cat)
    assert(snap.tables.keySet == Set("a", "b", "c"),
      "rebase carries the winner's pins AND lands the loser's update")
    assert(idsOf(TxnCatalog.read(spark, cat, "b")) == Seq(10L))
    assert(idsOf(TxnCatalog.read(spark, cat, "c")) == Seq(100L))
  }

  test("expectedTxn loser to an OVERLAPPING claim-time winner still conflicts") {
    val dir = freshDir()
    val cat = s"$dir/_catalog"
    TxnCatalog.commitTables(spark, cat, Seq("a" -> df(1)), n => s"$dir/$n")
    val va2 = VersionedTable.overwrite(spark, s"$dir/a", df(2))
    val va3 = VersionedTable.overwrite(spark, s"$dir/a", df(3))
    var injected = false
    intercept[TxnCatalog.ConcurrentTxnException] {
      TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", va2)),
        expectedTxn = Some(1),
        onBeforeClaim = { _ =>
          if (!injected) {
            injected = true
            TxnCatalog.commit(spark, cat, Map("a" -> (s"$dir/a", va3)))
          }
        })
    }
    // the winner's pin survives untouched
    assert(idsOf(TxnCatalog.read(spark, cat, "a")) == Seq(3L))
  }
}
