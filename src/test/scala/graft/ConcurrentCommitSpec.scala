package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** The disjoint-file conflict taxonomy: non-append writers (vectored
  * DMLs, CoW DMLs, compact, zorder) losing the version CAS REBASE
  * across interleaved commits whose file footprints are disjoint, and
  * refuse (ConcurrentModificationException) a genuine overlap or a
  * schema change. Races land deterministically through
  * [[VersionedTable.raceBeforePublish]] — the seam fires after the
  * writer resolved its base snapshot, inside the CAS window.
  * Semantics under test are snapshot-at-read (the WriteSerializable
  * shape Delta documents): rows a racing append commits are NOT
  * subject to the rebased DML's predicate. */
class ConcurrentCommitSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ccc").resolve("t").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10).coalesce(1)
  }

  private def idsOf(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
    frame.select("id").collect().map(_.getLong(0)).sorted.toSeq

  override def afterEach(): Unit = {
    VersionedTable.raceBeforePublish = () => () // never leak a hook
    super.afterEach()
  }

  test("an append racing a vectored delete: BOTH commit (disjoint rebase)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))          // v1
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(100, 3))        // v2 races in
    val v = VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(4L))), col("id").between(2, 4)) // rebases to v3
    assert(v == 3, s"the delete must land ON TOP of the racing append, got v$v")
    // snapshot-at-read: id=3 from the RACING append survives even though
    // it matches the delete predicate — the DML serialized before the
    // append it rebased across
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 3L, 5L, 6L, 100L))
    val ops = VersionedTable.describeHistory(spark, root)
      .select("version", "op").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(ops(2) == "append" && ops(3) == "delete-vectored",
      s"history shows both commits in order, got $ops")
  }

  test("two vectored deletes on DISJOINT files: both commit") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // v1: file A
    VersionedTable.append(spark, root, df(10, 11, 12))            // v2: file B
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(11L), Some(11L))), col("id") === 11)    // v3 on file B
    val v = VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)         // rebases: file A
    assert(v == 4)
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 3L, 10L, 12L),
      "both deletes' effects survive — neither vector clobbered the other")
  }

  test("the rebase walks MULTIPLE interleaved commits, all disjoint") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))          // v1
    VersionedTable.raceBeforePublish = () => {
      VersionedTable.append(spark, root, df(100))                 // v2
      VersionedTable.append(spark, root, df(200, 3))              // v3
    }
    val v = VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(4L))), col("id").between(3, 4))
    assert(v == 4, s"the delete must rebase over BOTH appends, got v$v")
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 2L, 3L, 5L, 6L, 100L, 200L),
      "both raced appends survive — including the id=3 copy inside the " +
        "delete's own predicate range (snapshot-at-read)")
  }

  test("overlapping writers refuse: a rewrite racing a vectored delete on the same file") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))          // v1, one file
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.deleteWhere(spark, root,
        Map("id" -> (Some(6L), Some(6L))), col("id") === 6)       // CoW rewrite of THE file
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(2L), Some(2L))), col("id") === 2)
    }
    assert(e.getMessage.contains("conflicts with a concurrent commit"),
      s"got: ${e.getMessage}")
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 3L, 4L, 5L),
      "the racer's commit stands; the refused DML changed nothing")
  }

  test("two vectored deletes re-vectoring the SAME file refuse (no lost positions)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))          // v1, one file
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(5L), Some(5L))), col("id") === 5)
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(2L), Some(2L))), col("id") === 2)
    }
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 2L, 3L, 4L, 6L),
      "the winner's vector stands untouched — a blind rebase would have " +
        "restored id=5 when merging the loser's base vector")
  }

  test("compact rebases across a racing append; the appended file carries over") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))                     // v1
    VersionedTable.append(spark, root, df(2))                     // v2
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(3))             // v3 races in
    val v = VersionedTable.compact(spark, root, targetBytes = 1L << 30)
    assert(v == 4, "compaction lands on top of the racing append")
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 3L),
      "no appended row lost to the rewrite")
    val compacted = VersionedTable.filesOf(spark, root)
    assert(compacted.size == 2,
      s"one compacted output + the un-compacted raced append, got $compacted")
  }

  test("schema DDLs re-apply over racing commits (evolve without quiescing ingest)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(3))             // v2 races in
    val v = VersionedTable.addColumn(spark, root, "score", "double")
    assert(v == 3, s"addColumn must re-apply on top of the append, got v$v")
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "payload", "score"))
    assert(got.count() == 3, "the raced append's rows are all there")
    // rename racing an append: same re-apply; the appended file (written
    // pre-rename under the then-current name) still resolves
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root,
        df(4).withColumn("score", lit(0.5)))                      // races in
    val v2 = VersionedTable.renameColumn(spark, root, "payload", "amount")
    assert(v2 == 5)
    assert(VersionedTable.read(spark, root)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L))
    // a SEMANTIC race still fails with the semantic error: the column
    // this rename wants was renamed away by the racer
    VersionedTable.raceBeforePublish =
      () => VersionedTable.renameColumn(spark, root, "amount", "total")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "amount", "value2")
    }
    assert(e.getMessage.contains("no column amount"), e.getMessage)
    assert(VersionedTable.schemaOf(spark, root).fieldNames.contains("total"),
      "the racing rename stands")
  }

  test("rollback re-applies over a racing append (undoing it is what rollback means)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.append(spark, root, df(3))                     // v2
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(99))            // v3 races in
    val v = VersionedTable.rollback(spark, root, to = 1)
    assert(v == 4)
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L),
      "rollback publishes v1's exact content over the raced head")
    assert(idsOf(VersionedTable.read(spark, root, Some(3))) ==
      Seq(1L, 2L, 3L, 99L), "the raced append stays in history")
  }

  test("an append racing a SHAPE-IDENTICAL replace refuses (no old-incarnation carry-over)") {
    // CREATE OR REPLACE with the exact same DDL produces a manifest
    // whose schema/layout/props EQUAL the append's base — the
    // field-equality conflict checks all pass, and only the
    // unconditional op check stands between the old incarnation's rows
    // and the "fresh" table (Delta fails any txn concurrent with a
    // metadata-replacing commit)
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    val ddl = VersionedTable.schemaOf(spark, root).toDDL
    VersionedTable.raceBeforePublish =
      () => VersionedTable.replaceTable(spark, root, ddl)         // v2 races in
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedTable.append(spark, root, df(99))
    }
    assert(e.getMessage.contains("replaced the table incarnation"),
      e.getMessage)
    assert(VersionedTable.read(spark, root).count() == 0,
      "the replace stands; the staged append never lands in the new incarnation")
  }

  test("an append racing a rollback refuses (restored state must not absorb stale stages)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.append(spark, root, df(3))                     // v2
    VersionedTable.raceBeforePublish =
      () => VersionedTable.rollback(spark, root, to = 1)          // v3 races in
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedTable.append(spark, root, df(99))
    }
    assert(e.getMessage.contains("replaced the table incarnation"),
      e.getMessage)
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L),
      "the rollback stands untouched; the re-run appends cleanly")
    VersionedTable.append(spark, root, df(99))
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 99L))
  }

  test("a racing schema change refuses the DML (stale schema must not publish)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 4L: _*))          // v1
    VersionedTable.raceBeforePublish =
      () => VersionedTable.addColumn(spark, root, "score", "double")
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(2L), Some(2L))), col("id") === 2)
    }
    assert(VersionedTable.schemaOf(spark, root).fieldNames.contains("score"),
      "the schema change stands")
  }

  test("a txn append rebases across a racing vectored delete (streaming ingest + GDPR)") {
    // the advertised concurrent deployment (q189-style sink + q191-style
    // delete): the sink's micro-batch must not FAIL because maintenance
    // interleaved — the append's empty footprint rebases over the DML
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 5L: _*))          // v1
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(2L), Some(2L))), col("id") === 2)       // v2 races in
    val v = VersionedTable.appendTxn(spark, root, df(50), txn = 7L)
    assert(v == 3, s"the txn append must land on top of the delete, got v$v")
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 3L, 4L, 5L, 50L),
      "both the delete's effect and the appended batch survive")
    // the ledger carries the txn: replay is refused as applied
    assert(VersionedTable.appendTxn(spark, root, df(50), txn = 7L) == 3)
    assert(VersionedTable.read(spark, root).count() == 5)
  }

  test("a SAME-txn race short-circuits to the ledger (no double-apply)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))                     // v1
    // another replica lands txn 9 INSIDE our commit window: our retry
    // must recognize the interleaved commit's txn id and apply nothing
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.appendTxn(spark, root, df(60), txn = 9L)     // v2 races in
    val v = VersionedTable.appendTxn(spark, root, df(61), txn = 9L)
    assert(v == 2, s"the loser must adopt the winner's commit, got v$v")
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 60L),
      "exactly-once: the losing replica's batch must NOT double-apply")
  }

  test("index builds rebase across racing commits; stale entries drop, never refuse") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // v1: file A
    VersionedTable.append(spark, root, df(10, 11, 12))            // v2: file B
    // an append racing the sum index: the build rebases, its entries land
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(100))           // v3 races in
    val v = VersionedTable.indexSums(spark, root, Seq("id"))
    assert(v == 4, s"the index build must land on top of the append, got v$v")
    val withSums = VersionedTable.metaFiles(spark, root)
      .count(_.stats.get("id").exists(_.sum.isDefined))
    assert(withSums == 2, s"A and B carry sums; the raced file is simply " +
      s"un-indexed until the next only_missing pass (got $withSums)")
    // a vectored delete racing a bloom build RE-VECTORS file A: the
    // build still commits, A's now-stale bloom silently drops
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.deleteWhereVectored(spark, root,
        Map("id" -> (Some(2L), Some(2L))), col("id") === 2)       // v5 races in
    val v2 = VersionedTable.indexBloom(spark, root, Seq("id"))
    assert(v2 == 6)
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 3L, 10L, 11L, 12L, 100L),
      "the racing delete's effect stands under the index commit")
    val shapes = VersionedTable.bloomShapes(spark, root, "id")
    assert(!shapes.keys.exists(f => VersionedTable.dvRefs(spark, root)
      .contains(f)),
      "the re-vectored file's raw-scan bloom is stale and must be absent")
    assert(shapes.size >= 2, "un-raced files keep their fresh blooms")
  }

  test("full-taxonomy churn: appends, DMLs, index builds and DDLs race with REAL threads") {
    // the deterministic seam proves each pairwise rule; this proves the
    // composition under genuine thread interleaving. Actors: 3 txn
    // appenders (unique ids >= 1000), a vectored-delete loop on the
    // id < 100 range (disjoint from appends — snapshot semantics make
    // its outcome append-independent), an index maintainer, and one
    // schema widen. Any actor may refuse (ConcurrentModificationException
    // is a legal outcome under overlap/schema races) — the INVARIANTS
    // are: no exception of any other kind, a dense version sequence,
    // every version readable, and the final state = initial survivors
    // of the successful deletes ∪ every successful append, exactly once.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 50L: _*))
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val deleted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def tolerated[A](body: => A): Unit =
      try { body; () } catch {
        case _: java.util.ConcurrentModificationException => () // legal refusal
      }
    val appenders = (1 to 3).map { w =>
      Future {
        (1 to 4).foreach { k =>
          val id = 1000L * w + k
          tolerated {
            VersionedTable.appendTxn(spark, root, df(id), txn = id)
            appended.add(id)
          }
        }
      }
    }
    val deleter = Future {
      (1 to 3).foreach { k =>
        val target = 10L * k // 10, 20, 30
        tolerated {
          VersionedTable.deleteWhereVectored(spark, root,
            Map("id" -> (Some(target), Some(target))), col("id") === target)
          deleted.add(target)
        }
        Thread.sleep(15)
      }
    }
    val indexer = Future {
      (1 to 3).foreach { _ =>
        tolerated(VersionedTable.indexSums(spark, root, Seq("id"),
          onlyMissing = true))
        Thread.sleep(25)
      }
    }
    val ddl = Future {
      Thread.sleep(40)
      tolerated(VersionedTable.addColumn(spark, root, "note", "string"))
    }
    Await.result(Future.sequence(appenders :+ deleter :+ indexer :+ ddl),
      120.seconds)
    // versions are DENSE (the CAS can never skip or reuse a number)
    val vs = VersionedTable.history(spark, root).map(_._1).sorted
    assert(vs == (1 to vs.max), s"non-dense version sequence: $vs")
    // every version is a readable snapshot (no torn manifest ever landed)
    vs.foreach(v => VersionedTable.read(spark, root, Some(v)).count())
    // exactly-once content: initial ∪ successes, nothing lost or doubled
    import scala.jdk.CollectionConverters._
    val expected = ((1L to 50L).toSet -- deleted.asScala.toSet) ++
      appended.asScala.toSet
    assert(idsOf(VersionedTable.read(spark, root)) ==
      expected.toSeq.sorted,
      "final state must be exactly the successful operations' composition")
    assert(appended.size > 0, "some appends must have landed")
  }

  test("merge-on-read upsert rebases across a racing append") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // v1
    VersionedTable.raceBeforePublish =
      () => VersionedTable.append(spark, root, df(50))            // races in
    val src = df(2).withColumn("payload", lit(999L))
    val v = VersionedTable.mergeIntoVectored(spark, root, src, Seq("id"))
    assert(v == 3)
    val got = VersionedTable.read(spark, root)
    assert(idsOf(got) == Seq(1L, 2L, 3L, 50L))
    assert(got.filter(col("id") === 2).select("payload")
      .collect().head.getLong(0) == 999L, "the upsert applied")
  }
}
