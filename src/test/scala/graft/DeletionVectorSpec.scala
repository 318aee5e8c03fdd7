package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Merge-on-read deletes (deletion vectors): [[VersionedTable
  * .deleteWhereVectored]] commits row-position sidecars instead of
  * rewriting files. Contract under test: no data file moves, reads hide
  * exactly the deleted rows (NULL predicates keep theirs), re-deletes
  * merge into one vector, every copy-on-write rewrite MATERIALIZES the
  * vector, CDC sees vector deltas as removed rows, time travel pins each
  * version's own sidecars, expire GCs only unreferenced sidecars, clones
  * carry vectors by reference, and the streaming source refuses a
  * vectored delete as the row-removal it is. */
class DeletionVectorSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dv").resolve("t").toString

  /** Single-file frames: rewrite-vs-carry assertions are per FILE, so the
    * fixture pins one data file per commit to stay deterministic (a DV on
    * a file a rewrite never touches rightly survives it). */
  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10).coalesce(1)
  }

  private def idsOf(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
    frame.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("partitioned table: positions attach to the right file despite colliding basenames") {
    // one write job emits part-00000-<uuid> under EVERY k=v dir — file
    // NAMES collide across partition directories. A name-keyed position
    // map merged those files' vectors (rows deleted from the wrong file,
    // others silently surviving); attribution must go through the full
    // path → manifest-entry resolution.
    import spark.implicits._
    val root = freshRoot()
    val d = (0L until 120L).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 2).cast("string")))
    VersionedTable.create(spark, root, d, partitionBy = Seq("src"))
    val names = VersionedTable.filesOf(spark, root)
      .map(f => f.substring(f.lastIndexOf('/') + 1))
    assert(names.distinct.size < names.size,
      "fixture must actually collide basenames across partition dirs")
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (None, Some(19L))), col("id") < 20L)
    // every id < 20 gone from BOTH partitions, everything else intact
    assert(idsOf(VersionedTable.read(spark, root)) == (20L until 120L).toSeq)
    // per-file cardinalities sum to exactly the deleted rows
    val cards = VersionedTable.metaFiles(spark, root).map(_.dvCard)
    assert(cards.sum == 20L)
    assert(VersionedTable.metaRowCount(spark, root).contains(100L))
  }

  test("vectored delete hides rows without moving a single data file") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    val before = VersionedTable.filesOf(spark, root)
    val v = VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(6L))), col("id").between(3, 6))
    assert(v == 2)
    // the file SET is byte-identical — only the manifest gained vectors
    assert(VersionedTable.filesOf(spark, root) == before)
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 7L, 8L, 9L, 10L))
    // time travel reads the pre-delete rows through version 1
    assert(idsOf(VersionedTable.read(spark, root, Some(1))) == (1L to 10L))
    // the vector's cardinality is recorded in the manifest
    assert(VersionedTable.dvRefs(spark, root).values.map(_._2).sum == 4L)
  }

  test("a second overlapping vectored delete merges into ONE vector per file") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(6L))), col("id").between(3, 6)) // v2
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(5L), Some(8L))), col("id").between(5, 8)) // v3
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 9L, 10L))
    // merged positions: 3..8 = 6 deleted rows, one vector per file
    val refs = VersionedTable.dvRefs(spark, root)
    assert(refs.values.map(_._2).sum == 6L)
    // each intermediate version still reads ITS OWN vector (immutable
    // sidecars — no special-casing for time travel)
    assert(idsOf(VersionedTable.read(spark, root, Some(2))) ==
      Seq(1L, 2L, 7L, 8L, 9L, 10L))
    assert(idsOf(VersionedTable.read(spark, root, Some(1))) == (1L to 10L))
  }

  test("vectored delete keeps rows where the predicate is NULL (SQL DELETE semantics)") {
    val root = freshRoot()
    import spark.implicits._
    val data = Seq[(Long, Option[Long])](
      (1L, Some(1L)), (2L, None), (3L, Some(3L)), (4L, None), (5L, Some(5L)))
      .toDF("id", "grade")
    VersionedTable.create(spark, root, data)
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("grade") > 2) // NULL > 2 is NULL, not TRUE: rows 2 and 4 survive
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 2L, 4L))
  }

  test("filtered and point reads apply vectors; stats pruning stays sound") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))
    VersionedTable.append(spark, root, df(10, 11, 12))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(11L), Some(11L))), col("id") === 11)
    // range read over the second file's span hides the vectored row
    assert(idsOf(VersionedTable.readWhere(spark, root,
      Map("id" -> (Some(10L), Some(12L))))) == Seq(10L, 12L))
    // a predicate whose matches are ALL deleted opens the file (stats are
    // conservative over-approximations) and correctly returns nothing
    assert(VersionedTable.readWhere(spark, root,
      Map("id" -> (Some(11L), Some(11L)))).filter(col("id") === 11).count() == 0)
  }

  test("mergeInto and compactWhere MATERIALIZE the vector; the rewrite drops it") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 8L: _*))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(3L))), col("id").between(2, 3))
    // merge touching the vectored file: survivors only are carried over
    VersionedTable.mergeInto(spark, root,
      df(5).withColumn("payload", lit(555L)), Seq("id"))
    assert(VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq ==
      Seq(1L -> 10L, 4L -> 40L, 5L -> 555L, 6L -> 60L, 7L -> 70L, 8L -> 80L))
    // the rewritten file's vector is gone from the head manifest
    assert(VersionedTable.dvRefs(spark, root).isEmpty)

    val root2 = freshRoot()
    VersionedTable.create(spark, root2, df(1L to 8L: _*))
    VersionedTable.deleteWhereVectored(spark, root2,
      Map("id" -> (Some(2L), Some(3L))), col("id").between(2, 3))
    // compactWhere over the vectored span: a single touched file still
    // rewrites BECAUSE it carries a vector (materialization is the point)
    VersionedTable.compactWhere(spark, root2, Map("id" -> (Some(1L), Some(8L))))
    assert(idsOf(VersionedTable.read(spark, root2)) ==
      Seq(1L, 4L, 5L, 6L, 7L, 8L))
    assert(VersionedTable.dvRefs(spark, root2).isEmpty,
      "compaction must materialize and drop the vector")
  }

  test("changesBetween reports vector deltas as removed rows; rollback re-adds them") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))           // v1
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(4L))), col("id").between(2, 4))  // v2
    val (add12, rem12) = VersionedTable.changesBetween(spark, root, 1, 2)
    assert(add12.count() == 0)
    assert(idsOf(rem12) == Seq(2L, 3L, 4L))
    // rollback to v1 releases the vector: CDC sees the rows come BACK
    VersionedTable.rollback(spark, root, to = 1)                   // v3
    val (add23, rem23) = VersionedTable.changesBetween(spark, root, 2, 3)
    assert(idsOf(add23) == Seq(2L, 3L, 4L))
    assert(rem23.count() == 0)
  }

  test("changesBetween survives an expired intermediate manifest (falls back to the scan)") {
    // expire can drop versions BETWEEN a txn-pinned fromV and the kept
    // tail; the monotone-growth shortcut walks those manifests to prove
    // "no rollback in range", and an unreadable one must forfeit the
    // shortcut (scan both sides), never fail the CDC batch.
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))           // v1
    VersionedTable.append(spark, root, df(7, 8))                   // v2
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(3L))), col("id").between(2, 3))  // v3
    // simulate retention dropping the intermediate v2 manifest while
    // v1 survives under a txn pin
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_log", "v00000002.manifest.json"))
    val (add13, rem13) = VersionedTable.changesBetween(spark, root, 1, 3)
    assert(idsOf(add13) == Seq(7L, 8L),
      "the appended file's rows still surface as adds across the hole")
    assert(idsOf(rem13) == Seq(2L, 3L),
      "the vectored delete still surfaces as removes across the hole")
  }

  test("append after a vectored delete carries the vector; new file unaffected") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)
    VersionedTable.append(spark, root, df(7, 8))
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 3L, 7L, 8L))
    assert(VersionedTable.dvRefs(spark, root).size == 1)
  }

  test("vectored delete on a hive-partitioned table") {
    val root = freshRoot()
    import spark.implicits._
    val data = (1L to 12L).map(i => (i, i % 3)).toDF("id", "bucket")
    VersionedTable.create(spark, root, data, partitionBy = Seq("bucket"))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("bucket" -> (Some(1L), Some(1L))),
      col("bucket") === 1 && col("id") <= 7)
    // bucket 1 holds 1,4,7,10 — ids <= 7 of it vanish, partitions intact
    assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(2L, 3L, 5L, 6L, 8L, 9L, 10L, 11L, 12L))
    // the partition column still resolves on the DV'd read path
    assert(VersionedTable.read(spark, root)
      .filter(col("bucket") === 1).count() == 1) // only id=10 left
  }

  test("expire GCs sidecars no surviving version references, keeps live ones") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 6L: _*))           // v1
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)          // v2
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(4L), Some(4L))), col("id") === 4)          // v3
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dvDir = new org.apache.hadoop.fs.Path(root, "dv")
    assert(fs.listStatus(dvDir).length == 2, "one sidecar per delete commit")
    // keep only v3: v2's sidecar is unreferenced and must go; v3's stays
    VersionedTable.expire(spark, root, keepLast = 1)
    val left = fs.listStatus(dvDir).map(_.getPath.getName).toSeq
    assert(left.length == 1 && left.head.startsWith("dv-v3-"),
      s"expected only v3's sidecar, got $left")
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 3L, 5L, 6L))
  }

  test("shallow clone carries vectors by reference; source expire keeps them alive") {
    val src = freshRoot()
    val dst = freshRoot()
    VersionedTable.create(spark, src, df(1L to 6L: _*))
    VersionedTable.deleteWhereVectored(spark, src,
      Map("id" -> (Some(3L), Some(4L))), col("id").between(3, 4))
    VersionedTable.cloneShallow(spark, src, dst)
    assert(idsOf(VersionedTable.read(spark, dst)) == Seq(1L, 2L, 5L, 6L))
    // source moves on and expires history — the clone's referenced
    // sidecar (and data) survive through the registered back-reference
    VersionedTable.overwrite(spark, src, df(99))
    VersionedTable.expire(spark, src, keepLast = 1)
    assert(idsOf(VersionedTable.read(spark, dst)) == Seq(1L, 2L, 5L, 6L))
  }

  test("the streaming source refuses a vectored delete as a row removal") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))
    val ckpt = Files.createTempDirectory("dv_ckpt").toString
    val out = Files.createTempDirectory("dv_out").toString
    def drain(opts: Map[String, String], ck: String, o: String): Seq[Long] = {
      val reader = spark.readStream.format("graft-versioned")
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load(root)
        .writeStream.outputMode("append").format("parquet").option("path", o)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(o).select("id").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(drain(Map.empty, ckpt, out) == Seq(1L, 2L, 3L))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(Map.empty, ckpt, out)
    }
    assert(e.getMessage.contains("deletion vectors"),
      s"expected the DV guard, got: ${e.getMessage}")
    // ignoreChanges continues (removed rows are not re-delivered); a
    // later append still arrives
    VersionedTable.append(spark, root, df(9))
    assert(drain(Map("ignoreChanges" -> "true"), ckpt, out) ==
      Seq(1L, 2L, 3L, 9L))
    // a FRESH stream's initial snapshot applies the vector
    val ckpt2 = Files.createTempDirectory("dv_ckpt2").toString
    val out2 = Files.createTempDirectory("dv_out2").toString
    assert(drain(Map.empty, ckpt2, out2) == Seq(1L, 3L, 9L))
  }

  test("mergeIntoVectored equals the CoW merge without touching a target file") {
    def seed(root: String): Unit = {
      VersionedTable.create(spark, root, df(1L to 6L: _*))
      VersionedTable.append(spark, root, df(7L to 9L: _*))
    }
    import spark.implicits._
    val src = Seq((2L, 222L), (5L, 555L), (20L, 200L))
      .toDF("id", "payload").coalesce(1) // upserts 2,5; inserts 20
    val dels = Seq(8L).toDF("id")
    val cow = freshRoot(); seed(cow)
    VersionedTable.mergeInto(spark, cow, src, Seq("id"), Some(dels))
    val mor = freshRoot(); seed(mor)
    val before = VersionedTable.filesOf(spark, mor)
    VersionedTable.mergeIntoVectored(spark, mor, src, Seq("id"), Some(dels))
    def rows(r: String) = VersionedTable.read(spark, r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(rows(mor) == rows(cow))
    // every pre-merge file still stands; only the source's file was added
    val after = VersionedTable.filesOf(spark, mor)
    assert(before.forall(after.contains))
    assert((after.toSet -- before).size == 1)
    // matched + deleted rows are vectored: 2, 5 (file 1) and 8 (file 2)
    assert(VersionedTable.dvRefs(spark, mor).values.map(_._2).sum == 3L)
    // time travel: pre-merge snapshot unaffected
    assert(idsOf(VersionedTable.read(spark, mor, Some(2))) == (1L to 9L))
  }

  test("mergeIntoVectored is idempotent per transaction id") {
    val root = freshRoot()
    import spark.implicits._
    VersionedTable.create(spark, root, df(1, 2, 3))
    val src = Seq((2L, 222L)).toDF("id", "payload").coalesce(1)
    val v1 = VersionedTable.mergeIntoVectored(spark, root, src, Seq("id"),
      txn = Some(42L))
    val v2 = VersionedTable.mergeIntoVectored(spark, root, src, Seq("id"),
      txn = Some(42L)) // replay: refused
    assert(v2 == v1)
    assert(VersionedTable.read(spark, root).filter(col("id") === 2)
      .collect().map(_.getLong(1)).toSeq == Seq(222L))
  }

  test("vector-free files plan WITHOUT the DV filter; vectored reads keep codegen") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    // no vectors yet: the read plans on the unchanged scan path — the
    // zero-overhead claim, pinned at plan level
    val clean = VersionedTable.read(spark, root)
    clean.collect()
    val cleanPlan = clean.queryExecution.executedPlan.toString
    assert(!cleanPlan.toLowerCase.contains("dvdeleted"),
      "a vector-free snapshot must not carry the DV membership filter")
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(6L))), col("id").between(3, 6))
    val dvd = VersionedTable.read(spark, root)
    dvd.collect()
    val plan = dvd.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.toLowerCase.contains("dvdeleted"),
      "the vectored file's scan must filter through DvDeletedExpr")
    // the filter stays inside a whole-stage-codegen span (DvDeletedExpr
    // implements doGenCode; a fallback would break the span)
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.toLowerCase.contains("dvdeleted") => w
    }
    assert(inCodegen.nonEmpty, s"DV filter fell out of codegen:\n$planStr")
  }

  test("a catalog-pinned version keeps its vector sidecar through table expire") {
    import graft.sink.TxnCatalog
    val dir = Files.createTempDirectory("graft_dvpin")
    val root = dir.resolve("t").toString
    val cat = dir.resolve("_cat").toString
    VersionedTable.create(spark, root, df(1L to 6L: _*))       // v1
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(3L))), col("id").between(2, 3)) // v2 + dv
    TxnCatalog.commit(spark, cat, Map("t" -> (root, 2)))       // pin v2
    VersionedTable.overwrite(spark, root, df(9))               // v3
    VersionedTable.overwrite(spark, root, df(10))              // v4
    VersionedTable.expire(spark, root, keepLast = 1)
    // the pinned snapshot — vector included — still reads exactly
    assert(idsOf(TxnCatalog.read(spark, cat, "t")) == Seq(1L, 4L, 5L, 6L))
  }

  test("DvDeletedExpr compiles under forced codegen (no silent fallback)") {
    // a doGenCode bug would normally degrade to interpreted eval with only
    // a log line — CODEGEN_ONLY + fallback=false turns it into a failure
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(6L))), col("id").between(3, 6))
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(idsOf(VersionedTable.read(spark, root)) ==
      Seq(1L, 2L, 7L, 8L, 9L, 10L))
    finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("the SQL face hides vectored rows through its pushed-filter scan") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 10L: _*))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L), Some(6L))), col("id").between(3, 6))
    spark.sql("DROP TABLE IF EXISTS dv_sql_face")
    spark.sql(s"CREATE TABLE dv_sql_face USING `graft-versioned` " +
      s"OPTIONS (path '$root')")
    try {
      val got = spark.sql("SELECT id FROM dv_sql_face WHERE id >= 2")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(2L, 7L, 8L, 9L, 10L))
    } finally spark.sql("DROP TABLE IF EXISTS dv_sql_face")
  }

  test("vectored then CoW delete on the SAME file: the rewrite folds the vector in") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L to 9L: _*))
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(3L))), col("id").between(2, 3))
    VersionedTable.deleteWhere(spark, root,
      Map("id" -> (Some(7L), Some(9L))), col("id") >= 7)
    assert(idsOf(VersionedTable.read(spark, root)) == Seq(1L, 4L, 5L, 6L))
    assert(VersionedTable.dvRefs(spark, root).isEmpty,
      "the CoW rewrite must materialize and drop the vector")
  }

  test("wide scattered delete: the driver collects per-file metadata, never positions") {
    // the 100 TB contract of the merge-on-read write path: a delete whose
    // matches scatter across every file must land O(files) rows on the
    // driver — the position sets group, merge and serialize to sidecars
    // ENTIRELY on the executors. 50k deleted positions here; the pinned
    // driver-side result is ≤ one row per touched file.
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (0L until 100000L).toDF("id").withColumn("payload", col("id") * 3)
        .repartition(8))
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("id") % 2 === 0)
    val files = VersionedTable.filesOf(spark, root)
    assert(VersionedTable.lastDmlPassCollected >= 1 &&
      VersionedTable.lastDmlPassCollected <= files.size,
      s"driver collected ${VersionedTable.lastDmlPassCollected} rows for " +
        s"${files.size} files — positions must not transit the driver")
    // and the delete is exactly right: 50k survivors, all odd
    val survivors = VersionedTable.read(spark, root)
    assert(survivors.count() == 50000L)
    assert(survivors.agg(min("id"), max("id")).collect().head ==
      org.apache.spark.sql.Row(1L, 99999L))
    assert(survivors.filter(col("id") % 2 === 0).count() == 0L)
    // a second scattered delete merges executor-side too (prior vector
    // read + union inside the task) and stays file-bounded
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("id") % 3 === 0)
    assert(VersionedTable.lastDmlPassCollected <= files.size)
    assert(idsOf(VersionedTable.read(spark, root)) ==
      (0L until 100000L).filter(i => i % 2 != 0 && i % 3 != 0))
  }

  test("updateWhereVectored: old-row SET semantics, no rewrites, time travel") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 12L).toDF("id").withColumn("a", col("id") * 10)
        .withColumn("b", col("id") * 100).repartition(2))
    val filesBefore = VersionedTable.filesOf(spark, root).toSet
    // SET a = b, b = a must SWAP (every right-hand side sees the OLD
    // row) — chained withColumn semantics would set both to the old b
    VersionedTable.updateWhereVectored(spark, root, Map.empty,
      col("id") % 3 === 0, Map("a" -> col("b"), "b" -> col("a")))
    assert(filesBefore.subsetOf(VersionedTable.filesOf(spark, root).toSet),
      "an MoR update must carry every pre-update file by name")
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to 12L).foreach { i =>
      if (i % 3 == 0) assert(got(i) == ((i * 100, i * 10)), s"row $i swapped")
      else assert(got(i) == ((i * 10, i * 100)), s"row $i untouched")
    }
    assert(got.size == 12, "update replaces, never duplicates or drops")
    // a NULL condition keeps the row (SQL semantics)
    VersionedTable.updateWhereVectored(spark, root, Map.empty,
      org.apache.spark.sql.functions.when(col("id") === 1, true),
      Map("a" -> (col("a") + 1)))
    assert(VersionedTable.read(spark, root).count() == 12)
    // time travel reads the pre-update data
    val v1 = VersionedTable.read(spark, root, Some(1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1(3L) == 30L, "version 1 must still show the pre-update value")
    // refused shapes
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhereVectored(spark, root, Map.empty,
        col("id") === 1, Map.empty)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhereVectored(spark, root, Map.empty,
        col("id") === 1, Map("nope" -> col("a")))
    }
    // a nondeterministic condition would mark different rows in the two
    // halves (and a cache-evicted recompute could diverge even within
    // one) — refused, and the check must see through the UNRESOLVED
    // expr() face the SQL procedure hands over
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhereVectored(spark, root, Map.empty,
        org.apache.spark.sql.functions.expr("rand() < 0.5"),
        Map("a" -> col("a")))
    }
  }

  test("a vectored delete on a timestamp table survives survivor-sum overflow (ANSI)") {
    import spark.implicits._
    val root = freshRoot()
    // the survivors' canonical-micros total exceeds Long.MaxValue: the
    // refresh pass's sum must be try_sum — a plain sum ABORTS the whole
    // DML under ANSI (exactly how q201 first failed at sf0.1, where
    // ~25k rows of 2024 timestamps cross 2^63) — and must never store
    // a wrapped value under legacy either
    val d = (0L until 200L).toDF("id")
      .withColumn("ts", timestamp_micros(lit(90000000000000000L) + col("id")))
      .coalesce(1)
    VersionedTable.create(spark, root, d)
    VersionedTable.deleteWhereVectored(spark, root, Map.empty, col("id") < 10)
    assert(idsOf2(VersionedTable.read(spark, root)) == (10L until 200L))
    val stats = VersionedTable.metaFiles(spark, root).head.stats
    assert(stats("ts").live && stats("ts").sum.isEmpty)
    // the integral column's total fits — its refreshed sum survives
    assert(stats("id").sum.contains((10L until 200L).sum))
  }

  private def idsOf2(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
    frame.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("vectored DMLs refresh touched files' stats to survivor-exact LIVE entries") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (0L until 1000L).toDF("id")
        .withColumn("v", when(col("id") % 5 =!= 0, col("id"))) // 1/5 null
        .coalesce(1))
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("id") < 100L || col("id") >= 900L)
    val fm = VersionedTable.metaFiles(spark, root).head
    assert(fm.dvCard == 200L)
    val idStat = fm.stats("id")
    assert(idStat.live, "a vectored delete must re-derive live stats")
    assert(idStat.lo == "100" && idStat.hi == "899" && idStat.nulls == 0L)
    val vStat = fm.stats("v")
    // survivors 100..899: nulls at multiples of 5 → 160
    assert(vStat.live && vStat.nulls == 160L)
    assert(vStat.lo == "101" && vStat.hi == "899")
    // the refreshed bounds are tighter pruning ranges: a range that only
    // matched deleted rows now prunes the file outright
    assert(VersionedTable.prunedFiles(spark, root,
      Map("id" -> (Some(0L), Some(50L)))).isEmpty)
    // time travel: the pre-delete manifest still carries the raw stats
    val fm1 = VersionedTable.metaFiles(spark, root, Some(1)).head
    assert(!fm1.stats("id").live && fm1.stats("id").lo == "0")
  }
}
