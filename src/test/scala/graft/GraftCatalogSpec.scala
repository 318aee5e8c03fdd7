package graft

import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** The SQL maintenance face ([[graft.catalog.GraftCatalog]]): every
  * table-format operation as a plain `CALL graft.<proc>(...)` statement,
  * with Spark binding the arguments and the outcome returned as a result
  * set. */
class GraftCatalogSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cat").resolve("t").toString

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")

  private def idsOf(root: String): Seq[Long] =
    VersionedTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("delete_where / compact / rollback / history through CALL") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 20L).toDF("id").withColumn("payload", col("id") * 10)
        .repartition(2))
    // vectored DELETE through SQL — predicate is a plain SQL expression
    val v2 = spark.sql(
      s"CALL graft.delete_where('$root', 'id % 5 = 0', true)")
      .collect().head.getInt(0)
    assert(v2 == 2)
    assert(idsOf(root) == (1L to 20L).filterNot(_ % 5 == 0))
    // OPTIMIZE through SQL: one file, vectors materialized
    val v3 = spark.sql(s"CALL graft.compact('$root', ${Long.MaxValue / 4})")
      .collect().head.getInt(0)
    assert(v3 == 3)
    assert(VersionedTable.filesOf(spark, root).size == 1)
    // audit trail as a result set
    val hist = spark.sql(s"CALL graft.history('$root')")
      .select("version", "op", "n_live_rows", "n_deleted_rows")
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(hist(1) == (("create", 20L, 0L)))
    assert(hist(2) == (("delete-vectored", 16L, 4L)))
    assert(hist(3) == (("compact", 16L, 0L)))
    // rollback through SQL restores the pre-delete rows
    val v4 = spark.sql(s"CALL graft.rollback('$root', 1)")
      .collect().head.getInt(0)
    assert(v4 == 4)
    assert(idsOf(root) == (1L to 20L))
  }

  test("index_bloom / expire / clone through CALL") {
    import spark.implicits._
    ensureCatalog()
    val dir = java.nio.file.Files.createTempDirectory("graft_cat2")
    val root = dir.resolve("src").toString
    val dst = dir.resolve("dst").toString
    VersionedTable.create(spark, root, (1L to 9L).toDF("id"))
    VersionedTable.append(spark, root, Seq(10L).toDF("id"))
    assert(spark.sql(s"CALL graft.index_bloom('$root', 'id')")
      .collect().head.getInt(0) == 3)
    assert(VersionedTable.unbloomedFiles(spark, root, "id").isEmpty)
    assert(spark.sql(s"CALL graft.clone('$root', '$dst')")
      .collect().head.getInt(0) == 1)
    assert(idsOf(dst) == (1L to 10L))
    val exp = spark.sql(s"CALL graft.expire('$root', 1)").collect().head
    assert(exp.getInt(0) == 2) // two old versions dropped
    assert(idsOf(root) == (1L to 10L))
  }

  test("quantile_sketch through CALL: register-exact, signed domain, error bound, determinism") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    // a signed, multi-decade domain: negatives exercise the signed grid
    val vals = ((1 to 4000).map(i => i * 3.17 - 6000.0) ++
      Seq(0.0, 0.004, -0.004)).toSeq
    VersionedTable.create(spark, root,
      vals.toDF("v").withColumn("id", monotonically_increasing_id())
        .repartition(4))
    val rows = spark.sql(
      s"CALL graft.quantile_sketch('$root', 'v', '0.1,0.5,0.9')").collect()
    assert(rows.length == 3)
    // exact reference over the same half-cent-rounded domain
    val xs = vals.map(v => math.floor(v * 100.0 + 0.5).toLong).sorted
    rows.foreach { r =>
      val (p, rank, est, n, nCells) = (r.getDouble(0), r.getLong(1),
        r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(n == vals.length && rank == math.ceil(p * n).toLong)
      val exact = xs(rank.toInt - 1).toDouble / 100.0
      assert(math.abs(est - exact) <= 0.005 * math.abs(exact) + 0.01,
        s"p=$p: est $est vs exact $exact breaks the bound")
      assert(nCells < 10000, s"register blew up: $nCells")
    }
    // deterministic: the same snapshot returns identical rows
    val again = spark.sql(
      s"CALL graft.quantile_sketch('$root', 'v', '0.1,0.5,0.9')").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the default probe grid binds
    assert(spark.sql(s"CALL graft.quantile_sketch('$root', 'v')")
      .collect().length == 4)
    // refusals: bad probe, unknown column
    assert(intercept[Exception](spark.sql(
      s"CALL graft.quantile_sketch('$root', 'v', '1.5')")).getMessage
      .contains("probes"))
    assert(intercept[Exception](spark.sql(
      s"CALL graft.quantile_sketch('$root', 'nope', '0.5')")) != null)
  }

  test("quantile_sketch_save / _merge: merged persisted registers are bit-identical to the one-pass sketch") {
    import spark.implicits._
    ensureCatalog()
    val (t1, t2, whole) = (freshRoot(), freshRoot(), freshRoot())
    val (r1, r2) = (freshRoot(), freshRoot())
    // signed multi-decade domain split into two disjoint ingests
    val vals = ((1 to 3000).map(i => i * 2.13 - 3000.0) ++ Seq(0.0)).toSeq
    val (a, b) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    VersionedTable.create(spark, t1, a.map(_._1).toDF("v"))
    VersionedTable.create(spark, t2, b.map(_._1).toDF("v"))
    VersionedTable.create(spark, whole, vals.toDF("v"))
    val s1 = spark.sql(
      s"CALL graft.quantile_sketch_save('$t1', 'v', '$r1')").collect().head
    val s2 = spark.sql(
      s"CALL graft.quantile_sketch_save('$t2', 'v', '$r2')").collect().head
    assert(s1.getLong(1) == a.length && s2.getLong(1) == b.length,
      "save must report each ingest's row count")
    // the saved register IS a versioned table with the register schema
    assert(VersionedTable.read(spark, r1).columns.toSeq == Seq("cell", "cnt"))
    assert(VersionedTable.read(spark, r1).count() < 10000, "register-sized")
    // merge of the two persisted registers ≡ one pass over the union —
    // without rescanning either source table
    val merged = spark.sql(
      s"CALL graft.quantile_sketch_merge('$r1,$r2', '0.1,0.5,0.9')").collect()
    val onePass = spark.sql(
      s"CALL graft.quantile_sketch('$whole', 'v', '0.1,0.5,0.9')").collect()
    assert(merged.map(_.toString).toSeq == onePass.map(_.toString).toSeq,
      "merged registers must be bit-identical to the one-pass sketch")
    // a single-register merge degenerates to that register's sketch
    val solo = spark.sql(
      s"CALL graft.quantile_sketch_merge('$r1', '0.5')").collect().head
    val soloDirect = spark.sql(
      s"CALL graft.quantile_sketch('$t1', 'v', '0.5')").collect().head
    assert(solo.toString == soloDirect.toString)
    // refusals: empty path list, bad probes
    assert(intercept[Exception](spark.sql(
      "CALL graft.quantile_sketch_merge('', '0.5')")) != null)
    assert(intercept[Exception](spark.sql(
      s"CALL graft.quantile_sketch_merge('$r1', '2.0')")).getMessage
      .contains("probes"))
  }

  test("quantile_sketch_weighted: ranks walk the weight, estimates honor the bound, weighting moves the answer") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    // heavy rows (weight 100) at LOW values, light rows (weight 1) at
    // high values — row-median and weight-median must disagree
    val rows = (1 to 200).map(i => (i * 1.5, if (i <= 50) 100L else 1L))
    VersionedTable.create(spark, root, rows.toDF("v", "wt"))
    val got = spark.sql(s"CALL graft.quantile_sketch_weighted(" +
      s"'$root', 'v', 'wt', '0.25,0.5,0.9')").collect()
    assert(got.length == 3)
    // exact weighted reference over the half-cent-rounded domain
    val xs = rows.map { case (v, w) =>
      (math.floor(v * 100.0 + 0.5).toLong, w) }.sortBy(_._1)
    val totalW = xs.map(_._2).sum
    val cum = xs.scanLeft(0L)(_ + _._2).drop(1)
    got.foreach { r =>
      val (p, rankW, est, nW) =
        (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nW == totalW && rankW == math.ceil(p * totalW).toLong)
      val exact = xs(cum.indexWhere(_ >= rankW))._1.toDouble / 100.0
      assert(math.abs(est - exact) <= 0.005 * math.abs(exact) + 0.01,
        s"p=$p: weighted est $est vs exact $exact breaks the bound")
    }
    // the weighting is doing work: the weight-median sits in the heavy
    // low band while the row-median does not
    val wMedian = got.find(_.getDouble(0) == 0.5).get.getDouble(2)
    val rowMedian = spark.sql(
      s"CALL graft.quantile_sketch('$root', 'v', '0.5')")
      .collect().head.getDouble(2)
    assert(wMedian < rowMedian,
      s"heavy low-value rows must pull the weighted median down " +
        s"($wMedian vs row $rowMedian)")
    // zero/negative weights are excluded, not summed
    val root2 = freshRoot()
    VersionedTable.create(spark, root2,
      Seq((1.0, 5L), (2.0, 0L), (3.0, -4L)).toDF("v", "wt"))
    val one = spark.sql(s"CALL graft.quantile_sketch_weighted(" +
      s"'$root2', 'v', 'wt', '0.99')").collect().head
    assert(one.getLong(3) == 5L &&
      math.abs(one.getDouble(2) - 1.0) <= 0.005 + 0.01)
  }

  test("time-based retention and SHOW PROCEDURES") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root, Seq(1L).toDF("id"))
    VersionedTable.append(spark, root, Seq(2L).toDF("id"))
    VersionedTable.append(spark, root, Seq(3L).toDF("id"))
    // everything is younger than the epoch cutoff: nothing expires
    val none = spark.sql(s"CALL graft.expire_older_than('$root', 0, 1)")
      .collect().head
    assert(none.getInt(0) == 0)
    // a far-future cutoff keeps only the enforced minimum
    val far = System.currentTimeMillis() + 3600L * 1000
    val gone = spark.sql(s"CALL graft.expire_older_than('$root', $far, 1)")
      .collect().head
    assert(gone.getInt(0) == 2)
    assert(VersionedTable.versions(spark, root) == Seq(3))
    assert(idsOf(root) == Seq(1L, 2L, 3L))
    // the procedure surface is discoverable through SQL
    val procs = spark.sql("SHOW PROCEDURES IN graft")
      .collect().map(_.toString).mkString(",")
    assert(procs.contains("compact") && procs.contains("history") &&
      procs.contains("expire_older_than"), procs)
  }

  test("orphans: a crashed commit's stranded file is reported, then swept") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root, (1L to 8L).toDF("id"))
    VersionedTable.append(spark, root, Seq(9L).toDF("id"))
    assert(spark.sql(s"CALL graft.orphans('$root')").collect().isEmpty)
    // a crashed commit: data written, manifest never published
    val stray = new java.io.File(s"$root/data/c9-deadbeef-stranded.parquet")
    java.nio.file.Files.write(stray.toPath, Array[Byte](1, 2, 3))
    val got = spark.sql(s"CALL graft.orphans('$root')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("data/c9-deadbeef-stranded.parquet", 3L)))
    // report only — the table is untouched until expire actually sweeps
    assert(stray.exists())
    VersionedTable.expire(spark, root, keepLast = 2)
    assert(!stray.exists())
    assert(spark.sql(s"CALL graft.orphans('$root')").collect().isEmpty)
  }

  test("min_orphan_age_ms shields a commit-in-flight's staged files from the sweep") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root, (1L to 5L).toDF("id"))
    VersionedTable.append(spark, root, Seq(6L).toDF("id"))
    // a concurrent writer's freshly STAGED file: data written, manifest
    // not yet published — unreferenced, but must not be swept mid-commit
    val staged = new java.io.File(s"$root/data/c3-abcd1234-inflight.parquet")
    java.nio.file.Files.write(staged.toPath, Array[Byte](7))
    // the SQL face DEFAULTS the floor to one hour — the scheduled-GC
    // caller is exactly who forgets the single-writer staging window
    spark.sql(s"CALL graft.expire('$root', 1)")
    assert(staged.exists(),
      "the default floor must shield a young unreferenced file")
    // an explicit 0 floor is the maintenance-window sweep (writers
    // quiesced): the stranded file goes
    spark.sql(s"CALL graft.expire('$root', 1, 0)")
    assert(!staged.exists())
  }

  test("unknown procedures and malformed args are refused with clear errors") {
    ensureCatalog()
    val e = intercept[Exception] {
      spark.sql("CALL graft.no_such_proc('/x')").collect()
    }
    assert(e.getMessage.contains("no_such_proc") ||
      e.getMessage.contains("unknown procedure"))
    intercept[Exception] {
      spark.sql("CALL graft.compact('/nonexistent/table', 1)").collect()
    }
  }

  test("txn_apply / txn_snapshot / txn_history: multi-table transactions from SQL") {
    import spark.implicits._
    ensureCatalog()
    val cat = java.nio.file.Files.createTempDirectory("graft_txn_sql")
      .resolve("cat").toString
    // txn 1: two derived tables land ATOMICALLY from registered views
    (1L to 6L).toDF("id").withColumn("v", col("id") * 2)
      .createOrReplaceTempView("src_full")
    (1L to 3L).toDF("id").withColumn("v", col("id") * 2)
      .createOrReplaceTempView("src_clip")
    val t1 = spark.sql(s"CALL graft.txn_apply('$cat', 'full,clipped', " +
      "'src_full,src_clip')").collect().head.getInt(0)
    assert(t1 == 1)
    // txn 2: both tables move together
    (1L to 8L).toDF("id").withColumn("v", col("id") * 3)
      .createOrReplaceTempView("src_full")
    (1L to 4L).toDF("id").withColumn("v", col("id") * 3)
      .createOrReplaceTempView("src_clip")
    val t2 = spark.sql(s"CALL graft.txn_apply('$cat', 'full,clipped', " +
      "'src_full,src_clip')").collect().head.getInt(0)
    assert(t2 == 2)
    // snapshot read: the NEWEST consistent pair through temp views
    val views = spark.sql(s"CALL graft.txn_snapshot('$cat', 'cur')")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(views == Seq("cur_clipped", "cur_full"))
    assert(spark.table("cur_full").count() == 8)
    assert(spark.table("cur_clipped").count() == 4)
    // cross-table TIME TRAVEL: txn 1's pair, both pre-update
    spark.sql(s"CALL graft.txn_snapshot('$cat', 'old', 1)")
    assert(spark.table("old_full").count() == 6)
    assert(spark.table("old_clipped").count() == 3)
    assert(spark.table("old_full").select(sum("v")).collect().head.getLong(0)
      == (1L to 6L).map(_ * 2).sum)
    // audit: one row per (txn, table) pin, versions advancing in step
    val hist = spark.sql(s"CALL graft.txn_history('$cat')")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getInt(3)).toMap
    assert(hist((1, "full")) == 1 && hist((1, "clipped")) == 1)
    assert(hist((2, "full")) == 2 && hist((2, "clipped")) == 2)
  }

  test("merge_into through CALL: CoW and vectored, source as a temp view") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 10L).toDF("id").withColumn("v", col("id") * 100)
        .repartition(2))
    // upsert batch: replace 3 and 7, insert 11 — registered as the view
    Seq((3L, 999L), (7L, 777L), (11L, 111L)).toDF("id", "v")
      .createOrReplaceTempView("merge_src_cow")
    val v2 = spark.sql(
      s"CALL graft.merge_into('$root', 'merge_src_cow', 'id', false)")
      .collect().head.getInt(0)
    assert(v2 == 2)
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 999L && got(7L) == 777L && got(11L) == 111L)
    assert(got(1L) == 100L && got.size == 11)
    // vectored merge: matched rows vector away, no target file rewrites
    val filesBefore = VersionedTable.filesOf(spark, root).toSet
    Seq((5L, 555L), (12L, 222L)).toDF("id", "v")
      .createOrReplaceTempView("merge_src_mor")
    val v3 = spark.sql(
      s"CALL graft.merge_into('$root', 'merge_src_mor', 'id', true)")
      .collect().head.getInt(0)
    assert(v3 == 3)
    assert(filesBefore.subsetOf(VersionedTable.filesOf(spark, root).toSet),
      "vectored merge must carry every pre-merge file by name")
    val got3 = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3(5L) == 555L && got3(12L) == 222L && got3.size == 12)
    // and the default (vectored omitted) binds to copy-on-write
    Seq((1L, 101L)).toDF("id", "v").createOrReplaceTempView("merge_src_d")
    assert(spark.sql(s"CALL graft.merge_into('$root', 'merge_src_d', 'id')")
      .collect().head.getInt(0) == 4)
  }

  test("reindex through CALL restores bloom precision after a vectored delete") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    // two disjoint key files, bloom-indexed
    VersionedTable.create(spark, root,
      (0L until 50L).toDF("n").select(concat(lit("a"), col("n")).as("k"))
        .coalesce(1))
    VersionedTable.append(spark, root,
      (0L until 50L).toDF("n").select(concat(lit("b"), col("n")).as("k"))
        .coalesce(1))
    VersionedTable.indexBloom(spark, root, Seq("k"))
    val aFile = VersionedTable.filesOf(spark, root).head
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "a10")
      .contains(aFile))
    // vector away every a-key: the bloom is now a stale over-approximation
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("k").startsWith("a"))
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "a10")
      .contains(aFile),
      "pre-reindex: the stale bloom still admits the deleted key (sound)")
    val v = spark.sql(s"CALL graft.reindex('$root', 'k')")
      .collect().head.getInt(0)
    assert(v == VersionedTable.versions(spark, root).last)
    // post-reindex: the file whose only matching rows were vectored away
    // is EXCLUDED from the point lookup; surviving keys still hit
    assert(!VersionedTable.bloomPrunedFiles(spark, root, "k", "a10")
      .contains(aFile),
      "reindex must rebuild the bloom from surviving rows only")
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "b10").nonEmpty)
    // a reindex with no DV-bearing files is a version-preserving no-op
    VersionedTable.compact(spark, root, targetBytes = Long.MaxValue / 4)
    val cur = VersionedTable.versions(spark, root).last
    assert(spark.sql(s"CALL graft.reindex('$root', 'k')")
      .collect().head.getInt(0) == cur)
  }

  test("reindex preserves each file's existing bloom sizing") {
    import spark.implicits._
    ensureCatalog()
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (0L until 80L).toDF("n").select(concat(lit("x"), col("n")).as("k"))
        .coalesce(1))
    // a deliberately LARGE bloom for high-cardinality keys
    VersionedTable.indexBloom(spark, root, Seq("k"), mBits = 1 << 15, k = 7)
    assert(VersionedTable.bloomShapes(spark, root, "k").values.toSet ==
      Set((1 << 15, 7)))
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("k").startsWith("x1"))
    // the SQL face exposes no m/k — the rebuild must keep the file's own
    // sizing, not silently shrink it to the 8 Kib default (8x the false
    // positives on the operation that exists to restore precision)
    spark.sql(s"CALL graft.reindex('$root', 'k')")
    assert(VersionedTable.bloomShapes(spark, root, "k").values.toSet ==
      Set((1 << 15, 7)),
      "reindex must rebuild at the recorded (mBits, k)")
    // and the rebuilt index still behaves: a deleted key's file prunes,
    // a surviving key's file does not
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "x12").isEmpty)
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "x42").nonEmpty)
  }
}
