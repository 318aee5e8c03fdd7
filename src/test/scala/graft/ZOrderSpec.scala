package graft

import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Z-order clustering as a commit ([[VersionedTable.zorderBy]]): the
  * rewrite must narrow per-file [lo, hi] on EVERY listed dimension at
  * once — the property 1-D clustering can't give — while changing no
  * answer. */
class ZOrderSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_zo").resolve("t").toString

  test("zorderBy narrows every dimension; 2-D and single-dimension boxes prune") {
    import spark.implicits._
    val root = freshRoot()
    // a 64x64 grid in row-major id order: x cycles fast, y slow — after
    // a random repartition BOTH dimensions are scattered across files
    val d = (0L until 4000L).toDF("id")
      .select((col("id") % 64).as("x"), expr("(id div 64) % 64").as("y"),
        col("id").as("payload"))
    VersionedTable.create(spark, root, d.repartition(8))
    val box: VersionedTable.RangePreds =
      Map("x" -> (Some(0L), Some(3L)), "y" -> (Some(0L), Some(3L)))
    assert(VersionedTable.prunedFiles(spark, root, box).size ==
      VersionedTable.filesOf(spark, root).size,
      "fixture must start scattered: the box prunes nothing")
    val before = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    VersionedTable.zorderBy(spark, root, Seq("x", "y"), targetBytes = 2048)
    val total = VersionedTable.filesOf(spark, root).size
    assert(total >= 8, s"fixture needs enough files to mean anything: $total")
    // answer-invisible: the rewrite is a pure layout change
    assert(VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq == before)
    // the 2-D box now opens a small zone, not the table
    val boxFiles = VersionedTable.prunedFiles(spark, root, box)
    assert(boxFiles.size <= total / 2,
      s"2-D box should prune hard, opened ${boxFiles.size} of $total")
    // and pruning is NOT leading-column-only: each dimension alone prunes
    val xOnly = VersionedTable.prunedFiles(spark, root,
      Map("x" -> (Some(0L), Some(3L))))
    val yOnly = VersionedTable.prunedFiles(spark, root,
      Map("y" -> (Some(0L), Some(3L))))
    assert(xOnly.size < total, "x-only predicate must prune some files")
    assert(yOnly.size < total,
      "y-only predicate must prune too — lexicographic clustering on " +
        "(x, y) would leave y scattered across every file")
    // the pruned read is still exactly right
    val got = VersionedTable.readWhere(spark, root, box)
      .filter(col("x") <= 3 && col("y") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == before.collect { case (x, y, _) if x <= 3 && y <= 3 => (x, y) }
      .sorted.toSeq)
  }

  test("zorderBy materializes deletion vectors like every CoW rewrite") {
    import spark.implicits._
    val root = freshRoot()
    val d = (0L until 1000L).toDF("id")
      .select((col("id") % 32).as("x"), expr("(id div 32) % 32").as("y"))
    VersionedTable.create(spark, root, d.repartition(4))
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("x") === 5)
    VersionedTable.zorderBy(spark, root, Seq("x", "y"), targetBytes = 4096)
    assert(VersionedTable.dvRefs(spark, root).isEmpty,
      "the rewrite must fold the vector in")
    assert(VersionedTable.read(spark, root).filter(col("x") === 5).count() == 0L)
    assert(VersionedTable.read(spark, root).count() ==
      1000L - d.filter(col("x") === 5).count())
  }

  /** Sum over files of each file's [lo, hi] width on `c` — the pruning
    * surface: smaller total span = tighter boxes = harder pruning. */
  private def spanSum(root: String, c: String): Long = {
    val files = VersionedTable.filesOf(spark, root)
    val stats = files.map(f => VersionedTable.readSubset(spark, root, Seq(f))
      .agg(min(col(c)), max(col(c))).collect().head)
    stats.map(r => r.getLong(1) - r.getLong(0)).sum
  }

  test("adaptive bits: a low-cardinality dimension stops diluting the wide one") {
    import spark.implicits._
    // y has FOUR values; x spans 0..4095. Fixed 8-bit bucketing smears
    // y's 4 values across 0..255 (values 0/85/170/255 — every one of
    // its 8 interleave positions carries information), chopping x's
    // locality at every level. Adaptive bits give y exactly 2 positions;
    // x's per-file spans must come out materially tighter than under the
    // legacy layout, which the spec reconstructs by sorting on the
    // fixed-8-bit Morton key and slicing into the same file count.
    val root = freshRoot()
    val rows = (0L until 8192L).toDF("id")
      .select((col("id") % 4096).as("x"), expr("id div 2048").as("y"),
        col("id").as("payload"))
    VersionedTable.create(spark, root, rows.repartition(8))
    VersionedTable.zorderBy(spark, root, Seq("x", "y"), targetBytes = 4096)
    val nFiles = VersionedTable.filesOf(spark, root).size
    assert(nFiles >= 8, s"need enough files to compare layouts: $nFiles")
    val adaptiveSpan = spanSum(root, "x")
    // legacy fixed-8-bit Morton, reconstructed exactly: bucket BOTH dims
    // into 256 equal-width buckets over their value range, interleave
    // 8+8 bits, sort, slice into nFiles equal runs, measure x spans
    val legacy = rows.collect().map { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      val bx = math.min(255L, math.max(0L, x * 256 / 4096))
      val by = math.min(255L, math.max(0L, (y * 256 / 4) min 255L))
      val key = (0 until 8).map(i =>
        (((bx >> i) & 1L) << (2 * i)) | (((by >> i) & 1L) << (2 * i + 1))).sum
      (key, x)
    }.sortBy(_._1)
    val per = math.max(1, legacy.length / nFiles)
    val legacySpan = legacy.grouped(per).map { g =>
      g.map(_._2).max - g.map(_._2).min }.sum
    assert(adaptiveSpan * 2 < legacySpan,
      s"adaptive layout must at least halve the wide dimension's total " +
        s"per-file span: adaptive=$adaptiveSpan legacy=$legacySpan")
  }

  test("hilbert curve: same answers, both dimensions narrow, SQL face carries it") {
    import spark.implicits._
    val root = freshRoot()
    val d = (0L until 4000L).toDF("id")
      .select((col("id") % 64).as("x"), expr("(id div 64) % 64").as("y"),
        col("id").as("payload"))
    VersionedTable.create(spark, root, d.repartition(8))
    val before = VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    val v = spark.sql(s"CALL graft.zorder('$root', 'x,y', 2048, 'hilbert')")
      .collect().head.getInt(0)
    assert(v == 2)
    assert(VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq == before, "a layout change may never change answers")
    val total = VersionedTable.filesOf(spark, root).size
    val box: VersionedTable.RangePreds =
      Map("x" -> (Some(0L), Some(3L)), "y" -> (Some(0L), Some(3L)))
    assert(VersionedTable.prunedFiles(spark, root, box).size <= total / 2,
      "the hilbert layout must prune the 2-D box hard")
    assert(VersionedTable.prunedFiles(spark, root,
      Map("x" -> (Some(0L), Some(3L)))).size < total)
    assert(VersionedTable.prunedFiles(spark, root,
      Map("y" -> (Some(0L), Some(3L)))).size < total)
    // 3-D hilbert refuses (the xy2d state machinery is 2-D)
    intercept[IllegalArgumentException] {
      VersionedTable.zorderBy(spark, root, Seq("x", "y", "payload"),
        curve = "hilbert")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.zorderBy(spark, root, Seq("x", "y"), curve = "peano")
    }
  }

  test("zorderBy refuses unsupported shapes with clear errors") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (0L until 10L).toDF("id").withColumn("s", concat(lit("k"), col("id"))))
    intercept[IllegalArgumentException] {
      VersionedTable.zorderBy(spark, root, Seq("id")) // one dim: use compact
    }
    intercept[IllegalArgumentException] {
      VersionedTable.zorderBy(spark, root, Seq("id", "s")) // string dim
    }
    intercept[IllegalArgumentException] {
      VersionedTable.zorderBy(spark, root, Seq("id", "nope"))
    }
  }
}
