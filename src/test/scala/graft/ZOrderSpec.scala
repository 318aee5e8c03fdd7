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
