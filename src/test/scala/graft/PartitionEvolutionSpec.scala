package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Partition evolution on the versioned table — the Iceberg
  * partition-spec-evolution recipe. Contract under test:
  * setPartitionLayout is a metadata-only commit; files written before
  * it keep their hive layout and stay readable AND prunable (per-file
  * degenerate dir stats), files after it land under the new layout;
  * all three directions work (none→cols, cols→other cols, cols→none);
  * rewrites migrate data to the current layout; DMLs work over the
  * mixed snapshot; illegal layouts refuse. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pevo").resolve("t").toString

  private def df(rows: (Long, String, String)*) =
    rows.toSeq.toDF("id", "grp", "day").coalesce(1)

  private def all(root: String, v: Option[Int] = None): Set[(Long, String, String)] =
    VersionedTable.read(spark, root, v)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("unpartitioned -> partitioned: old flat files and new hive files coexist") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df((1L, "a", "d1"), (2L, "b", "d1")))
    VersionedTable.setPartitionLayout(spark, root, Seq("grp"))
    assert(VersionedTable.partitionColsOf(spark, root) == Seq("grp"))
    VersionedTable.append(spark, root, df((3L, "a", "d2"), (4L, "b", "d2")))
    val files = VersionedTable.filesOf(spark, root)
    assert(files.exists(!_.contains("=")) && files.exists(_.contains("grp=")),
      s"mixed layouts expected, got $files")
    assert(all(root) ==
      Set((1L, "a", "d1"), (2L, "b", "d1"), (3L, "a", "d2"), (4L, "b", "d2")))
    // pruning: new files prune on the dir stats, old ones on footer stats
    val pruned = VersionedTable.prunedFiles(spark, root,
      Map("grp" -> (Some("b"), Some("b"))))
    assert(pruned.size < files.size, "grp=b predicate must prune files")
    assert(VersionedTable.readWhere(spark, root,
        Map("grp" -> (Some("b"), Some("b"))))
      .filter(col("grp") === "b")
      .collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("partitioned -> repartitioned -> unpartitioned, with time travel") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      df((1L, "a", "d1"), (2L, "b", "d1")), partitionBy = Seq("grp")) // v1
    VersionedTable.setPartitionLayout(spark, root, Seq("day"))        // v2
    VersionedTable.append(spark, root, df((3L, "a", "d2")))           // v3
    VersionedTable.setPartitionLayout(spark, root, Seq.empty)         // v4
    VersionedTable.append(spark, root, df((4L, "c", "d3")))           // v5
    val files = VersionedTable.filesOf(spark, root)
    assert(files.exists(_.contains("grp=")) && files.exists(_.contains("day=")) &&
      files.exists(!_.contains("=")), s"three layouts expected, got $files")
    assert(all(root) ==
      Set((1L, "a", "d1"), (2L, "b", "d1"), (3L, "a", "d2"), (4L, "c", "d3")))
    assert(VersionedTable.partitionColsOf(spark, root).isEmpty)
    // every old snapshot still reads under its own layout mix
    assert(all(root, Some(1)) == Set((1L, "a", "d1"), (2L, "b", "d1")))
    assert(all(root, Some(3)) ==
      Set((1L, "a", "d1"), (2L, "b", "d1"), (3L, "a", "d2")))
  }

  test("compaction migrates files to the current layout; DMLs span mixed layouts") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      df((1L, "a", "d1"), (2L, "b", "d1")), partitionBy = Seq("grp"))
    VersionedTable.setPartitionLayout(spark, root, Seq("day"))
    VersionedTable.append(spark, root, df((3L, "a", "d2"), (4L, "b", "d2")))
    // a vectored delete over BOTH layouts
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("id") === 2L || col("id") === 3L)
    assert(all(root) == Set((1L, "a", "d1"), (4L, "b", "d2")))
    // compact rewrites the survivors under the CURRENT layout only
    VersionedTable.compact(spark, root, targetBytes = 1L)
    val files = VersionedTable.filesOf(spark, root)
    assert(files.forall(f => f.contains("day=") && !f.contains("grp=")),
      s"compaction must migrate to the day layout, got $files")
    assert(all(root) == Set((1L, "a", "d1"), (4L, "b", "d2")))
  }

  test("illegal layouts refuse: unknown column, no-op, renamed column") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df((1L, "a", "d1")))
    intercept[IllegalArgumentException] {
      VersionedTable.setPartitionLayout(spark, root, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.setPartitionLayout(spark, root, Seq.empty) // already flat
    }
    VersionedTable.renameColumn(spark, root, "grp", "category")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.setPartitionLayout(spark, root, Seq("category"))
    }
    assert(e.getMessage.contains("write-time names"))
    VersionedTable.setPartitionLayout(spark, root, Seq("day")) // unmapped: fine
  }
}
