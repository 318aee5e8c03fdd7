package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** REPLACE WHERE — predicate-scoped atomic overwrite. Contract under
  * test: one commit swaps the region's rows for the incoming frame;
  * files wholly inside the region drop WITHOUT being read (the
  * metadata-only reload path — pinned via replaceContainedFiles and
  * file-name survival); overlapping files rewrite survivors with
  * NOT-TRUE (NULL keeps the row); an incoming row outside the region
  * (or NULL in a predicate column) refuses atomically with staged files
  * swept; txn replay short-circuits; time travel still reads the
  * pre-replace slice; CHECK constraints gate the staged rows. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rw").resolve("t").toString

  private def day(d: Int, rows: Int): org.apache.spark.sql.DataFrame =
    (0 until rows).map(i => (d, d * 100L + i, s"d$d-r$i"))
      .toDF("day", "id", "tag").coalesce(1)

  test("partition-aligned reload: contained files drop unread, one atomic commit") {
    val root = freshRoot()
    // one file per day: day-partitioned by coalesce(1) per append
    VersionedTable.create(spark, root, day(1, 3))
    VersionedTable.append(spark, root, day(2, 4))
    VersionedTable.append(spark, root, day(3, 5))
    val before = VersionedTable.filesOf(spark, root)
    val preds = Map("day" -> (Some(2): Option[Any], Some(2): Option[Any]))
    // the day-2 file is provably contained: [2,2] within [2,2], 0 nulls
    val contained = VersionedTable.replaceContainedFiles(spark, root, preds)
    assert(contained.size == 1, s"expected exactly the day-2 file, got $contained")
    val vBefore = VersionedTable.currentVersion(spark, root).get
    val v = VersionedTable.replaceWhere(spark, root,
      Seq((2, 9000L, "fresh-a"), (2, 9001L, "fresh-b"))
        .toDF("day", "id", "tag").coalesce(1), preds)
    assert(v == vBefore + 1, "replaceWhere is ONE commit")
    val after = VersionedTable.read(spark, root)
    assert(after.filter($"day" === 2).count() == 2)
    assert(after.filter($"day" === 2).select("tag").as[String].collect().toSet ==
      Set("fresh-a", "fresh-b"))
    // untouched days intact, bytes unmoved (same file names survive)
    assert(after.filter($"day" =!= 2).count() == 8)
    val now = VersionedTable.filesOf(spark, root).toSet
    val untouched = before.filterNot(contained.contains).toSet
    assert(untouched.subsetOf(now),
      "files outside the region must carry over by NAME — no rewrite")
    assert(!now.contains(contained.head), "the contained file must drop")
    // time travel still reads the pre-replace slice
    val old = VersionedTable.read(spark, root, Some(vBefore))
    assert(old.filter($"day" === 2).count() == 4)
  }

  test("overlapping file rewrites survivors; NULL in the predicate column survives") {
    val root = freshRoot()
    // ONE file spanning days 1..3 plus a NULL-day row: never contained
    val mixed = Seq((Some(1), 1L, "a"), (Some(2), 2L, "b"), (Some(3), 3L, "c"),
      (None: Option[Int], 4L, "null-day"))
      .toDF("day", "id", "tag").coalesce(1)
    VersionedTable.create(spark, root, mixed)
    val preds = Map("day" -> (Some(2): Option[Any], Some(2): Option[Any]))
    assert(VersionedTable.replaceContainedFiles(spark, root, preds).isEmpty,
      "a spanning file must not be dropped unread")
    VersionedTable.replaceWhere(spark, root,
      Seq((2, 20L, "b2")).toDF("day", "id", "tag")
        .select($"day".cast("int").as("day"), $"id", $"tag").coalesce(1),
      preds)
    val rows = VersionedTable.read(spark, root)
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (3L, "c"), (4L, "null-day"), (20L, "b2")),
      s"survivors + replacement expected, got $rows")
  }

  test("a written row outside the region refuses atomically, staged files swept") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((Some(1), 100L, "d1-r0"), (Some(1), 101L, "d1-r1"))
        .toDF("day", "id", "tag").coalesce(1))
    val vBefore = VersionedTable.currentVersion(spark, root).get
    val preds = Map("day" -> (Some(1): Option[Any], Some(1): Option[Any]))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, root,
        Seq((1, 10L, "in"), (7, 11L, "OUT")).toDF("day", "id", "tag")
          .coalesce(1), preds)
    }
    assert(e.getMessage.contains("outside the replaced region"))
    assert(VersionedTable.currentVersion(spark, root).contains(vBefore))
    assert(VersionedTable.orphanFiles(spark, root).isEmpty,
      "refused replace must sweep its staged files")
    // NULL in a predicate column is also outside the region
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, root,
        Seq((None: Option[Int], 12L, "nul")).toDF("day", "id", "tag")
          .coalesce(1), preds)
    }
    assert(e2.getMessage.contains("outside the replaced region"))
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("txn replay short-circuits; CHECK constraints gate the staged rows") {
    val root = freshRoot()
    VersionedTable.create(spark, root, day(1, 2))
    VersionedTable.append(spark, root, day(2, 2))
    val preds = Map("day" -> (Some(2): Option[Any], Some(2): Option[Any]))
    val v = VersionedTable.replaceWhere(spark, root,
      Seq((2, 50L, "x")).toDF("day", "id", "tag").coalesce(1),
      preds, txn = Some(777L))
    // replay of the same txn is a no-op returning the committed version
    val v2 = VersionedTable.replaceWhere(spark, root,
      Seq((2, 51L, "y")).toDF("day", "id", "tag").coalesce(1),
      preds, txn = Some(777L))
    assert(v2 == v, "txn replay must short-circuit to the ledger")
    assert(VersionedTable.read(spark, root).filter($"day" === 2).count() == 1)
    // a CHECK violation in the incoming frame refuses atomically
    VersionedTable.addConstraint(spark, root, "id_pos", "id > 0")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, root,
        Seq((2, -5L, "bad")).toDF("day", "id", "tag").coalesce(1), preds)
    }
    assert(e.getMessage.contains("id_pos"))
    assert(VersionedTable.orphanFiles(spark, root).isEmpty)
    assert(VersionedTable.read(spark, root).filter($"day" === 2)
      .select("id").as[Long].collect().toSeq == Seq(50L))
  }

  test("deletion vectors: a vectored file still drops or rewrites correctly") {
    val root = freshRoot()
    VersionedTable.create(spark, root, day(1, 3))
    VersionedTable.append(spark, root, day(2, 4))
    // vector one day-2 row away, then replace day 2 entirely
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(201L): Option[Any], Some(201L): Option[Any])),
      col("id") === 201L)
    val preds = Map("day" -> (Some(2): Option[Any], Some(2): Option[Any]))
    VersionedTable.replaceWhere(spark, root,
      Seq((2, 999L, "vfresh")).toDF("day", "id", "tag").coalesce(1), preds)
    val d2 = VersionedTable.read(spark, root).filter($"day" === 2)
      .select("id").as[Long].collect().toSeq
    assert(d2 == Seq(999L), s"day 2 must hold only the replacement, got $d2")
    assert(VersionedTable.read(spark, root).count() == 4)
  }
}
