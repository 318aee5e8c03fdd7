package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** MERGE with schema evolution — the Delta withSchemaEvolution recipe.
  * Contract under test: source-only columns are added (existing rows
  * NULL), wider source types widen the table, matched rows PRESERVE
  * values for columns the source doesn't carry, inserts get NULL
  * there, both CoW and merge-on-read shapes agree, re-runs under a txn
  * are idempotent, and irreconcilable types refuse. */
class MergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_mev").resolve("t").toString

  private def base() = Seq((1, "a", 10L), (2, "b", 20L), (3, "c", 30L))
    .toDF("k", "tag", "v").coalesce(1)

  test("source-only columns evolve in; matched rows keep unsupplied values") {
    val root = freshRoot()
    VersionedTable.create(spark, root, base())
    // source: no 'tag' (preservation), new 'score' (evolution), k=2
    // updated, k=9 inserted
    val src = Seq((2, 200L, 0.5), (9, 900L, 0.9))
      .toDF("k", "v", "score").coalesce(1)
    VersionedTable.mergeIntoEvolve(spark, root, src, Seq("k"))
    val got = VersionedTable.read(spark, root).collect().map(r =>
      (r.getInt(0), Option(r.getString(1)).orNull, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(got == Set(
      (1, "a", 10L, None),          // untouched
      (2, "b", 200L, Some(0.5)),    // updated: tag PRESERVED, score new
      (3, "c", 30L, None),          // untouched
      (9, null, 900L, Some(0.9)))) // insert: tag NULL
    assert(VersionedTable.schemaOf(spark, root).fieldNames.toSeq ==
      Seq("k", "tag", "v", "score"))
  }

  test("wider source widens the table; narrower source upcasts; vectored shape agrees") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1, 10), (2, 20)).toDF("k", "v").coalesce(1)) // v INT
    // source carries v as BIGINT -> table widens
    VersionedTable.mergeIntoEvolve(spark, root,
      Seq((2, 1L << 40)).toDF("k", "v").coalesce(1), Seq("k"),
      vectored = true)
    assert(VersionedTable.schemaOf(spark, root)("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(VersionedTable.read(spark, root).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> 10L, 2 -> (1L << 40)))
    // a later INT-typed source upcasts into the widened table
    VersionedTable.mergeIntoEvolve(spark, root,
      Seq((3, 30)).toDF("k", "v").coalesce(1), Seq("k"))
    assert(VersionedTable.read(spark, root).count() == 3)
  }

  test("txn idempotence spans the evolution commits; bad types refuse") {
    val root = freshRoot()
    VersionedTable.create(spark, root, base())
    val src = Seq((1, 100L, "x")).toDF("k", "v", "note").coalesce(1)
    val v1 = VersionedTable.mergeIntoEvolve(spark, root, src, Seq("k"),
      txn = Some(77L))
    val v2 = VersionedTable.mergeIntoEvolve(spark, root, src, Seq("k"),
      txn = Some(77L))
    assert(v1 == v2, "txn re-run must not re-apply")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 1).first().getLong(2) == 100L)
    // string source over a long table column: neither direction widens
    assert(scala.util.Try(VersionedTable.mergeIntoEvolve(spark, root,
      Seq((1, "oops")).toDF("k", "v").coalesce(1), Seq("k"))).isFailure)
  }
}
