package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Column DEFAULT values — the Iceberg-v3 initial+write default recipe,
  * still metadata-only. Contract under test: addColumn(default) makes
  * rows in files PREDATING the column read the default (not NULL),
  * appends missing the column fill it physically at write time, an
  * explicit NULL stays NULL, filters/aggregates/DMLs/indexes see the
  * substituted value, rewrites materialize it, rename/drop re-key or
  * retire it, time travel and rollback respect it, and non-constant
  * defaults refuse. */
class DefaultValuesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dflt").resolve("t").toString

  private def df2(rows: (Long, Long)*) = rows.toSeq.toDF("id", "v").coalesce(1)

  test("existence + write defaults: old files substitute, appends fill, explicit NULL stays") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L, 2L -> 20L))     // v1
    VersionedTable.addColumn(spark, root, "src", "STRING",
      default = Some("'legacy'"))                                     // v2
    // an append NOT supplying the column fills the write default
    VersionedTable.append(spark, root, df2(3L -> 30L))                // v3
    // an append supplying an explicit NULL keeps it
    VersionedTable.append(spark, root,
      Seq((4L, 40L, null.asInstanceOf[String]), (5L, 50L, "fresh"))
        .toDF("id", "v", "src").coalesce(1))                          // v4
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == Map(1L -> Some("legacy"), 2L -> Some("legacy"),
      3L -> Some("legacy"), 4L -> None, 5L -> Some("fresh")))
    // filters and aggregates see the substituted value
    assert(VersionedTable.read(spark, root).filter(col("src") === "legacy")
      .count() == 3)
    // time travel: v1 has no column at all
    assert(!VersionedTable.read(spark, root, Some(1))
      .schema.fieldNames.contains("src"))
  }

  test("defaults survive DMLs, compaction materializes them, constraints validate through them") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L, 2L -> 20L, 3L -> 30L))
    VersionedTable.addColumn(spark, root, "score", "BIGINT", Some("7"))
    // a constraint over the defaulted column validates EXISTING rows
    // through the substitution (they all read 7)
    VersionedTable.addConstraint(spark, root, "score_pos", "score > 0")
    // vectored delete keyed on the DEFAULTED column hits old rows
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("score") === 7L && col("id") === 2L)
    assert(VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // vectored update reads the default and rewrites survivors with it
    VersionedTable.updateWhereVectored(spark, root, Map.empty,
      col("id") === 3L, Map("score" -> (col("score") + lit(1L))))
    val after = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after == Map(1L -> 7L, 3L -> 8L))
    // compaction materializes the default physically; values unchanged
    VersionedTable.compact(spark, root, targetBytes = 1L)
    assert(VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap ==
      Map(1L -> 7L, 3L -> 8L))
  }

  test("bloom index over a defaulted column contains the default for old files") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L, 2L -> 20L))
    VersionedTable.addColumn(spark, root, "tag", "STRING", Some("'t0'"))
    VersionedTable.append(spark, root,
      Seq((3L, 30L, "t1")).toDF("id", "v", "tag").coalesce(1))
    VersionedTable.indexBloom(spark, root, Seq("tag"))
    // readEq on the DEFAULT must include the pre-column files' rows —
    // a null-built bloom would wrongly prune them to an empty answer
    assert(VersionedTable.readEq(spark, root, "tag", "t0")
      .filter(col("tag") === "t0")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(VersionedTable.readEq(spark, root, "tag", "t1")
      .filter(col("tag") === "t1")
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("rename re-keys the default; drop retires it; re-add is a fresh NULL column") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L))
    VersionedTable.addColumn(spark, root, "lang", "STRING", Some("'en'"))
    VersionedTable.renameColumn(spark, root, "lang", "language")
    assert(VersionedTable.read(spark, root)
      .select("language").collect().head.getString(0) == "en")
    VersionedTable.dropColumn(spark, root, "language")
    VersionedTable.addColumn(spark, root, "language", "STRING")
    // the re-added field has no default and must NOT resurrect 'en'
    assert(VersionedTable.read(spark, root)
      .select("language").collect().head.isNullAt(0))
  }

  test("rollback and clone carry defaults; expire keeps substitution alive") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L))                 // v1
    VersionedTable.addColumn(spark, root, "k", "BIGINT", Some("42"))   // v2
    VersionedTable.append(spark, root, df2(2L -> 20L))                 // v3
    val clone = Files.createTempDirectory("graft_dflt").resolve("c").toString
    VersionedTable.cloneShallow(spark, root, clone)
    assert(VersionedTable.read(spark, clone)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap ==
      Map(1L -> 42L, 2L -> 42L))
    VersionedTable.rollback(spark, root, 2)                            // v4 = v2
    assert(VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap == Map(1L -> 42L))
    VersionedTable.expire(spark, root, keepLast = 1)
    assert(VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap == Map(1L -> 42L))
  }

  test("non-constant defaults refuse: column refs and non-deterministic expressions") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df2(1L -> 10L))
    intercept[Exception] {
      VersionedTable.addColumn(spark, root, "bad1", "BIGINT", Some("v + 1"))
    }
    intercept[Exception] {
      VersionedTable.addColumn(spark, root, "bad2", "DOUBLE", Some("rand()"))
    }
    // expression defaults that ARE deterministic constants fold fine
    VersionedTable.addColumn(spark, root, "ok", "BIGINT", Some("21 * 2"))
    assert(VersionedTable.read(spark, root)
      .select("ok").collect().head.getLong(0) == 42L)
  }
}
