package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** The batch change-feed face (spark.read + readChangeFeed +
  * startingVersion/endingVersion) and the contract-release fixes the
  * round-13 self-review found. Under test: per-version exact
  * _commit_version stamps; a rename INSIDE the range surfaces every
  * change under the ENDING version's name (never two half-null
  * columns); metadata-only versions deliver nothing; an overwrite that
  * drops an identity/generated column releases its contract — appends
  * keep working and a re-added name never resurrects the old
  * expression. */
class TableChangesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_tc").resolve("t").toString

  test("batch feed: exact per-version stamps; renames align to the ending schema") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0)).toDF("id", "amt").coalesce(1))                 // v1
    VersionedTable.append(spark, root,
      Seq((2L, 20.0)).toDF("id", "amt").coalesce(1))                 // v2
    VersionedTable.renameColumn(spark, root, "amt", "amount")        // v3 (no rows)
    VersionedTable.append(spark, root,
      Seq((3L, 30.0)).toDF("id", "amount").coalesce(1))              // v4
    val feed = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("id", "amount", "_change_type", "_commit_version"),
      s"ONE amount column under the ending name, got ${feed.schema.fieldNames.toSeq}")
    val rows = feed.select("id", "amount", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSet
    assert(rows == Set((1L, 10.0, "insert", 1L), (2L, 20.0, "insert", 2L),
      (3L, 30.0, "insert", 4L)),
      s"pre-rename changes must surface under 'amount'; got $rows")
    // endingVersion bounds the range; v1 is the snapshot-as-inserts
    val first = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load(root)
    assert(first.count() == 1)
    // a delete shows with its pre-delete value
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L): Option[Any], Some(2L): Option[Any])),
      col("id") === 2L)                                              // v5
    val del = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", "5").load(root)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(del == Seq((2L, "delete", 5L)))
  }

  test("a rename CHAIN inside the range recovers data written under every alias") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0)).toDF("id", "x").coalesce(1))                   // v1: x
    VersionedTable.renameColumn(spark, root, "x", "y")               // v2
    VersionedTable.append(spark, root,
      Seq((2L, 20.0)).toDF("id", "y").coalesce(1))                   // v3: y
    VersionedTable.renameColumn(spark, root, "y", "z")               // v4
    VersionedTable.append(spark, root,
      Seq((3L, 30.0)).toDF("id", "z").coalesce(1))                   // v5: z
    val feed = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    assert(feed.schema.fieldNames.count(_ == "z") == 1 &&
      !feed.schema.fieldNames.exists(Set("x", "y")))
    val rows = feed.select("id", "z").as[(Long, Double)].collect().toSet
    assert(rows == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)),
      s"x-era AND y-era values must both surface under z, got $rows")
    // schema-only consultation must not force the union plan: cheap call
    assert(feed.schema.fieldNames.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
  }

  test("an overwrite dropping identity/generated columns releases their contracts") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0)).toDF("id", "v").coalesce(1))
    VersionedTable.addIdentityColumn(spark, root, "rid")
    VersionedTable.addGeneratedColumn(spark, root, "g", "double", "v * 2")
    VersionedTable.append(spark, root, Seq((2L, 20.0)).toDF("id", "v").coalesce(1))
    // overwrite WITHOUT rid/g: both contracts must release with the schema
    VersionedTable.overwrite(spark, root,
      Seq((5L, 50.0)).toDF("id", "v").coalesce(1))
    assert(VersionedTable.identityOf(spark, root).isEmpty,
      "a dropped identity column must not leave a dangling mark")
    assert(VersionedTable.generatedOf(spark, root).isEmpty,
      "a dropped generated column must not leave a dangling expression")
    // appends keep working (the dangling-ids bug wedged this forever)
    VersionedTable.append(spark, root, Seq((6L, 60.0)).toDF("id", "v").coalesce(1))
    assert(VersionedTable.read(spark, root).count() == 2)
    // re-adding the generated column's NAME as a plain column must read
    // NULL for history — never the resurrected old expression
    VersionedTable.addColumn(spark, root, "g", "double")
    assert(VersionedTable.read(spark, root).filter($"g".isNotNull).count() == 0,
      "a re-added plain column must read NULL, not the old generated expression")
  }
}
