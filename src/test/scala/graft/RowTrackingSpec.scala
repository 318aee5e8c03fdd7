package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable
import graft.sink.VersionedTable.{RowIdCol, PropRowTracking, PropClusterBy,
  PropClusterCurve}

/** Stable row ids (the Delta row-tracking / Iceberg-v3 row-lineage
  * analog) + the table-properties plumbing they ride on. Contract under
  * test: enable = metadata add + one backfill rewrite, ids unique and
  * non-null from then on; every CoW rewrite (update/compact/zorder)
  * PRESERVES ids; merge and applyChanges preserve matched keys' ids and
  * assign fresh ones to inserts; properties survive manifest
  * delta/checkpoint round-trips, rename re-keys clusterBy, dropping
  * _row_id disables tracking; compact honors recorded clustering. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rowtrack").resolve("t").toString

  private def idsByKey(root: String): Map[Long, Long] =
    VersionedTable.read(spark, root).select("k", RowIdCol)
      .as[(Long, Long)].collect().toMap

  test("enable on an existing table backfills unique non-null ids") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v").repartition(3))
    VersionedTable.enableRowTracking(spark, root)
    assert(VersionedTable.propertiesOf(spark, root)
      .get(PropRowTracking).contains("true"))
    assert(VersionedTable.identityOf(spark, root).contains(RowIdCol))
    val ids = idsByKey(root)
    assert(ids.size == 100 && ids.values.toSet.size == 100,
      "backfill must assign a unique id to every existing row")
    // an empty-noCol second backfill is a no-op
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.backfillRowIds(spark, root) == v)
    // appends engine-assign without supplying the column
    VersionedTable.append(spark, root,
      Seq((101L, "new")).toDF("k", "v").coalesce(1))
    val ids2 = idsByKey(root)
    assert(ids2.size == 101 && ids2.values.toSet.size == 101)
    assert(ids2.filterKeys(_ <= 100L).toMap == ids,
      "an append must not disturb existing ids")
  }

  test("ids survive update, compact and zorder; merge preserves matched keys") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 60L).map(k => (k, k * 1.0, k % 7)).toDF("k", "v", "g")
        .repartition(4))
    VersionedTable.enableRowTracking(spark, root)
    val before = idsByKey(root)
    // CoW update: _row_id not in SET, so it must travel with the row
    VersionedTable.updateWhereVectored(spark, root,
      Map("k" -> (Some(1L): Option[Any], Some(30L): Option[Any])),
      col("k") <= 30L, Map("v" -> (col("v") * 10)))
    assert(idsByKey(root) == before, "update must preserve every id")
    VersionedTable.compact(spark, root, targetBytes = 1L << 30)
    assert(idsByKey(root) == before, "compact must preserve every id")
    VersionedTable.zorderBy(spark, root, Seq("k", "g"))
    assert(idsByKey(root) == before, "zorder must preserve every id")
    // merge WITHOUT _row_id: matched keys keep ids, inserts get fresh
    VersionedTable.mergeIntoVectored(spark, root,
      Seq((5L, 500.0, 5L), (61L, 610.0, 5L)).toDF("k", "v", "g"),
      Seq("k"))
    val after = idsByKey(root)
    assert(after(5L) == before(5L),
      "merge must preserve the matched key's id")
    assert(!before.values.toSet.contains(after(61L)),
      "the inserted key needs a FRESH id")
    assert(after.values.toSet.size == after.size, "ids stay unique")
    // a CDF consumer pairs the update's delete/insert by id
    assert((before.keySet + 61L) == after.keySet)
    // the tracked path holds the SAME write contract as the untracked
    // one: an extra source column refuses up front (never silently
    // select-dropped), a missing one gets the contract error — not a
    // raw unresolved-column AnalysisException out of the id join
    val extra = intercept[IllegalArgumentException] {
      VersionedTable.mergeIntoVectored(spark, root,
        Seq((5L, 1.0, 5L, "x")).toDF("k", "v", "g", "oops"), Seq("k"))
    }
    assert(extra.getMessage.contains("schema mismatch"), extra.getMessage)
    val missing = intercept[IllegalArgumentException] {
      VersionedTable.mergeIntoVectored(spark, root,
        Seq((5L, 1.0)).toDF("k", "v"), Seq("k"))
    }
    assert(missing.getMessage.contains("schema mismatch"), missing.getMessage)
  }

  test("applyChanges without _row_id preserves matched ids, seq-guards intact") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "seq", "v").coalesce(1))
    VersionedTable.enableRowTracking(spark, root)
    val before = idsByKey(root)
    VersionedTable.applyChanges(spark, root,
      Seq((1L, 20L, "a2"), (3L, 5L, "c")).toDF("k", "seq", "v").coalesce(1),
      Seq("k"), "seq")
    val after = idsByKey(root)
    assert(after(1L) == before(1L), "the upserted key keeps its id")
    assert(after(2L) == before(2L), "an untouched key keeps its id")
    assert(!before.values.toSet.contains(after(3L)), "insert = fresh id")
    // a STALE change must not land even though the id machinery joined
    VersionedTable.applyChanges(spark, root,
      Seq((1L, 15L, "stale")).toDF("k", "seq", "v").coalesce(1),
      Seq("k"), "seq")
    assert(VersionedTable.read(spark, root).filter($"k" === 1L)
      .select("v").as[String].head() == "a2")
  }

  test("the change feed pairs an update's delete/insert images by _row_id") {
    // the contract row tracking exists FOR: a CDF consumer sees a CoW
    // update as remove-old + insert-new at one version, and the shared
    // _row_id — not any natural key — is what pairs the two images
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").coalesce(1))
    VersionedTable.enableRowTracking(spark, root)
    val vTracked = VersionedTable.currentVersion(spark, root).get
    VersionedTable.updateWhereVectored(spark, root,
      Map("k" -> (Some(2L): Option[Any], Some(2L): Option[Any])),
      col("k") === 2L, Map("v" -> (col("v") + 1000)))
    val vUpd = VersionedTable.currentVersion(spark, root).get
    val feed = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", vUpd.toString).load(root)
      .select(col(RowIdCol), col("k"), col("v"), col("_change_type"))
      .as[(Long, Long, Double, String)].collect()
    val dels = feed.filter(_._4 == "delete")
    val ins = feed.filter(_._4 == "insert")
    assert(dels.map(r => (r._2, r._3)).toSet == Set((2L, 20.0)))
    assert(ins.map(r => (r._2, r._3)).toSet == Set((2L, 1020.0)))
    assert(dels.head._1 == ins.head._1,
      "the update's two images must share ONE _row_id")
    // ids assigned by the enable are visible from the tracked version on
    assert(VersionedTable.read(spark, root, Some(vTracked))
      .select(RowIdCol).as[Long].collect().toSet.size == 3)
  }

  test("properties: faces, survival, rename re-keys, drop disables") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 20L).map(k => (k, k % 3, s"x$k")).toDF("a", "b", "s")
        .coalesce(1))
    spark.sql(s"CALL graft.set_property('$root', 'owner', 'ml-platform')")
    VersionedTable.setClusteringKeys(spark, root, Seq("a", "b"))
    val props = spark.sql(s"CALL graft.properties('$root')")
      .as[(String, String)].collect().toMap
    assert(props("owner") == "ml-platform" && props(PropClusterBy) == "a,b")
    // validation: unknown column, partition overlap, engine-managed key
    assert(intercept[IllegalArgumentException] {
      VersionedTable.setClusteringKeys(spark, root, Seq("nope"))
    }.getMessage.contains("unknown column"))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.setTableProperty(spark, root, PropRowTracking, "true")
    }.getMessage.contains("enableRowTracking"))
    // rename re-keys the clusterBy entry
    VersionedTable.renameColumn(spark, root, "b", "bucket")
    assert(VersionedTable.clusteringKeysOf(spark, root) == Seq("a", "bucket"))
    // properties survive enough commits to cross a checkpoint + deltas
    (1 to 12).foreach(i => VersionedTable.append(spark, root,
      Seq((100L + i, 1L, "y")).toDF("a", "bucket", "s").coalesce(1)))
    assert(VersionedTable.propertiesOf(spark, root)("owner") == "ml-platform")
    // dropping a cluster key trims the property; dropping the last
    // key retires it
    VersionedTable.dropColumn(spark, root, "bucket")
    assert(VersionedTable.clusteringKeysOf(spark, root) == Seq("a"))
    // unset face
    spark.sql(s"CALL graft.unset_property('$root', 'owner')")
    assert(!VersionedTable.propertiesOf(spark, root).contains("owner"))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.unsetTableProperty(spark, root, "owner")
    }.getMessage.contains("no property"))
    // row tracking: rename refuses, drop disables
    VersionedTable.enableRowTracking(spark, root)
    assert(intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, RowIdCol, "rid")
    }.getMessage.contains("row tracking"))
    VersionedTable.dropColumn(spark, root, RowIdCol)
    assert(!VersionedTable.propertiesOf(spark, root).contains(PropRowTracking))
    assert(!VersionedTable.identityOf(spark, root).contains(RowIdCol))
  }

  test("compact honors recorded clustering keys; zorder records its layout") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      (1L to 400L).map(k => (k, (k * 37) % 100, k * 1.0))
        .toDF("x", "y", "v").repartition(4))
    VersionedTable.zorderBy(spark, root, Seq("x", "y"),
      targetBytes = 16L * 1024)
    val props = VersionedTable.propertiesOf(spark, root)
    assert(props(PropClusterBy) == "x,y" && props(PropClusterCurve) == "morton")
    // a parameterless maintenance compact re-optimizes ALONG THE CURVE
    // (delegates to zorder), never lexicographically
    VersionedTable.append(spark, root,
      Seq((401L, 1L, 1.0)).toDF("x", "y", "v").coalesce(1))
    VersionedTable.compact(spark, root, targetBytes = 16L * 1024)
    val ops = VersionedTable.describeHistory(spark, root)
      .select("op").as[String].collect().toSeq
    assert(ops.count(_ == "zorder") >= 2,
      s"compact on a curve-clustered table must re-zorder, ops: $ops")
    assert(VersionedTable.read(spark, root).count() == 401)
    // an hourly OPTIMIZE loop must not full-rewrite on every tick: with
    // the head commit already the clustering rewrite, compact no-ops
    val v = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.compact(spark, root, targetBytes = 16L * 1024) == v,
      "parameterless compact right after the rewrite is a no-op")
  }

  test("overwrite keeps tracking alive: fresh ids for the new content") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    VersionedTable.enableRowTracking(spark, root)
    val oldIds = VersionedTable.read(spark, root)
      .select(RowIdCol).as[Long].collect().toSet
    // the business frame does NOT carry _row_id — the engine assigns
    VersionedTable.overwrite(spark, root,
      Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1))
    assert(VersionedTable.propertiesOf(spark, root)
      .get(PropRowTracking).contains("true"),
      "overwrite must not silently disable tracking")
    val newIds = VersionedTable.read(spark, root)
      .select(RowIdCol).as[Long].collect().toSet
    assert(newIds.size == 2 && newIds.intersect(oldIds).isEmpty,
      s"overwrite content is new rows = new ids; got $newIds vs $oldIds")
    // appends after the overwrite keep assigning uniquely
    VersionedTable.append(spark, root,
      Seq((5L, "e")).toDF("k", "v").coalesce(1))
    assert(VersionedTable.read(spark, root)
      .select(RowIdCol).as[Long].collect().toSet.size == 3)
  }
}
