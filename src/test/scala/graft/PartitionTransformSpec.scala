package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sink.{Layout, VersionedTable}

/** Partition TRANSFORMS (days/months/hours/years, bucket, truncate) on
  * the versioned table — the Iceberg partition-transform recipe.
  * Contract under test: transform entries write synthetic `_p_…` hive
  * directories while the SOURCE column stays in the data file (footer
  * stats intact, no schema leakage on read); days clustering makes
  * time-range pruning effective; bucket layouts answer point lookups
  * opening ~1/n of the files through the write/prune hash lockstep;
  * truncate buckets strings by prefix and ints by floor-to-multiple;
  * rewrites migrate to the transform layout; vectored DMLs work over
  * transform dirs; illegal transforms refuse at DDL time. */
class PartitionTransformSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pxf").resolve("t").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def evdf(rows: (Long, Timestamp, Long, String)*) =
    rows.toSeq.toDF("id", "ts", "uid", "kind").coalesce(1)

  private val week = Seq.tabulate(14) { i =>
    (i.toLong, ts(f"2024-03-${1 + i / 2}%02d 0${i % 2 * 6 + 3}:00:00"),
      (i % 5).toLong, if (i % 2 == 0) "click" else "view")
  }

  test("days layout: synthetic dirs, clean round-trip, range pruning works") {
    val root = freshRoot()
    VersionedTable.create(spark, root, evdf(week.take(4): _*))        // v1 flat
    VersionedTable.setPartitionLayout(spark, root, Seq("days(ts)"))   // v2
    VersionedTable.append(spark, root,
      evdf(week.drop(4): _*).repartition(col("ts")))                  // v3
    val files = VersionedTable.filesOf(spark, root)
    assert(files.exists(_.contains("_p_ts_day=2024-03-")),
      s"expected day dirs, got $files")
    // the read leaks no synthetic column and loses no row
    val got = VersionedTable.read(spark, root)
    assert(got.schema.fieldNames.toSeq == Seq("id", "ts", "uid", "kind"))
    assert(got.count() == 14 && got.select(sum("id")).first().getLong(0) == 91L)
    // time-range pruning: a one-day probe must not open every file
    // (footer stats on ts — the source column stays in the files)
    val lo = java.time.LocalDateTime.parse("2024-03-05T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC)
    val dayMicros = 86400L * 1000000L
    val loU = lo.getEpochSecond * 1000000L
    val pruned = VersionedTable.prunedFiles(spark, root,
      Map("ts" -> (Some(loU), Some(loU + dayMicros - 1))))
    assert(pruned.size < files.size,
      s"one-day probe kept ${pruned.size}/${files.size} files")
    // pruning is sound: the pruned read + exact filter = the full answer
    val viaPrune = VersionedTable.readWhere(spark, root,
        Map("ts" -> (Some(loU), Some(loU + dayMicros - 1))))
      .filter(col("ts") >= lit(ts("2024-03-05 00:00:00")) &&
        col("ts") < lit(ts("2024-03-06 00:00:00")))
      .collect().map(_.getLong(0)).toSet
    assert(viaPrune == Set(8L, 9L))
  }

  test("bucket layout: point lookup opens ~1/n of the files, hash lockstep holds") {
    val root = freshRoot()
    VersionedTable.create(spark, root, evdf(week.take(2): _*))        // v1 flat
    VersionedTable.setPartitionLayout(spark, root, Seq("bucket(4, uid)"))
    VersionedTable.append(spark, root,
      evdf(week.drop(2): _*).repartition(col("uid")))                 // v3
    val files = VersionedTable.filesOf(spark, root)
    val bucketed = files.filter(_.contains("_p_uid_bucket4="))
    assert(bucketed.nonEmpty, s"expected bucket dirs, got $files")
    // every uid value: bucket pruning keeps the flat files + exactly
    // the matching bucket's files, and the read stays exact
    (0L to 4L).foreach { uid =>
      val keep = VersionedTable.bucketPrunedFiles(spark, root, "uid", Seq(uid))
      val flat = files.filterNot(_.contains("_p_uid_bucket4="))
      assert(keep.toSet.subsetOf(files.toSet) && flat.forall(keep.contains))
      val wantDirs = keep.filter(_.contains("_p_uid_bucket4=")).map(f =>
        f.split('/').find(_.startsWith("_p_uid_bucket4=")).get).distinct
      assert(wantDirs.size <= 1, s"uid=$uid matched dirs $wantDirs")
      val got = VersionedTable.readBucketEq(spark, root, "uid", uid)
        .filter(col("uid") === uid).collect().map(_.getLong(0)).toSet
      val want = week.filter(_._3 == uid).map(_._1).toSet
      assert(got == want, s"uid=$uid: got $got want $want")
    }
    // some uid must genuinely prune (4 buckets over 5 uids)
    val kept = VersionedTable.bucketPrunedFiles(spark, root, "uid", Seq(0L))
    assert(kept.size < files.size, "bucket pruning never pruned a file")
  }

  test("bucket layout survives a COLD manifest re-parse (comma inside the transform)") {
    // `bucket(4, uid)` carries a comma: a comma-splitting manifest
    // parse re-reads the committed layout as corrupt fragments
    // ('bucket(4'), and every write on a COLD reader (new cluster, or
    // an evicted cache entry) then fails at Layout.parse — the warm
    // in-JVM cache masks it, so this test drops the cache explicitly
    val root = freshRoot()
    VersionedTable.create(spark, root, evdf(week.take(2): _*))        // v1
    VersionedTable.setPartitionLayout(spark, root, Seq("bucket(4, uid)"))
    VersionedTable.append(spark, root, evdf(week.drop(2): _*))        // v3
    VersionedTable.dropManifestCache()
    assert(VersionedTable.read(spark, root).count() == week.size,
      "cold read parses the transform layout intact")
    VersionedTable.dropManifestCache()
    VersionedTable.append(spark, root,
      evdf((100L, ts("2024-03-09 03:00:00"), 1L, "click")))           // v4
    assert(VersionedTable.read(spark, root).count() == week.size + 1,
      "cold write stages under the parsed transform layout")
    VersionedTable.dropManifestCache()
    assert(spark.sql(s"SHOW CREATE TABLE '$root'").collect()
      .map(_.getString(0)).mkString("\n").contains("bucket(4, uid)"),
      "SHOW CREATE renders the transform exactly as declared")
  }

  test("truncate layout: string prefixes and integer floor-to-multiple") {
    val root = freshRoot()
    val df = Seq((1L, "alpha", 7L), (2L, "alps", -3L), (3L, "beta", 12L),
      (4L, "berry", 19L)).toDF("id", "s", "v").coalesce(1)
    VersionedTable.create(spark, root, df,
      partitionBy = Seq("truncate(2, s)", "truncate(10, v)"))
    val files = VersionedTable.filesOf(spark, root)
    assert(files.exists(_.contains("_p_s_trunc2=al")) &&
      files.exists(_.contains("_p_s_trunc2=be")), s"prefix dirs: $files")
    // Iceberg floor semantics: -3 -> -10, 7 -> 0, 12/19 -> 10
    assert(files.exists(_.contains("_p_v_trunc10=-10")) &&
      files.exists(_.contains("_p_v_trunc10=0")) &&
      files.exists(_.contains("_p_v_trunc10=10")), s"floor dirs: $files")
    assert(VersionedTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "alpha", 7L), (2L, "alps", -3L), (3L, "beta", 12L),
        (4L, "berry", 19L)))
  }

  test("compaction migrates to the transform layout; vectored DML spans mixed dirs") {
    val root = freshRoot()
    VersionedTable.create(spark, root, evdf(week.take(8): _*))        // v1 flat
    VersionedTable.setPartitionLayout(spark, root,
      Seq("days(ts)", "bucket(2, uid)"))                              // v2
    VersionedTable.append(spark, root, evdf(week.drop(8): _*))        // v3
    // a vectored delete over BOTH layouts (flat v1 files + transform
    // dirs) must hit exactly the predicate rows
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("kind") === "view")                                         // v4
    assert(VersionedTable.read(spark, root).count() == 7)
    VersionedTable.compact(spark, root)                               // v5
    val files = VersionedTable.filesOf(spark, root)
    assert(files.forall(f =>
      f.contains("_p_ts_day=") && f.contains("_p_uid_bucket2=")),
      s"compaction left un-migrated files: $files")
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getLong(0)).toSet == week.filter(_._4 == "click").map(_._1).toSet)
    // time travel: v1 reads the flat layout untouched
    assert(VersionedTable.read(spark, root, Some(1)).count() == 8)
  }

  test("illegal transforms refuse at DDL time; rename/drop of a source refuses") {
    val root = freshRoot()
    VersionedTable.create(spark, root, evdf(week.take(2): _*))
    def refused(cols: String*): Boolean =
      scala.util.Try(VersionedTable.setPartitionLayout(spark, root, cols))
        .isFailure
    assert(refused("days(nope)"), "unknown source column")
    assert(refused("days(kind)"), "days over a string")
    assert(refused("hours(id)"), "hours over a long")
    assert(refused("bucket(0, uid)"), "zero buckets")
    assert(refused("truncate(3, ts)"), "truncate over a timestamp")
    assert(refused("shard(4, uid)"), "unknown transform name")
    assert(refused("days(ts)", "days(ts)"), "duplicate dir keys")
    VersionedTable.setPartitionLayout(spark, root, Seq("days(ts)", "bucket(2, uid)"))
    assert(scala.util.Try(
      VersionedTable.renameColumn(spark, root, "ts", "when")).isFailure)
    assert(scala.util.Try(
      VersionedTable.dropColumn(spark, root, "uid")).isFailure)
    // the SQL face parses transform commas correctly
    assert(Layout.split("days(ts), bucket(8, uid), kind") ==
      Seq("days(ts)", "bucket(8, uid)", "kind"))
  }
}
