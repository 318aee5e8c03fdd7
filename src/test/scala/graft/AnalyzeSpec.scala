package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** CALL graft.analyze — statistics from metadata alone. Contract under
  * test: exact live rows and null counts from footer stats; nulls go
  * survivor-exact (not footer-stale) after a vectored delete; NDV is
  * -1 until indexHll and a sane estimate after; zero data scanned
  * (pinned indirectly: the numbers come straight off the manifest). */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("rows/nulls/bounds exact from stats; NDV from the HLL index; DV-aware") {
    val root = Files.createTempDirectory("graft_an").resolve("t").toString
    val df = (1L to 1000L).map(i =>
      (i, if (i % 10 == 0) None else Some(i % 97), s"s$i"))
      .toDF("id", "v", "tag")
    VersionedTable.create(spark, root, df.repartition(3))
    val byCol = VersionedTable.analyzeTable(spark, root, Seq("id", "v"))
      .map(r => r._1 -> r).toMap
    val (_, n, nn, lo, hi, ndv) = byCol("id")
    assert(n == 1000L && nn == 0L && lo == "1" && hi == "1000")
    assert(ndv == -1L, "un-indexed NDV must refuse, never guess")
    assert(byCol("v")._3 == 100L, "exact null count for v")
    // index, then the NDV estimate lands near the true 96 distinct
    VersionedTable.indexHll(spark, root, Seq("id", "v"))
    val ndv2 = VersionedTable.analyzeTable(spark, root, Seq("v")).head._6
    assert(ndv2 > 48 && ndv2 < 192, s"HLL estimate of 96 distinct, got $ndv2")
    // vectored delete: live rows drop; v's nulls are survivor-exact
    // only if the refreshed stats cover it (long-domain: they do)
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(1L): Option[Any], Some(100L): Option[Any])),
      col("id") <= 100L)
    val after = VersionedTable.analyzeTable(spark, root, Seq("id", "v"))
      .map(r => r._1 -> r).toMap
    assert(after("id")._2 == 900L, "live row count under DVs")
    assert(after("v")._3 == 90L,
      s"survivor-exact nulls (10 of v's 100 nulls were deleted), got ${after("v")._3}")
    // the SQL face
    val rows = spark.sql(s"CALL graft.analyze('$root', 'id')")
      .as[(String, Long, Long, String, String, Long)].collect()
    assert(rows.head._2 == 900L)
  }

  test("histogram: zone-map spread, exact under a range-clustered layout") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_an_hist").resolve("t").toString
    import spark.implicits._
    // three disjoint files: [0,99], [100,199], [200,399] — twice the mass
    // in the last file's span
    VersionedTable.create(spark, root,
      (0L until 100L).map(k => (k, "a")).toDF("id", "s").coalesce(1))
    VersionedTable.append(spark, root,
      (100L until 200L).map(k => (k, "b")).toDF("id", "s").coalesce(1))
    VersionedTable.append(spark, root,
      (200L until 400L).map(k => (k, "c")).toDF("id", "s").coalesce(1))
    val h = VersionedTable.histogramOf(spark, root, "id", 4)
    assert(h.map(_._1) == Seq(0, 1, 2, 3))
    assert(h.head._2 == 0.0 && h.last._3 == 399.0)
    // each ~100-wide bucket holds ~100 rows (uniform data): within 5%
    h.foreach { case (_, _, _, est) =>
      assert(math.abs(est - 100.0) < 5.0, s"got $h") }
    assert(math.abs(h.map(_._4).sum - 400.0) < 1e-6, "mass is conserved")
    // a vectored delete shifts mass via survivor counts (file-granular)
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(0L): Option[Any], Some(99L): Option[Any])),
      col("id") <= 99L)
    val h2 = VersionedTable.histogramOf(spark, root, "id", 4)
    assert(h2.head._2 == 100.0,
      s"a fully-vectored file contributes nothing — range starts at the " +
        s"survivors: $h2")
    assert(math.abs(h2.map(_._4).sum - 300.0) < 1e-6)
    // the SQL face; string columns refuse instead of guessing
    assert(spark.sql(s"CALL graft.histogram('$root', 'id', 4)").count() == 4)
    assert(intercept[IllegalArgumentException] {
      VersionedTable.histogramOf(spark, root, "s", 4)
    }.getMessage.contains("numeric"))
  }
}
