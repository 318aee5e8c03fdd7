package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** GENERATED ALWAYS AS (expr) columns. Contract under test: the add is
  * metadata-only and historical rows compute the expression at read;
  * appends missing the column compute it at write; a supplied value
  * that diverges from the expression refuses atomically (null-safe —
  * NULL divergence refuses too, unlike user CHECKs); vectored UPDATE
  * recomputes the column when a source changes; rename/drop/widen of a
  * source column refuses; compaction materializes the value; the
  * contract time-travels, clones and survives manifest delta/checkpoint
  * round-trips. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_gen").resolve("t").toString

  test("metadata-only add: old files compute at read, appends compute at write") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").coalesce(1))
    val filesBefore = VersionedTable.filesOf(spark, root).toSet
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v * 2")
    assert(VersionedTable.filesOf(spark, root).toSet == filesBefore,
      "addGeneratedColumn must not touch a data file")
    assert(VersionedTable.generatedOf(spark, root) == Map("v2" -> "v * 2"))
    // historical rows: expression substituted at read
    assert(VersionedTable.read(spark, root).select("id", "v2")
      .as[(Long, Double)].collect().toSet == Set((1L, 20.0), (2L, 40.0)))
    // an append WITHOUT the column computes it at write
    VersionedTable.append(spark, root, Seq((3L, 30.0)).toDF("id", "v").coalesce(1))
    // an append WITH a consistent value passes
    VersionedTable.append(spark, root,
      Seq((4L, 40.0, 80.0)).toDF("id", "v", "v2").coalesce(1))
    assert(VersionedTable.read(spark, root).select("id", "v2")
      .as[(Long, Double)].collect().toSet ==
      Set((1L, 20.0), (2L, 40.0), (3L, 60.0), (4L, 80.0)))
    // time travel to the pre-add version reads the old schema
    assert(!VersionedTable.read(spark, root, Some(1))
      .schema.fieldNames.contains("v2"))
  }

  test("a divergent supplied value refuses atomically, even NULL") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0)).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v * 2")
    val before = VersionedTable.currentVersion(spark, root).get
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((2L, 20.0, 999.0)).toDF("id", "v", "v2").coalesce(1))
    }
    assert(e.getMessage.contains("generated:v2"))
    // NULL where the expression is non-null also refuses (null-safe <=>)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((3L, 30.0, None: Option[Double])).toDF("id", "v", "v2").coalesce(1))
    }
    assert(e2.getMessage.contains("generated:v2"))
    assert(VersionedTable.currentVersion(spark, root).contains(before))
    assert(VersionedTable.orphanFiles(spark, root).isEmpty,
      "refused writes must sweep their staged files")
  }

  test("vectored UPDATE of a source column recomputes the generated column") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v * 2")
    VersionedTable.updateWhereVectored(spark, root,
      Map("id" -> (Some(1L): Option[Any], Some(1L): Option[Any])),
      col("id") === 1L, Map("v" -> lit(100.0)))
    assert(VersionedTable.read(spark, root).select("id", "v", "v2")
      .as[(Long, Double, Double)].collect().toSet ==
      Set((1L, 100.0, 200.0), (2L, 20.0, 40.0)),
      "v2 must recompute over the post-SET row")
  }

  test("source-column DDLs refuse; dropping the generated column removes the contract") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1, 10)).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "int", "v + 1")
    assert(intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "v", "w")
    }.getMessage.contains("generated column v2"))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "v")
    }.getMessage.contains("generated column v2"))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.alterColumnType(spark, root, "v", "bigint")
    }.getMessage.contains("generated column v2"))
    // chained generated/default references refuse at add time
    assert(intercept[IllegalArgumentException] {
      VersionedTable.addGeneratedColumn(spark, root, "v3", "int", "v2 + 1")
    }.getMessage.contains("must not reference"))
    // nondeterministic expressions refuse
    assert(intercept[IllegalArgumentException] {
      VersionedTable.addGeneratedColumn(spark, root, "r", "double", "rand()")
    }.getMessage.contains("deterministic"))
    // dropping the generated column itself removes the contract
    VersionedTable.dropColumn(spark, root, "v2")
    assert(VersionedTable.generatedOf(spark, root).isEmpty)
    VersionedTable.renameColumn(spark, root, "v", "w") // now legal
  }

  test("compaction materializes; the contract survives rollback, clone and checkpoints") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 1.0)).toDF("id", "v").repartition(2))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v + 0.5")
    VersionedTable.append(spark, root, Seq((2L, 2.0)).toDF("id", "v").coalesce(1))
    val vGen = VersionedTable.currentVersion(spark, root).get
    VersionedTable.compact(spark, root, targetBytes = 1L << 30)
    assert(VersionedTable.read(spark, root).select("v2").as[Double]
      .collect().toSet == Set(1.5, 2.5))
    // several more commits cross a delta/checkpoint boundary (every 8th
    // is a full manifest) — gens must survive both encodings
    (3 to 10).foreach(i => VersionedTable.append(spark, root,
      Seq((i.toLong, i.toDouble)).toDF("id", "v").coalesce(1)))
    assert(VersionedTable.generatedOf(spark, root) == Map("v2" -> "v + 0.5"))
    assert(VersionedTable.read(spark, root).filter($"id" === 10L)
      .select("v2").as[Double].head() == 10.5)
    // rollback to the post-add version restores the contract intact
    VersionedTable.rollback(spark, root, vGen)
    assert(VersionedTable.generatedOf(spark, root) == Map("v2" -> "v + 0.5"))
    // clone carries it
    val dst = Files.createTempDirectory("graft_gen").resolve("c").toString
    VersionedTable.cloneShallow(spark, root, dst)
    assert(VersionedTable.generatedOf(spark, dst) == Map("v2" -> "v + 0.5"))
    assert(VersionedTable.read(spark, dst).select("v2").as[Double]
      .collect().toSet == Set(1.5, 2.5))
  }

  test("merge-evolve: a source lacking the generated column recomputes it for inserts") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 10.0)).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v * 2")
    // source supplies only (id, v): matched row 1 updates, row 5 inserts;
    // v2 must recompute for BOTH (a target join would NULL the insert)
    VersionedTable.mergeIntoEvolve(spark, root,
      Seq((1L, 11.0), (5L, 50.0)).toDF("id", "v").coalesce(1), Seq("id"))
    assert(VersionedTable.read(spark, root).select("id", "v2")
      .as[(Long, Double)].collect().toSet == Set((1L, 22.0), (5L, 100.0)))
  }

  test("a generated column can BE the partition layout (the Delta recipe)") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, "2024-03-05"), (2L, "2024-03-06"))
        .toDF("id", "day_str").coalesce(1))
    // yr_mo derives from day_str; the layout then partitions on it —
    // appends compute the value at write and land under its hive dirs
    VersionedTable.addGeneratedColumn(spark, root, "yr_mo", "string",
      "substring(day_str, 1, 7)")
    VersionedTable.setPartitionLayout(spark, root, Seq("yr_mo"))
    VersionedTable.append(spark, root,
      Seq((3L, "2024-04-01"), (4L, "2024-03-07"))
        .toDF("id", "day_str").coalesce(1))
    // the appended files landed under yr_mo=... directories
    val newFiles = VersionedTable.filesOf(spark, root)
      .filter(_.contains("yr_mo="))
    assert(newFiles.nonEmpty, "appends must land under the generated dirs")
    // pruning on the GENERATED column opens only the matching cell
    // (+ pre-layout files, which are never wrongly pruned)
    val pruned = VersionedTable.prunedFiles(spark, root,
      Map("yr_mo" -> (Some("2024-04"): Option[Any],
        Some("2024-04"): Option[Any])))
    assert(!pruned.exists(_.contains("yr_mo=2024-03")),
      s"the 2024-03 cell must prune away, got $pruned")
    assert(VersionedTable.read(spark, root)
      .filter($"yr_mo" === "2024-04").select("id").as[Long]
      .collect().toSeq == Seq(3L))
    // full read: history computes the value, new files carry it
    assert(VersionedTable.read(spark, root).filter($"yr_mo".startsWith("2024"))
      .count() == 4)
  }

  test("time-dependent expressions refuse: per-query 'deterministic' is not per-table") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, java.sql.Date.valueOf("2024-01-02"))).toDF("id", "d").coalesce(1))
    // Catalyst reports current_date()/now() deterministic (fixed per
    // query) — but read-time substitution re-evaluates per SCAN, so the
    // same historical row would drift day to day. All refused.
    for (e <- Seq("current_date()", "current_timestamp()", "now()",
        "datediff(current_date(), d)"))
      assert(intercept[IllegalArgumentException] {
        VersionedTable.addGeneratedColumn(spark, root, "g", "string", e)
      }.getMessage.contains("evaluation time"), s"expr $e must refuse")
    // defaults read-time substitute the same way: same refusal
    assert(intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "c", "date",
        default = Some("current_date()"))
    }.getMessage.contains("evaluation time"))
    // the plain time-independent forms still work
    VersionedTable.addGeneratedColumn(spark, root, "yr", "int", "year(d)")
    assert(VersionedTable.read(spark, root).select("yr").as[Int].head() == 2024)
  }

  test("overwrite refuses cleanly when a kept gen/CHECK references a dropped column") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 2.0)).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "v2", "double", "v * 2")
    val vBefore = VersionedTable.currentVersion(spark, root).get
    val dataBefore = VersionedTable.filesOf(spark, root).toSet
    // replacement schema keeps the generated column but drops its SOURCE:
    // must be the documented refusal BEFORE staging (not an
    // AnalysisException from genChecks after files were written)
    val ex = intercept[IllegalArgumentException] {
      VersionedTable.overwrite(spark, root,
        Seq((1L, 4.0)).toDF("id", "v2").coalesce(1))
    }
    assert(ex.getMessage.contains("generated column v2") &&
      ex.getMessage.contains("v"), ex.getMessage)
    assert(VersionedTable.currentVersion(spark, root).contains(vBefore))
    // nothing staged: the refusal fires before any file is written
    def allParquet(d: java.io.File): Set[String] = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
      kids.filter(_.isFile).map(_.getName).filter(_.endsWith(".parquet")).toSet ++
        kids.filter(_.isDirectory).flatMap(allParquet)
    }
    assert(allParquet(new java.io.File(root)) ==
      dataBefore.map(_.split('/').last),
      "refusal must not leak staged files")
    // same class of refusal for a CHECK whose column the schema drops
    VersionedTable.dropColumn(spark, root, "v2")
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    assert(intercept[IllegalArgumentException] {
      VersionedTable.overwrite(spark, root, Seq(Tuple1(9L)).toDF("id").coalesce(1))
    }.getMessage.contains("CHECK constraint v_pos"))
  }

  test("SQL face: add_generated_column and generated_columns procedures") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 3.0)).toDF("id", "v").coalesce(1))
    spark.sql(
      s"CALL graft.add_generated_column('$root', 'v2', 'double', 'v * 10')")
    val rows = spark.sql(s"CALL graft.generated_columns('$root')")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq("v2" -> "v * 10"))
    assert(VersionedTable.read(spark, root).select("v2").as[Double]
      .head() == 30.0)
  }
}
