package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.GraftNames
import graft.sink.VersionedTable

/** Streaming through CATALOG NAMES: `spark.readStream.table("graft.t")`
  * swaps to the V1 graft-versioned source (options pass through), and
  * the sink's `option("table", "graft.t")` is the name-addressed
  * writeStream spelling. CDF stays on the path face by contract. */
class NamedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def withWarehouse[T](f: String => T): T = {
    val w = Files.createTempDirectory("graft_namedstream").toString
    spark.conf.set(GraftNames.WarehouseConf, w)
    f(w)
  }

  test("readStream.table drains the named table like the path source") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.ns_src AS SELECT id AS k, id * 2 AS v " +
        "FROM range(5)")
      val root = GraftNames.resolveName(spark, "ns_src")
      VersionedTable.append(spark, root,
        spark.range(5, 8).select(col("id").as("k"),
          (col("id") * 2).as("v")))
      val out = Files.createTempDirectory("ns_out").toString
      val q = spark.readStream.table("graft.ns_src")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("ns_ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.read.parquet(out).select("k").as[Long]
        .collect().toSet
      assert(streamed == (0L to 7L).toSet, streamed.toString)
    }
  }

  test("reader options pass through; CDF and AS OF refuse on the named face") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.ns_opt AS SELECT id AS k FROM range(3)")
      val root = GraftNames.resolveName(spark, "ns_opt")
      VersionedTable.append(spark, root, spark.range(3, 6).toDF("k"))
      // startingVersion=3 skips the CTAS content (v1 create, v2 populate,
      // v3 append): only the appended rows stream
      val out = Files.createTempDirectory("ns_out2").toString
      val q = spark.readStream.option("startingVersion", "3")
        .table("graft.ns_opt")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("ns_ckpt2").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.read.parquet(out).select("k").as[Long].collect().toSet ==
        Set(3L, 4L, 5L))
      // the change feed stays on the path face (the named face cannot
      // carry _change_type)
      val e = intercept[Exception] {
        spark.readStream.option("readChangeFeed", "true")
          .table("graft.ns_opt").writeStream.format("noop")
          .option("checkpointLocation",
            Files.createTempDirectory("ns_ckpt3").toString)
          .start()
      }
      assert(e.getMessage.contains("change feed"), e.getMessage)
    }
  }

  test("sink option(table, name): name-addressed streaming writes, exactly once") {
    withWarehouse { _ =>
      spark.sql("CREATE TABLE graft.ns_sink (k BIGINT, v BIGINT)")
      val srcDir = Files.createTempDirectory("ns_in").toString
      spark.range(4).select(col("id").as("k"), (col("id") * 10).as("v"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      val q = spark.readStream.schema("k BIGINT, v BIGINT").parquet(srcDir)
        .writeStream.format("graft-versioned")
        .option("table", "graft.ns_sink")
        .option("checkpointLocation",
          Files.createTempDirectory("ns_ckpt4").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      val root = GraftNames.resolveName(spark, "ns_sink")
      assert(VersionedTable.read(spark, root).select("k").as[Long]
        .collect().toSet == (0L to 3L).toSet)
    }
  }
}
