package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.VersionedTable

/** Streaming CDC apply — q97's changelog-fold as a REAL streaming query
  * against a versioned base table: the orders-derived upsert/delete
  * changelog arrives through a file stream; each micro-batch reduces to
  * its last op per key (window within the batch) and applies upserts AND
  * deletes as ONE [[VersionedTable.mergeInto]] commit under the batch's
  * transaction id — exactly-once under replay, write amplification
  * bounded by the batch's key range via the manifest stats.
  *
  * Batch-boundary semantics: later micro-batches win over earlier ones
  * per key — correct when the changelog stream is sequence-ordered
  * across batches (the Kafka-partition-per-key layout a real CDC feed
  * has); the staged landing dir here is one file = one batch, so the
  * drained result equals the batch q97 relation exactly (its oracle IS
  * q97's).
  *
  * At 100 TB: the base is the versioned customer dimension; a day's CDC
  * batch rewrites only the files its key range touches, concurrent
  * readers keep their snapshot, and a crashed/replayed batch cannot
  * double-apply.
  */
object CdcStream {

  def cdcApplyStreaming(spark: SparkSession, sfDir: String,
      queryName: String = "graft_stream_cdc"): DataFrame = {
    val base = graft.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal").as("bal"), lit("base").as("src"))
    val work = EventsStream.scratchDir("graft_cdc")
    val root = work.resolve("t").toString
    VersionedTable.create(spark, root, base)
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(EventsStream.stageDir(sfDir, "orders"))
    EventsStream.withStreamPartitions(spark, 8) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val chg = batch.select(
            col("o_custkey").as("k"), col("o_orderkey").as("seq"),
            when(col("o_orderkey") % 97 === 0, "D").otherwise("U").as("op"),
            col("o_totalprice").as("val"))
          // last writer wins WITHIN the batch (q97's whole-changelog
          // window, scoped to what this batch delivers)
          val last = chg.withColumn("rn", row_number().over(
              Window.partitionBy("k").orderBy(col("seq").desc)))
            .filter(col("rn") === 1).drop("rn")
          val ups = last.filter(col("op") === "U")
            .select(col("k").as("c_custkey"), col("val").as("bal"),
              lit("cdc").as("src"))
          val dels = last.filter(col("op") === "D")
            .select(col("k").as("c_custkey"))
          VersionedTable.mergeInto(spark, root, ups, Seq("c_custkey"),
            Some(dels), Some(batchId))
          ()
        }
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    VersionedTable.read(spark, root)
  }
}
