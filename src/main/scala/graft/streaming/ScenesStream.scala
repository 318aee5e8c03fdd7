package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.raster.CompositeMaxAggregator
import graft.sink.VersionedTable

/** Streaming raster maintenance: the max-value composite (q167's MVC)
  * kept current as scenes ARRIVE, instead of recomputed per batch job.
  *
  * Per micro-batch: aggregate the batch's scenes into a per-cell
  * partial composite ([[CompositeMaxAggregator]] — the merge is
  * associative and commutative, so a batch partial is a legal half of
  * the full fold), read the composite table's previous snapshot,
  * elementwise-merge the two (same (value, later-day) tie rule in
  * Column space), and publish via an idempotent transactional
  * OVERWRITE keyed by the micro-batch id — the counters (n_valid sums)
  * are not idempotent to re-apply, so exactly-once under batch replay
  * comes from the txn ledger, not from algebra.
  *
  * At 100 TB: per-batch work is batch-sized aggregation plus a
  * composite-sized merge (cells × tile — independent of how many scenes
  * ever streamed); concurrent readers keep snapshot isolation across
  * refreshes, and the composite's history time-travels like any other
  * versioned table.
  */
object ScenesStream {

  /** Elementwise merge of two composite states carried as
    * array<struct<v,d>> (max NDVI + winning day, null struct = never
    * observed) and array<long> (valid counts). */
  private def mergedCols: Seq[org.apache.spark.sql.Column] = {
    val pick = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      when(y.isNull, x).when(x.isNull, y)
        .when(x("v") > y("v") || (x("v") === y("v") && x("d") >= y("d")), x)
        .otherwise(y)
    Seq(
      when(col("a.md").isNull, col("b.md"))
        .when(col("b.md").isNull, col("a.md"))
        .otherwise(zip_with(col("a.md"), col("b.md"), pick)).as("md"),
      when(col("a.nv").isNull, col("b.nv"))
        .when(col("b.nv").isNull, col("a.nv"))
        .otherwise(zip_with(col("a.nv"), col("b.nv"), (x, y) => x + y)).as("nv"))
  }

  /** Batch partial: (cell, md: array<struct<v,d>>, nv: array<long>). */
  private def partialOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("cell"))
      .agg(CompositeMaxAggregator.column(col("px"), col("day")).as("c"))
      .select(col("cell"),
        zip_with(col("c.mx"), col("c.winDay"), (v, d) =>
          when(v.isNotNull, struct(v.as("v"), d.as("d")))).as("md"),
        col("c.nValid").as("nv"))

  /** Drain `landing` (parquet files of (cell, px array<double>, day int))
    * into the composite table at `targetRoot`. Call again with the same
    * checkpoint to fold in only NEW scene files. */
  def compositeStreaming(spark: SparkSession, landing: String, ckpt: String,
                         targetRoot: String, schema: StructType,
                         queryName: String = "graft_stream_composite"): Unit = {
    val stream = spark.readStream.schema(schema).parquet(landing)
    EventsStream.withStreamPartitions(spark, 8) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val part = partialOf(batch)
          val merged = VersionedTable.currentVersion(spark, targetRoot) match {
            case None => part
            case Some(v) =>
              VersionedTable.read(spark, targetRoot, Some(v)).as("a")
                .join(part.as("b"), col("a.cell") === col("b.cell"), "full_outer")
                .select(coalesce(col("a.cell"), col("b.cell")).as("cell") +:
                  mergedCols: _*)
          }
          // safe to write while reading the previous snapshot: data files
          // are immutable, the new version only ADDS files
          VersionedTable.overwriteTxn(spark, targetRoot, merged, batchId)
          ()
        }
        .option("checkpointLocation", ckpt)
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  /** The batch twin for parity checks: the composite of ALL scenes in
    * one fold, same output schema as the streamed table. */
  def compositeBatch(scenes: DataFrame): DataFrame = partialOf(scenes)
}
