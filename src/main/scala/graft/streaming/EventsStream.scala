package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest (SURVEY.md §2.11): the reference is batch-
  * only (its per-scene loop is micro-batch-like, reference main.py:118-139),
  * so the streaming surface is the engine's forward-looking parity path:
  * file-source stream → watermark → tumbling-window rollup → sink.
  *
  * At scale this is the standard continuous-ingest topology: new scene/
  * event files land in a directory, `maxFilesPerTrigger` paces ingestion,
  * the watermark bounds state, and `foreachBatch` drives the K3–K6 merge
  * writers exactly-once per epoch.
  */
object EventsStream {

  /** The parquet file-stream source requires a directory; the driver test
    * data is one file per table, so stage the file into a scratch dir
    * (what a real deployment has anyway: a landing directory files arrive
    * in). */
  def stageEvents(sfDir: String, copies: Int): String =
    stageDir(sfDir, "events", copies)

  private def stageDir(sfDir: String, table: String, copies: Int = 1): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory(s"graft_stream_$table")
    dir.toFile.deleteOnExit()
    (0 until copies).foreach { i =>
      Files.copy(Paths.get(s"$sfDir/$table.parquet"),
        dir.resolve(s"${table}_$i.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  /** Hourly tumbling-window rollup of the events table, executed as a real
    * streaming query over the parquet directory and drained synchronously
    * (memory sink, complete mode). Returns the final result table —
    * identical to the batch hourly rollup (verified against the same
    * DuckDB oracle as the batch query). */
  def hourlyRollupStreaming(spark: SparkSession, sfDir: String,
                            queryName: String = "graft_stream_rollup"): DataFrame = {
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir(sfDir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  /** foreachBatch merge sink (SURVEY.md §2.11): each micro-batch upserts
    * into a parquet target — the streaming side of the reference's
    * ON CONFLICT DO UPDATE loads. Counts ACCUMULATE across batches
    * (max event_id, summed n); exactly-once across restarts comes from
    * `checkpoint` — re-running with the same checkpoint skips processed
    * files, so the target is not double-counted.
    *
    * Target existence is checked explicitly: a read failure on an
    * existing target PROPAGATES (a swallowed error here would silently
    * reset accumulated state to the current batch). */
  def streamMergeInto(spark: SparkSession, sourceDir: String, targetPath: String,
                      checkpoint: String,
                      queryName: String = "graft_stream_merge"): Unit = {
    val batchSchema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
      .select(col("user_id"), col("event_id"), col("value"))
    val q = stream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = batch.groupBy("user_id")
          .agg(max(col("event_id")).as("event_id"), count(lit(1)).as("n"))
        val existing =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(targetPath)))
            spark.read.parquet(targetPath)  // real read errors propagate
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema)
        existing.unionByName(incoming)
          .groupBy("user_id")
          .agg(max(col("event_id")).as("event_id"), sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(targetPath + ".tmp")
        // rewrite target from the committed snapshot
        spark.read.parquet(targetPath + ".tmp")
          .write.mode("overwrite").parquet(targetPath)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stateful per-user running aggregate via the typed state API —
    * flatMapGroupsWithState with state = (count, sum-of-cents). Cents keep
    * the accumulation exact and order-independent (double addition in
    * arbitrary micro-batch order would be nondeterministic in the last
    * ulp; the oracle hash requires exactness). */
  def perUserTotalsStreaming(spark: SparkSession, sfDir: String,
                             queryName: String = "graft_stream_user"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .parquet(stageDir(sfDir, "events"))
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val counted = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Long)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0L))
          var c = c0; var cents = s0
          rows.foreach { r => c += 1; cents += math.round(r._2 * 100.0) }
          state.update((c, cents))
          Iterator((userId, c, cents))
      }.toDF("user_id", "n_events", "sum_cents")
    val q = counted.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = final state
    import org.apache.spark.sql.expressions.Window
    spark.table(queryName)
      .withColumn("_r", row_number().over(
        Window.partitionBy("user_id").orderBy(col("n_events").desc)))
      .filter(col("_r") === 1).drop("_r")
  }
}
