package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` hook a V1 streaming `Source` cannot avoid:
  * `MicroBatchExecution` asserts every `getBatch` result has
  * `isStreaming = true`, and the only way to mark a DataFrame so is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * the same call Spark's own file and socket sources make. This object
  * lives under `org.apache.spark.sql` purely to satisfy that access
  * qualifier (the established third-party-connector bridge pattern);
  * everything else in the engine stays on public APIs.
  */
object StreamingBridge {

  /** Re-wrap a batch DataFrame's physical rows as a streaming-tagged
    * frame with `schema`. The plan inside `df` (parquet scan of the
    * commit's new files) is preserved — only the streaming flag and the
    * declared schema change. */
  def asStreaming(spark: SparkSession, df: DataFrame, schema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  /** The inverse, for a streaming SINK: re-wrap a micro-batch's rows as
    * a plain batch frame so it can flow into a batch write path (the
    * commit protocol). Rows are defensively copied — the scan reuses
    * row objects. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd.map(_.copy())
    classic.internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
