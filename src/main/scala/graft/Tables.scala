package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver test data (TESTDATA.md).
  *
  * All queries read through here so the scan always goes through the
  * vectorized parquet reader with Catalyst pushdown (filters/column
  * pruning reach the scan — see SURVEY.md §4). At 100 TB the same call
  * pattern holds: one parquet dataset per table, partition-pruned by
  * directory layout; nothing here assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Session settings every entry point applies: if the testdata
    * generation wrote events.ts as parquet TIMESTAMP(NANOS) (not a legal
    * Spark type), read it as a nanos long and convert in [[events]];
    * harmless when the generation writes MICROS. */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // the engine's Catalyst surface (optimizer rules + SQL functions) —
    // builder-applied because spark.sql.extensions is a static conf
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    // the SQL maintenance face: CALL graft.compact(...) etc.
    "spark.sql.catalog.graft" -> "graft.catalog.GraftCatalog")

  /** Normalize an events frame's `ts` to a microsecond TimestampType on
    * the session's UTC clock — exactly what DuckDB surfaces from the same
    * file — across BOTH testdata generations: TIMESTAMP(NANOS) arrives as
    * a nanos BIGINT (under nanosAsLong; integer `div` truncates toward
    * zero == floor for post-epoch values, matching DuckDB's ns→us
    * truncation), TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ (cast to
    * the instant type keeps the wall clock under a UTC session). Works
    * on streaming frames too (schema is known up front). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Raw events with an integer-microseconds column `tus` alongside —
    * the pure-integer path for window/gap arithmetic that must stay
    * bit-exact across engines (no timestamp object in the hot loop). */
  def eventsMicros(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("tus", expr("ts div 1000"))
      case TimestampNTZType =>
        raw.withColumn("tus", unix_micros(col("ts").cast(TimestampType)))
      case _ => raw.withColumn("tus", unix_micros(col("ts")))
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events with `ts` surfaced as a microsecond TimestampType regardless
    * of the testdata generation's physical type — see [[normalizeTs]]. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
