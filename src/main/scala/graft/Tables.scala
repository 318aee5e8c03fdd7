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

  /** Session settings every entry point applies: parquet TIMESTAMP(NANOS)
    * (events.ts) is not a legal Spark type, so read it as a nanos long and
    * convert in [[events]]. */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts arrives as TIMESTAMP(NANOS); surface it as a microsecond
    * TimestampType (truncated like DuckDB does when reading the same file).
    * `div` is integer division; ts is post-epoch so truncation == floor. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
