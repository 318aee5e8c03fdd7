package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics: in append mode, a window is emitted once the
  * watermark passes it, and rows arriving later than watermark+delay for
  * an already-finalized window are dropped (state-bounding at scale). */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("late rows behind the watermark are dropped in append mode") {
    val dir = Files.createTempDirectory("late_events")
    // the file stream source wants a flat directory of files: write each
    // batch to scratch, then move its single part file into the watched dir
    def write(name: String, rows: Seq[(java.sql.Timestamp, String)]): Unit = {
      val scratch = Files.createTempDirectory(s"late_$name")
      rows.toDF("ts", "k").repartition(1).write.mode("overwrite")
        .parquet(scratch.toString)
      val part = Files.list(scratch).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(java.nio.file.Paths.get(part), dir.resolve(s"$name.parquet"))
    }
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val checkpoint = Files.createTempDirectory("late_ckpt").toString
    val outDir = Files.createTempDirectory("late_out").toString
    def runOnce(qname: String): Set[(String, String, Long)] = {
      val schema = spark.read.parquet(dir.toString).schema
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val agg = stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("k"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w"), col("k"), col("n"))
      // file sink: supports checkpoint recovery (memory sink does not)
      val q = agg.writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(outDir).as[(java.sql.Timestamp, String, Long)].collect()
        .map { case (w, k, n) => (w.toString, k, n) }.toSet
    }

    // run 1: window [10:00,10:05) gets 2 rows; max ts 10:20 sets the
    // watermark to 10:10 at commit — the window finalizes.
    write("b1", Seq(
      (t("2024-01-01 10:00:30"), "a"), (t("2024-01-01 10:01:00"), "a"),
      (t("2024-01-01 10:20:00"), "z")))
    val run1 = runOnce("late_run1")
    // run 2 (same checkpoint → restored watermark): a late row for the
    // finalized 10:00 window arrives — must be dropped.
    write("b2", Seq((t("2024-01-01 10:02:00"), "a")))
    val run2 = runOnce("late_run2")

    val all = run1 ++ run2
    assert(all.contains(("2024-01-01 10:00:00.0", "a", 2L)),
      s"10:00 window should finalize with 2 rows: run1=$run1 run2=$run2")
    assert(!all.exists { case (w, _, n) => w.startsWith("2024-01-01 10:00") && n != 2L },
      s"late row leaked into a finalized window: $all")
  }
}
