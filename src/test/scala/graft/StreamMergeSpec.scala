package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** foreachBatch merge sink: counts accumulate across micro-batches, and a
  * re-run against the same checkpoint reprocesses nothing (exactly-once). */
class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch accumulation + checkpointed exactly-once re-run") {
    // two copies of the events file → two micro-batches (maxFilesPerTrigger=1)
    val source = EventsStream.stageEvents(sf, copies = 2)
    val target = Files.createTempDirectory("merge_target").resolve("t").toString
    val ckpt = Files.createTempDirectory("merge_ckpt").toString

    EventsStream.streamMergeInto(spark, source, target, ckpt, "t_merge")
    val got = spark.read.parquet(target)
      .as[(Long, Long, Long)].collect().toSet
    // expected: per-user count DOUBLED (each batch contributes the full
    // file), event_id unchanged (max over identical copies)
    val expect = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(col("event_id")).as("event_id"),
           (count(lit(1)) * 2).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)

    // same checkpoint → no files left to process → target unchanged
    EventsStream.streamMergeInto(spark, source, target, ckpt, "t_merge2")
    val again = spark.read.parquet(target).as[(Long, Long, Long)].collect().toSet
    assert(again == expect)
  }
}
