package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** foreachBatch merge sink: the streamed upsert target equals the batch
  * group-by (K5 semantics through the streaming path). */
class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streamMergeInto upserts per-user rows equal to the batch aggregate") {
    val target = Files.createTempDirectory("merge_target").resolve("t").toString
    EventsStream.streamMergeInto(spark, sf, target, "t_merge")
    val got = spark.read.parquet(target)
      .as[(Long, Long, Long)].collect().toSet
    val expect = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(col("event_id")).as("event_id"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
    // idempotent re-run: same snapshot (merge, not append)
    EventsStream.streamMergeInto(spark, sf, target, "t_merge2")
    val again = spark.read.parquet(target).as[(Long, Long, Long)].collect().toSet
    assert(again == expect)
  }
}
