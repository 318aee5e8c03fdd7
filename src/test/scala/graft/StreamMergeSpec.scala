package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** foreachBatch merge sink: counts accumulate across micro-batches, a
  * re-run against the same checkpoint reprocesses nothing (exactly-once),
  * and a batch rewrites ONLY the key-hash bucket partitions it touches. */
class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch accumulation + checkpointed exactly-once re-run") {
    // two copies of the events file → two micro-batches (maxFilesPerTrigger=1)
    val source = EventsStream.stageEvents(sf, copies = 2)
    val target = Files.createTempDirectory("merge_target").resolve("t").toString
    val ckpt = Files.createTempDirectory("merge_ckpt").toString

    EventsStream.streamMergeInto(spark, source, target, ckpt, "t_merge")
    val got = spark.read.parquet(target)
      .select("user_id", "event_id", "n")
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
    val again = spark.read.parquet(target)
      .select("user_id", "event_id", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == expect)
  }

  test("partition-scoped merge leaves untouched bucket partitions byte-identical") {
    val target = Files.createTempDirectory("merge_pt").resolve("t").toString
    val ckptAll = Files.createTempDirectory("merge_pt_ck1").toString
    val ckptOne = Files.createTempDirectory("merge_pt_ck2").toString

    // batch 1: the full events table → every bucket written
    val sourceAll = EventsStream.stageEvents(sf, copies = 1)
    EventsStream.streamMergeInto(spark, sourceAll, target, ckptAll, "pt_merge_all")

    // batch 2 source: ONLY users in bucket 0
    val sourceOne = Files.createTempDirectory("merge_pt_src").toString
    Tables.table(spark, sf, "events")  // raw read: ts stays a nanos long
      .filter(pmod(col("user_id"), lit(EventsStream.MergeBuckets)) === 0)
      .write.mode("overwrite").parquet(sourceOne)

    def fileBytes(root: String): Map[String, Long] = {
      val base = Paths.get(root)
      val s = Files.walk(base)
      try s.filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .toArray.map(_.asInstanceOf[Path])
        .map(p => base.relativize(p).toString ->
          java.util.Arrays.hashCode(Files.readAllBytes(p)).toLong)
        .toMap
      finally s.close()
    }
    val before = fileBytes(target)
    EventsStream.streamMergeInto(spark, sourceOne, target, ckptOne, "pt_merge_one")
    val after = fileBytes(target)

    val untouchedBefore = before.filter(!_._1.startsWith("bucket=0"))
    val untouchedAfter = after.filter(!_._1.startsWith("bucket=0"))
    // untouched buckets: same file names, same bytes
    assert(untouchedBefore == untouchedAfter)
    // bucket 0 WAS rewritten (file set differs)
    assert(before.keySet.filter(_.startsWith("bucket=0")) !=
           after.keySet.filter(_.startsWith("bucket=0")))

    // and the merge is correct: bucket-0 users accumulated a second count
    val expect = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(col("event_id")).as("event_id"), count(lit(1)).as("n"))
      .withColumn("n", when(
        pmod(col("user_id"), lit(EventsStream.MergeBuckets)) === 0, col("n") * 2)
        .otherwise(col("n")))
      .as[(Long, Long, Long)].collect().toSet
    val got = spark.read.parquet(target)
      .select("user_id", "event_id", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
  }
}
