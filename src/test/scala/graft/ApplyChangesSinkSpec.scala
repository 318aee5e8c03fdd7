package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.VersionedTable

/** The APPLY CHANGES streaming sink mode: writeStream
  * .format("graft-versioned") with mergeKeys/sequenceBy[/deleteFlag]
  * folds every micro-batch into the target as a sequence-guarded CDC
  * upsert — no foreachBatch boilerplate. Contract under test: the fold
  * converges across out-of-order batches; deletes apply; a checkpoint
  * restart delivers nothing new; a FRESH checkpoint's full replay is a
  * no-op through the txn ledger + sequence guard; missing options
  * refuse at sink construction. */
class ApplyChangesSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String =
    Files.createTempDirectory(name).toString

  private def chg(rows: (Long, Long, String, Boolean)*) =
    rows.toSeq.toDF("k", "seq", "v", "del").coalesce(1)

  test("stream -> applyChanges sink: out-of-order fold, deletes, exactly-once replay") {
    val src = freshDir("acs_src") + "/s"
    val dst = freshDir("acs_dst") + "/t"
    // source: three versions of change rows; v2 carries LOWER sequences
    // than v1 for key 1 (out-of-order delivery), v3 deletes key 2
    VersionedTable.create(spark, src,
      chg((1L, 100L, "new", false), (2L, 10L, "b", false)))    // v1
    VersionedTable.append(spark, src,
      chg((1L, 90L, "old", false), (3L, 5L, "c", false)))      // v2
    VersionedTable.append(spark, src,
      chg((2L, 20L, "b", true)))                               // v3
    // target: pre-created with the persisted sequence column
    VersionedTable.create(spark, dst,
      chg().select(
        when(col("k").isNotNull, col("k")).as("k"),
        when(col("seq").isNotNull, col("seq")).as("seq"),
        when(col("v").isNotNull, col("v")).as("v")))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("graft-versioned")
        .option("path", dst)
        .option("mergeKeys", "k").option("sequenceBy", "seq")
        .option("deleteFlag", "del")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    val ckpt = freshDir("acs_ckpt")
    run(ckpt)
    def state = VersionedTable.read(spark, dst)
      .select("k", "seq", "v").as[(Long, Long, String)].collect().toSet
    val expected = Set((1L, 100L, "new"), (3L, 5L, "c"))
    assert(state == expected,
      s"key 1 keeps seq 100 over the late seq-90 row; key 2 deleted; got $state")
    val vAfter = VersionedTable.currentVersion(spark, dst).get
    // restart on the SAME checkpoint: nothing new, no version churn
    run(ckpt)
    assert(VersionedTable.currentVersion(spark, dst).contains(vAfter))
    assert(state == expected)
    // a FRESH checkpoint replays everything: the txn ledger (batch ids)
    // and the sequence guard both make it a no-op
    run(freshDir("acs_ckpt2"))
    assert(state == expected)
  }

  test("option validation refuses half-configured sinks") {
    val src = freshDir("acs_src2") + "/s"
    VersionedTable.create(spark, src, chg((1L, 1L, "a", false)))
    val e = intercept[Exception] {
      spark.readStream.format("graft-versioned").load(src)
        .writeStream.format("graft-versioned")
        .option("path", freshDir("acs_dst2") + "/t")
        .option("mergeKeys", "k") // no sequenceBy
        .option("checkpointLocation", freshDir("acs_ckpt3"))
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(e.getMessage.contains("mergeKeys and sequenceBy"))
  }
}
