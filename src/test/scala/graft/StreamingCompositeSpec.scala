package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable
import graft.streaming.{EventsStream, ScenesStream}

/** Streaming MVC maintenance: the composite table after draining scene
  * batches must equal the one-fold batch composite of every scene
  * (stream/batch parity), stay incremental across drains, and survive
  * full re-delivery through the txn ledger (counter sums are not
  * idempotent — the ledger is what keeps them exact). */
class StreamingCompositeSpec extends SparkSpec {

  private val D = (v: Double) => java.lang.Double.valueOf(v)
  private val N: java.lang.Double = null

  /** Deterministic scene i: 4-px tile over 8 cells, masked where the
    * mix says so. */
  private def scenes(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val px = (0 until 4).map { j =>
        val h = (i * 31 + j * 17) % 23
        if (h % 5 == 0) N else D((h % 19) / 19.0)
      }
      (i.toLong % 8, px, 1000 + i)
    }.toDF("cell", "px", "day")
  }

  private def normalized(df: DataFrame): Seq[String] =
    df.select(col("cell"), to_json(struct(col("md"), col("nv"))).as("j"))
      .collect().map(r => s"${r.getLong(0)}:${r.getString(1)}").sorted.toSeq

  test("streamed composite equals the batch fold; incremental; replay-safe") {
    import spark.implicits._
    val landing = EventsStream.scratchDir("graft_mvc_land").toString
    val ckpt = EventsStream.scratchDir("graft_mvc_ck").toString
    val target = EventsStream.scratchDir("graft_mvc_t").resolve("t").toString
    val schema = scenes(0 until 1).schema

    scenes(0 until 40).write.parquet(s"$landing/b0")
    scenes(40 until 70).write.parquet(s"$landing/b1")
    ScenesStream.compositeStreaming(spark, s"$landing/b*", ckpt, target, schema)
    assert(normalized(VersionedTable.read(spark, target)) ==
      normalized(ScenesStream.compositeBatch(scenes(0 until 70))),
      "stream/batch parity after first drain")

    // late scenes arrive; only THEY are folded in
    scenes(70 until 100).write.parquet(s"$landing/b2")
    ScenesStream.compositeStreaming(spark, s"$landing/b*", ckpt, target, schema)
    assert(normalized(VersionedTable.read(spark, target)) ==
      normalized(ScenesStream.compositeBatch(scenes(0 until 100))),
      "incremental drain must equal the full fold")

    // checkpoint loss: every batch re-delivers under the SAME batch ids;
    // the txn ledger refuses each, so the non-idempotent nv sums hold
    val before = normalized(VersionedTable.read(spark, target))
    val ckpt2 = EventsStream.scratchDir("graft_mvc_ck2").toString
    ScenesStream.compositeStreaming(spark, s"$landing/b*", ckpt2, target, schema)
    assert(normalized(VersionedTable.read(spark, target)) == before,
      "replayed batches must not double-count")
  }
}
