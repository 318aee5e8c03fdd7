package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ext.Dedup
import graft.functions.Portable._
import graft.sink.VersionedTable

/** Streaming document-corpus operators — the ingest-time twins of the
  * batch dedup family. Same landing-directory harness as
  * [[EventsStream]]: a parquet file stream drained synchronously with
  * AvailableNow, results checked against the BATCH DuckDB oracle
  * (stream/batch parity is the assertion).
  */
object DocsStream {

  /** Streaming incremental dedup — q135's daily-ingest shape as a REAL
    * streaming query: the "new batch" documents (doc_id % 5 == 4) arrive
    * through a file stream; each micro-batch shingles its documents,
    * probes the STATIC banded MinHash index of the base corpus
    * (stream-static joins — the base is never re-scanned or re-paired),
    * exact-verifies candidates at τ = 1/2, and commits each new doc's
    * best base match to a [[VersionedTable]] under the micro-batch's
    * transaction id — exactly-once under batch replay. The probe/verify
    * pipeline is [[Dedup.bandedSignature]] + [[Dedup.bestBaseMatches]],
    * the SAME definitions the batch q135 runs, so the drained result
    * equals the batch relation by construction (and is checked against
    * the same oracle). A new doc's rows land in exactly one micro-batch,
    * so the per-batch best-match window is globally correct.
    *
    * At 100 TB: the band index is the persisted table a daily ingest
    * probes; per-batch work is ∝ batch size; the versioned sink gives
    * concurrent readers snapshot isolation across ingests. */
  def incrementalDedupStreaming(spark: SparkSession, sfDir: String,
      queryName: String = "graft_stream_incr_dedup"): DataFrame = {
    val work = EventsStream.scratchDir("graft_incr_dedup")
    val targetRoot = work.resolve("t").toString
    drainIncrementalDedup(spark, sfDir, EventsStream.stageDir(sfDir, "documents"),
      work.resolve("ckpt").toString, targetRoot, queryName)
    readResult(spark, sfDir, targetRoot)
  }

  /** The STATIC side, built once from the batch path: the banded index
    * over the base corpus and the base shingle sets (at scale these are
    * the persisted index tables a daily ingest probes). */
  private def staticSide(spark: SparkSession, sfDir: String) = {
    val base = Dedup.shingleBase(spark, sfDir)
    val idx = Dedup.bandedSignature(base)
      .filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id").as("base_id"), col("band"), col("h1"), col("h2"))
      .localCheckpoint()
    val baseSets = base
      .select(col("doc_id"), sort_array(array_distinct(col("hh"))).as("sh"))
      .localCheckpoint()
    (base, idx, baseSets)
  }

  /** Drain whatever `landing` holds that this checkpoint has not yet
    * processed, committing each micro-batch's best-base-matches under its
    * batch id. Exposed (not just wrapped) so specs can drive the REAL
    * delivery failure modes against one target table: files arriving out
    * of order across drains (late data), and a batch re-delivered after a
    * checkpoint rollback — the txn ledger must refuse the double-apply. */
  def drainIncrementalDedup(spark: SparkSession, sfDir: String,
      landing: String, ckpt: String, targetRoot: String,
      queryName: String = "graft_stream_incr_dedup"): Unit = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val (_, idx, baseSets) = staticSide(spark, sfDir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(landing)
      .filter(col("doc_id") % 5 === 4)
    EventsStream.withStreamPartitions(spark, 8) {
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val toks = tokens(col("text"))
          val hh = batch.filter(size(toks) >= 2)
            .select(col("doc_id"),
              transform(toks, t => charFold(t)).as("th"))
            .select(col("doc_id"), Dedup.combineAdjacent(col("th")).as("hh"))
            .localCheckpoint() // one shingle pass feeds bands AND sets
          val newBands = Dedup.bandedSignature(hh)
          val newSets = hh.select(col("doc_id"),
            sort_array(array_distinct(col("hh"))).as("sh"))
          val out = Dedup.bestBaseMatches(newBands, newSets, idx, baseSets)
          VersionedTable.appendTxn(spark, targetRoot, out, batchId)
          ()
        }
        .option("checkpointLocation", ckpt)
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  /** The drained result: the versioned table's newest snapshot, or — when
    * an empty/filtered-out stream never committed a micro-batch — an
    * EMPTY relation with the output schema (not a missing-table error),
    * derived from the same pipeline over zero rows. */
  def readResult(spark: SparkSession, sfDir: String, targetRoot: String): DataFrame =
    VersionedTable.currentVersion(spark, targetRoot) match {
      case Some(_) => VersionedTable.read(spark, targetRoot)
      case None =>
        val (base, idx, baseSets) = staticSide(spark, sfDir)
        val none = base.limit(0)
        Dedup.bestBaseMatches(
          Dedup.bandedSignature(none),
          none.select(col("doc_id"), sort_array(array_distinct(col("hh"))).as("sh")),
          idx, baseSets).limit(0)
    }
}
