package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Focused amplifier for the rename/rollback × full-row-image writer
  * interplay the broad fuzz hits only rarely: two threads churn
  * renames, rollbacks and generated-column adds while two others fire
  * applyChanges / replaceWhere / merges built from schemas read
  * moments earlier. Every failure mode must be a LEGAL refusal
  * (ConcurrentModificationException, or IllegalArgumentException /
  * AnalysisException from a frame built against a schema a racer
  * changed — both are the documented DDL-race surface); anything else
  * is a bug. */
class RenameRollbackRaceSpec extends SparkSpec {

  test("rename/rollback churn vs full-row-image writers never corrupts") {
    val root = Files.createTempDirectory("graft_rrr").resolve("t").toString
    import spark.implicits._
    val base = (0L until 50L).toDF("id").withColumn("val", col("id"))
      .withColumn("pad", when(col("id") >= 0, lit(0L)))
    VersionedTable.create(spark, root, base.repartition(2))
    val fatals = new ConcurrentLinkedQueue[Throwable]()
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)

    def ddlWorker(t: Int): Thread = new Thread(() => {
      val rnd = new Random(100L + t)
      var pad = "pad"
      (0 until 60).foreach { k =>
        try {
          rnd.nextInt(3) match {
            case 0 =>
              val next = s"pad_${t}_$k"
              VersionedTable.renameColumn(spark, root, pad, next)
              pad = next
            case 1 =>
              val cur = VersionedTable.currentVersion(spark, root).getOrElse(1)
              if (cur > 2) VersionedTable.rollback(spark, root, cur - 1)
            case 2 =>
              VersionedTable.addGeneratedColumn(spark, root, s"g_${t}_$k",
                "bigint", "id + 100")
          }
        } catch {
          case _: java.util.ConcurrentModificationException =>
            refusals.incrementAndGet()
          case _: IllegalArgumentException => refusals.incrementAndGet()
          case e: java.io.IOException
              if e.getMessage != null && e.getMessage.contains("lost the race") =>
            // bounded-retry exhaustion under 100% DDL churn — a
            // refusal, not corruption (the caller re-runs)
            refusals.incrementAndGet()
          case e: Throwable =>
            fatals.add(new RuntimeException(s"ddl t=$t k=$k", e))
        }
      }
    }, s"ddl-$t")

    def writeWorker(t: Int): Thread = new Thread(() => {
      val rnd = new Random(200L + t)
      (0 until 60).foreach { k =>
        try {
          val schema = VersionedTable.schemaOf(spark, root)
          val gens = VersionedTable.generatedOf(spark, root)
          val lo = 1000L + t * 100000L + k * 10L
          val ids = Seq(lo, lo + 1)
          val b0 = ids.toDF("id").select(schema.fields.toSeq.map { f =>
            f.name match {
              case "id" => col("id")
              case "val" => (col("id") * 2).as("val")
              case other => lit(null).cast(f.dataType).as(other)
            }
          }: _*)
          val frame =
            if (gens.isEmpty) b0
            else b0.select(schema.fields.toSeq.map { f =>
              gens.get(f.name).map(e => expr(e).cast(f.dataType).as(f.name))
                .getOrElse(col(f.name))
            }: _*)
          rnd.nextInt(3) match {
            case 0 => VersionedTable.applyChanges(spark, root,
              frame.coalesce(1), Seq("id"), "val")
            case 1 => VersionedTable.replaceWhere(spark, root,
              frame.coalesce(1),
              Map("id" -> (Some(lo): Option[Any], Some(lo + 9L): Option[Any])))
            case 2 => VersionedTable.mergeIntoVectored(spark, root,
              frame.coalesce(1), Seq("id"))
          }
        } catch {
          case _: java.util.ConcurrentModificationException =>
            refusals.incrementAndGet()
          case _: IllegalArgumentException => refusals.incrementAndGet()
          case e: java.io.IOException
              if e.getMessage != null && e.getMessage.contains("lost the race") =>
            refusals.incrementAndGet()
          case e: Throwable =>
            // an AnalysisException here means a writer leaked an
            // internal select failure instead of the documented
            // IllegalArgumentException refusal — exactly the bug class
            // this amplifier exists to catch
            fatals.add(new RuntimeException(s"write t=$t k=$k", e))
        }
      }
    }, s"write-$t")

    val threads = Seq(ddlWorker(0), ddlWorker(1), writeWorker(2), writeWorker(3))
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    if (!fatals.isEmpty) {
      val e = fatals.peek(); e.printStackTrace()
      fail(s"unexpected failure: $e")
    }
    // the ledger survived the storm: contiguous, readable, and the
    // final read analyzes + scans under the final schema
    val maxV = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.versions(spark, root) == (1 to maxV))
    val n = VersionedTable.read(spark, root).count()
    assert(n >= 50, s"genesis rows must survive, got $n")
    info(s"rrr: $maxV versions, ${refusals.get()} legal refusals")
  }
}
