package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Adversarial randomized interleaving over the whole writer taxonomy:
  * N real threads fire seeded-random appends, vectored DMLs, index
  * builds, compactions, schema DDLs and rollbacks at ONE table with no
  * coordination, then the ledger is audited for serializability
  * invariants the per-case ConcurrentCommitSpec shapes cannot reach:
  *
  *  1. the version ledger is contiguous and every manifest readable;
  *  2. CDF REPLAY: folding changesBetween(v-1, v) row deltas from the
  *     genesis snapshot reproduces the final table exactly — no lost
  *     rows, no resurrections, no duplicates anywhere in the history
  *     (rollbacks included: their undo IS their diff);
  *  3. every row a vectored DELETE removed matched that delete's own
  *     predicate (a rebase may shrink a delete's footprint, never widen
  *     it onto foreign rows);
  *  4. metadata row counts and point lookups agree with a full scan
  *     after the churn (index entries for files a racer removed are
  *     stale cache, never wrong answers).
  *
  * Writers may legally REFUSE (ConcurrentModificationException — e.g.
  * two DMLs re-vectoring one file) or lose a schema race
  * (IllegalArgumentException from a rename/rollback target gone);
  * those are counted, not failed. Anything else is a bug. */
class ConcurrentFuzzSpec extends SparkSpec {

  private val Threads = 4
  private val OpsPerThread = 125 // 500 ops total (the round-13 target)
  private val Seed = 20260814L

  case class DeleteRec(version: Int, k: Long, r: Long)

  test(s"${Threads}x$OpsPerThread randomized writer ops keep the ledger serializable") {
    val root = Files.createTempDirectory("graft_fuzz").resolve("t").toString
    import spark.implicits._
    // genesis: ids 0..99, one pad column per thread for rename chains
    val base0 = (0L until 100L).toDF("id")
      .withColumn("val", col("id") * 2)
    // pads are NULLABLE (when() wrapping) so concurrent appends may
    // omit them and null-fill, like any post-evolution writer
    val base = (0 until Threads).foldLeft(base0)((d, t) =>
      d.withColumn(s"pad$t", when(col("id") >= 0, lit(t.toLong))))
    VersionedTable.create(spark, root, base.repartition(2))

    val deletes = new ConcurrentLinkedQueue[DeleteRec]()
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val fatals = new ConcurrentLinkedQueue[Throwable]()
    val appended = new ConcurrentLinkedQueue[Long]()

    def worker(t: Int): Thread = new Thread(() => {
      val rnd = new Random(Seed + t)
      var padName = s"pad$t"
      var k = 0
      while (k < OpsPerThread) {
        val roll = rnd.nextInt(100)
        try {
          if (roll < 50) {
            // append 3 globally-unique rows
            val lo = 1000L + t * 1000000L + k * 10L
            val ids = Seq(lo, lo + 1, lo + 2)
            val df = ids.toDF("id").withColumn("val", col("id") * 2)
            VersionedTable.append(spark, root, df.coalesce(1))
            ids.foreach(appended.add)
          } else if (roll < 65) {
            val kk = 7L + rnd.nextInt(7)
            val rr = rnd.nextInt(kk.toInt).toLong
            val v = VersionedTable.deleteWhereVectored(spark, root,
              Map.empty, col("id") % kk === rr)
            deletes.add(DeleteRec(v, kk, rr))
          } else if (roll < 73) {
            // update: removes+reinserts the same ids (id multiset fixed)
            val kk = 7L + rnd.nextInt(7)
            val rr = rnd.nextInt(kk.toInt).toLong
            VersionedTable.updateWhereVectored(spark, root, Map.empty,
              col("id") % kk === rr, Map("val" -> (col("val") + lit(1))))
          } else if (roll < 73 + 3) {
            // merge-on-read upsert: inserts fresh ids (tracked like
            // appends). The merge is schema-STRICT, so the source
            // aligns to the schema read at call time — a rename/add
            // racing in between legitimately refuses (schema mismatch
            // counts as a refusal below, like any DDL race)
            val lo = 5000000L + t * 1000000L + k * 10L
            val ids = Seq(lo, lo + 1)
            val schema = VersionedTable.schemaOf(spark, root)
            val src = ids.toDF("id").select(schema.fields.toSeq.map { f =>
              f.name match {
                case "id" => col("id")
                case "val" => (col("id") * 3).as("val")
                case other => lit(null).cast(f.dataType).as(other)
              }
            }: _*)
            VersionedTable.mergeIntoVectored(spark, root, src.coalesce(1),
              Seq("id"))
            ids.foreach(appended.add)
          } else if (roll < 78) {
            VersionedTable.indexSums(spark, root, Seq("val"),
              onlyMissing = true)
          } else if (roll < 82) {
            VersionedTable.indexBloom(spark, root, Seq("id"),
              onlyMissing = true)
          } else if (roll < 86) {
            VersionedTable.compact(spark, root)
          } else if (roll < 88) {
            VersionedTable.zorderBy(spark, root, Seq("id", "val"))
          } else if (roll < 92) {
            VersionedTable.addColumn(spark, root, s"c_${t}_$k", "bigint")
          } else if (roll < 96) {
            val next = s"pad${t}_$k"
            VersionedTable.renameColumn(spark, root, padName, next)
            padName = next
          } else {
            val cur = VersionedTable.currentVersion(spark, root).getOrElse(1)
            if (cur > 2) VersionedTable.rollback(spark, root, cur - 1)
          }
        } catch {
          case _: java.util.ConcurrentModificationException =>
            refusals.incrementAndGet()
          case _: IllegalArgumentException if roll >= 88 || (roll >= 73 && roll < 76) =>
            // schema/rollback target raced away (rename chain broken by
            // a rollback, duplicate column after a rollback re-add, a
            // strict-schema merge racing a DDL)
            refusals.incrementAndGet()
          case e: Throwable => fatals.add(e); k = OpsPerThread
        }
        k += 1
      }
    }, s"fuzz-$t")

    val threads = (0 until Threads).map(worker)
    threads.foreach(_.start())
    threads.foreach(_.join(900000))
    if (!fatals.isEmpty) {
      val e = fatals.peek(); e.printStackTrace()
      fail(s"unexpected writer failure: $e")
    }

    // 1. contiguous ledger, every manifest readable
    val maxV = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.versions(spark, root) == (1 to maxV),
      "the version ledger must be gap-free")
    assert(maxV > 150, s"the fuzz must commit real work, got $maxV versions")
    assert(VersionedTable.history(spark, root).size == maxV)

    // 2. CDF replay from genesis reproduces the final table (ids are
    // unique by construction, so a multiset invariant reduces to sets +
    // a no-duplicates check on every intermediate state)
    import scala.collection.mutable
    val model = mutable.Set[Long]()
    VersionedTable.read(spark, root, Some(1)).select("id")
      .collect().foreach(r => model += r.getLong(0))
    val deleteByV = {
      import scala.jdk.CollectionConverters._
      deletes.asScala.map(d => d.version -> d).toMap
    }
    (2 to maxV).foreach { v =>
      val (adds, removes) = VersionedTable.changesBetween(spark, root, v - 1, v)
      val addIds = adds.select("id").collect().map(_.getLong(0))
      val remIds = removes.select("id").collect().map(_.getLong(0))
      // 3. a delete's removed rows all matched ITS predicate
      deleteByV.get(v).foreach { d =>
        val bad = remIds.filterNot(i => i % d.k == d.r)
        assert(bad.isEmpty,
          s"v$v (delete id%${d.k}==${d.r}) removed foreign rows: ${bad.take(5).toSeq}")
      }
      remIds.foreach { i =>
        assert(model.contains(i), s"v$v removes id $i that was not live")
        model -= i
      }
      addIds.foreach { i =>
        assert(!model.contains(i), s"v$v adds id $i that is already live")
        model += i
      }
    }
    val finalIds = VersionedTable.read(spark, root).select("id")
      .collect().map(_.getLong(0))
    assert(finalIds.length == finalIds.distinct.length,
      "duplicate rows in the final table")
    assert(finalIds.toSet == model.toSet,
      s"CDF replay diverges from the final read: " +
        s"missing=${(model.toSet -- finalIds).take(5)}, " +
        s"phantom=${(finalIds.toSet -- model).take(5)}")
    // every id the replay left live was either genesis or appended
    val legal = (0L until 100L).toSet ++ {
      import scala.jdk.CollectionConverters._
      appended.asScala.toSet
    }
    assert(model.forall(legal.contains), "rows from nowhere survived")

    // 4. metadata agrees with the scan after the churn
    assert(VersionedTable.metaRowCount(spark, root)
      .forall(_ == finalIds.length.toLong),
      "manifest row counts must match the scan")
    finalIds.headOption.foreach { probe =>
      // readEq returns the bloom-candidate FILES' rows (caller filters);
      // the invariant is no false negative + filtered correctness
      val hits = VersionedTable.readEq(spark, root, "id", probe.toString)
        .filter(col("id") === probe)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(hits == Seq(probe),
        "bloom-routed point lookup must find exactly the probe row " +
          "after churn (stale index entries may over-admit, never drop)")
    }
    info(s"fuzz: $maxV versions committed, ${refusals.get()} legal refusals")
  }
}
