package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** The versioned table as its own streaming source: commit-log
  * following delivers each version's change feed exactly once per
  * checkpoint, incrementally across drains, and downstream
  * version-keyed txn writes stay correct even when the checkpoint is
  * lost and history replays. */
class FollowChangesSpec extends SparkSpec {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10)
  }

  private def ids(frame: DataFrame): Seq[Long] =
    frame.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("each commit streams once, in order, incrementally across drains") {
    val root = fresh("graft_fc"); val ckpt = fresh("graft_fc_ck")
    VersionedTable.create(spark, root, df(1, 2))                       // v1
    VersionedTable.append(spark, root, df(3))                          // v2
    val got = scala.collection.mutable.ArrayBuffer[(Int, Seq[Long], Seq[Long])]()
    VersionedTable.followChanges(spark, root, ckpt) { (v, add, rem) =>
      got += ((v, ids(add), ids(rem)))
    }
    assert(got.toSeq == Seq((1, Seq(1L, 2L), Seq()), (2, Seq(3L), Seq())))

    got.clear()
    // one more commit with an update-shaped diff: overwrite drops 1
    VersionedTable.overwrite(spark, root, df(2, 3, 4))                 // v3
    VersionedTable.followChanges(spark, root, ckpt) { (v, add, rem) =>
      got += ((v, ids(add), ids(rem)))
    }
    // only the NEW commit streams; carried rows 2,3 cancel in the diff
    assert(got.toSeq == Seq((3, Seq(4L), Seq(1L))))

    got.clear()
    VersionedTable.followChanges(spark, root, ckpt)((v, a, r) =>
      got += ((v, ids(a), ids(r))))
    assert(got.isEmpty, "no new commits, nothing streams")
  }

  test("checkpoint loss replays history; version-keyed txn sink refuses doubles") {
    val root = fresh("graft_fc2"); val target = fresh("graft_fc2_t")
    VersionedTable.create(spark, root, df(1, 2))                       // v1
    VersionedTable.append(spark, root, df(3, 4))                       // v2
    def drainInto(ckpt: String): Unit =
      VersionedTable.followChanges(spark, root, ckpt) { (v, add, _) =>
        VersionedTable.appendTxn(spark, target,
          add.withColumn("src_version", lit(v)), txn = v.toLong)
        ()
      }
    drainInto(fresh("graft_fc2_ck"))
    val after1 = VersionedTable.read(spark, target).count()
    assert(after1 == 4L)
    // checkpoint lost -> full replay; the txn ledger absorbs it
    drainInto(fresh("graft_fc2_ck"))
    assert(VersionedTable.read(spark, target).count() == after1,
      "replayed versions must not double-apply")
    assert(VersionedTable.committedTxns(spark, target) == Set(1L, 2L))
  }
}
