package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** CHECK constraints on the versioned table: ALTER TABLE ADD CONSTRAINT
  * semantics (Delta's invariant model). Contract under test: adding
  * validates existing data inside the commit retry; every row-adding
  * writer (append, overwrite, merge, update) validates its STAGED files
  * and refuses atomically (nothing committed, staged files swept); SQL
  * NULL semantics (NULL passes, FALSE violates); constraints carry
  * through DMLs/compaction/DDLs, time-travel with the snapshot, roll
  * back with rollback; rename/drop of a referenced column refuses; the
  * rebase walk refuses a commit that raced a constraint change. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ck").resolve("t").toString

  private def df(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "v").coalesce(1)

  test("add validates existing data; writers refuse violating staged rows atomically") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L, 2L -> 20L))
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    assert(VersionedTable.constraintsOf(spark, root)
      .map(c => c.name -> c.expr) == Seq("v_pos" -> "v > 0"))
    // a valid append passes
    VersionedTable.append(spark, root, df(3L -> 30L))
    // a violating append refuses, names the constraint, commits NOTHING
    val before = VersionedTable.currentVersion(spark, root).get
    val filesBefore = VersionedTable.filesOf(spark, root).toSet
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root, df(4L -> 40L, 5L -> -1L))
    }
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("v > 0"))
    assert(VersionedTable.currentVersion(spark, root).contains(before))
    assert(VersionedTable.read(spark, root).count() == 3)
    // the staged files were swept — no orphans from the refused write
    assert(VersionedTable.orphanFiles(spark, root).isEmpty,
      "a refused write must sweep its staged files")
    assert(VersionedTable.filesOf(spark, root).toSet == filesBefore)
    // adding a constraint existing data violates refuses
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, root, "small", "v < 25")
    }
    assert(e2.getMessage.contains("existing rows"))
  }

  test("SQL NULL semantics: a NULL check result passes, FALSE violates") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, Some(10L))).toDF("id", "v").coalesce(1))
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    // NULL v: the check evaluates NULL -> passes (SQL standard)
    VersionedTable.append(spark, root,
      Seq((2L, None: Option[Long])).toDF("id", "v").coalesce(1))
    assert(VersionedTable.read(spark, root).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((3L, Some(-5L))).toDF("id", "v").coalesce(1))
    }
  }

  test("merge and update enforce; delete/compact don't re-validate; drop lifts") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L, 2L -> 20L, 3L -> 30L))
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    // merge with a violating insert refuses
    intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root, df(4L -> -4L), Seq("id"))
    }
    // merge with a valid upsert passes
    VersionedTable.mergeInto(spark, root, df(2L -> 22L, 4L -> 44L), Seq("id"))
    assert(VersionedTable.read(spark, root).filter(col("id") === 2L)
      .head.getLong(1) == 22L)
    // update whose SET violates refuses
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhereVectored(spark, root, Map.empty,
        col("id") === 1L, Map("v" -> (col("v") - lit(100L))))
    }
    // a vectored delete + compaction of validated rows sail through
    VersionedTable.deleteWhereVectored(spark, root, Map.empty, col("id") === 3L)
    VersionedTable.compact(spark, root)
    assert(VersionedTable.constraintsOf(spark, root).map(_.name) == Seq("v_pos"),
      "constraints must survive DML and compaction commits")
    // drop lifts enforcement
    VersionedTable.dropConstraint(spark, root, "v_pos")
    VersionedTable.append(spark, root, df(9L -> -9L))
    assert(VersionedTable.read(spark, root).count() == 4)
  }

  test("constraint commits never carry the head's txn id (ledger integrity)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))
    VersionedTable.appendTxn(spark, root, df(2L -> 20L), txn = 7L)
    val txnFiles = VersionedTable.filesAddedByTxn(spark, root, 7L)
    assert(txnFiles.nonEmpty)
    // a metadata commit right after must NOT replay txn 7 into the
    // ledger: filesAddedByTxn still resolves the TRUE append, and the
    // txn replay stays a no-op
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")
    assert(VersionedTable.filesAddedByTxn(spark, root, 7L) == txnFiles,
      "the constraint commit must not adopt the append's txn id")
    val cur = VersionedTable.currentVersion(spark, root).get
    assert(VersionedTable.appendTxn(spark, root, df(9L -> 90L), txn = 7L) == cur,
      "replaying txn 7 is still a no-op")
    VersionedTable.dropConstraint(spark, root, "v_pos")
    assert(VersionedTable.filesAddedByTxn(spark, root, 7L) == txnFiles)
  }

  test("constraints time-travel and roll back with the snapshot") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))         // v1
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0") // v2
    VersionedTable.append(spark, root, df(2L -> 20L))          // v3
    VersionedTable.dropConstraint(spark, root, "v_pos")        // v4
    assert(VersionedTable.constraintsOf(spark, root, Some(1)).isEmpty)
    assert(VersionedTable.constraintsOf(spark, root, Some(3)).map(_.name)
      == Seq("v_pos"))
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
    // rollback to v3 restores the constraint set WITH the content
    VersionedTable.rollback(spark, root, 3)                    // v5
    assert(VersionedTable.constraintsOf(spark, root).map(_.name)
      == Seq("v_pos"))
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root, df(9L -> -9L))
    }
    // schema DDLs carry constraints; renaming/dropping a REFERENCED
    // column refuses
    VersionedTable.addColumn(spark, root, "extra", "bigint")
    assert(VersionedTable.constraintsOf(spark, root).map(_.name)
      == Seq("v_pos"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "v", "w")
    }
    assert(e.getMessage.contains("v_pos"))
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "v")
    }
    // an UNREFERENCED column renames fine, constraint intact
    VersionedTable.renameColumn(spark, root, "id", "key")
    assert(VersionedTable.constraintsOf(spark, root).map(_.name)
      == Seq("v_pos"))
  }

  test("the SQL faces run the whole flow; a raced constraint change refuses a DML") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L, 2L -> 20L))
    spark.sql(s"CALL graft.add_constraint('$root', 'v_cap', 'v <= 100')")
    val cs = spark.sql(s"CALL graft.constraints('$root')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cs == Map("v_cap" -> "v <= 100"))
    intercept[Exception] {
      VersionedTable.append(spark, root, df(3L -> 300L))
    }
    // race: a DML staged against the pre-constraint head must refuse
    // when a constraint change interleaves (its rows were never
    // validated against the new contract)
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.dropConstraint(spark, root, "v_cap")
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        VersionedTable.deleteWhereVectored(spark, root, Map.empty,
          col("id") === 1L)
      }
      assert(e.getMessage.contains("CHECK constraints"))
    } finally VersionedTable.raceBeforePublish = VersionedTable.NoRaceHook
    // the RACER's drop committed (only the DML refused): enforcement is
    // lifted and the previously-refused row now appends
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
    VersionedTable.append(spark, root, df(3L -> 300L))
    assert(VersionedTable.read(spark, root).count() == 3)
  }
}
