package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Named refs on the versioned table — tags and branches, the Iceberg
  * refs design re-expressed on the manifest chain. Contract under test:
  * a TAG pins a version against retention (expire keeps its manifest
  * and files until the tag drops, then they age out normally); a BRANCH
  * is a shallow-cloned staging table (data by reference, schema +
  * constraints carried) whose head PUBLISHES onto main as one
  * metadata-only fast-forward commit that CASes on the fork base —
  * write-audit-publish. GC stays safe in both directions through the
  * clone-marker protocol. */
class RefSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ref").resolve("t").toString

  private def df(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "v").coalesce(1)

  private def rowsOf(root: String, version: Option[Int] = None): Set[(Long, Long)] =
    VersionedTable.read(spark, root, version)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("tags pin versions: immutable names, listing, read-by-tag") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))           // v1
    VersionedTable.append(spark, root, df(2L -> 20L))           // v2
    assert(VersionedTable.createTag(spark, root, "train-v1", Some(1)) == 1)
    assert(VersionedTable.createTag(spark, root, "latest") == 2) // default newest
    // immutable: re-tagging refuses, both racing creates can't win
    val e = intercept[IllegalArgumentException] {
      VersionedTable.createTag(spark, root, "latest", Some(1))
    }
    assert(e.getMessage.contains("already exists"))
    assert(VersionedTable.tags(spark, root) ==
      Seq("latest" -> 2, "train-v1" -> 1))
    assert(VersionedTable.readTag(spark, root, "train-v1")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(VersionedTable.tagVersion(spark, root, "latest") == 2)
    // the reader face: option("tag", ...) is time travel by name
    assert(spark.read.format("graft-versioned").option("tag", "train-v1")
      .load(root).collect().map(_.getLong(0)).toSet == Set(1L))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned").option("tag", "train-v1")
        .option("versionAsOf", "2").load(root).collect()
    }
    // bad names refuse before touching the filesystem
    intercept[IllegalArgumentException] {
      VersionedTable.createTag(spark, root, "no/slash")
    }
  }

  test("expire keeps a tagged version's manifest and files; dropTag releases") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))           // v1
    VersionedTable.createTag(spark, root, "pin", Some(1))
    VersionedTable.overwrite(spark, root, df(2L -> 20L))        // v2: v1 files dead
    VersionedTable.append(spark, root, df(3L -> 30L))           // v3
    val (dropped, removed) = VersionedTable.expire(spark, root, keepLast = 1)
    // v2 goes; v1 survives on the tag pin, its files intact
    assert(dropped == 1 && VersionedTable.versions(spark, root) == Seq(1, 3))
    assert(rowsOf(root, Some(1)) == Set(1L -> 10L))
    assert(VersionedTable.readTag(spark, root, "pin")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(VersionedTable.dropTag(spark, root, "pin") == 1)
    val (dropped2, removed2) = VersionedTable.expire(spark, root, keepLast = 1)
    assert(dropped2 == 1 && removed2 >= 1,
      s"after dropTag the pinned version ages out (dropped=$dropped2, files=$removed2)")
    assert(VersionedTable.versions(spark, root) == Seq(3))
    assert(removed >= 0) // v2's overwrite files swept in the first pass
  }

  test("write-audit-publish: branch stages, constraints audit, fast-forward adopts") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L, 2L -> 20L))  // v1
    VersionedTable.addConstraint(spark, root, "v_pos", "v > 0")   // v2
    val bRoot = VersionedTable.createBranch(spark, root, "wap")
    assert(VersionedTable.branches(spark, root) == Seq(("wap", 2, 1)))
    // the branch carried the constraint: a violating staged write refuses THERE
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark, bRoot, df(9L -> -1L))
    }
    VersionedTable.append(spark, bRoot, df(3L -> 30L))            // branch v2
    // main is untouched while the branch stages
    assert(rowsOf(root) == Set(1L -> 10L, 2L -> 20L))
    val published = VersionedTable.fastForward(spark, root, "wap")
    assert(published == 3)
    assert(rowsOf(root) == Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // the publish is metadata-only: main still enforces the constraint
    intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root, df(8L -> -5L))
    }
    // pre-publish history time-travels
    assert(rowsOf(root, Some(1)) == Set(1L -> 10L, 2L -> 20L))
    // the branch re-forked from the published version: a second cycle works
    assert(VersionedTable.forkBaseOf(spark, root, "wap") == 3)
    VersionedTable.append(spark, bRoot, df(4L -> 40L))
    assert(VersionedTable.fastForward(spark, root, "wap") == 4)
    assert(rowsOf(root).map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("fast-forward CASes on the fork base: a raced main commit refuses the publish") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))             // v1
    val bRoot = VersionedTable.createBranch(spark, root, "stale")
    VersionedTable.append(spark, bRoot, df(2L -> 20L))
    VersionedTable.append(spark, root, df(7L -> 70L))             // main advances
    val e = intercept[IllegalArgumentException] {
      VersionedTable.fastForward(spark, root, "stale")
    }
    assert(e.getMessage.contains("advanced") && e.getMessage.contains("re-branch"))
    assert(rowsOf(root) == Set(1L -> 10L, 7L -> 70L), "refused publish commits nothing")
  }

  test("branch DVs and schema evolution publish wholesale; branch drop keeps published files") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L, 2L -> 20L, 3L -> 30L))
    val bRoot = VersionedTable.createBranch(spark, root, "evolve")
    // merge-on-read delete ON THE BRANCH (vector sidecar, no rewrite)
    VersionedTable.deleteWhereVectored(spark, bRoot, Map.empty, col("id") === 2L)
    // schema evolution on the branch: rename via column mapping + add
    VersionedTable.renameColumn(spark, bRoot, "v", "val")
    VersionedTable.append(spark, bRoot,
      Seq((4L, 40L)).toDF("id", "val").coalesce(1))
    VersionedTable.fastForward(spark, root, "evolve")
    val head = VersionedTable.read(spark, root)
    assert(head.schema.fieldNames.toSeq == Seq("id", "val"))
    assert(head.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set(1L -> 10L, 3L -> 30L, 4L -> 40L), "DV applied, renamed column reads")
    // v1 time-travels under its own (pre-rename, pre-delete) shape
    assert(VersionedTable.read(spark, root, Some(1))
      .schema.fieldNames.toSeq == Seq("id", "v"))
    assert(rowsOf(root, Some(1)) == Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // dropping the branch must NOT break main: its published files are
    // marker-protected; only unpublished leftovers sweep
    VersionedTable.dropBranch(spark, root, "evolve")
    assert(VersionedTable.branches(spark, root).isEmpty)
    assert(VersionedTable.read(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    // and the name is reusable
    VersionedTable.createBranch(spark, root, "evolve")
    assert(VersionedTable.branches(spark, root).map(_._1) == Seq("evolve"))
  }

  test("an unpublished branch drop sweeps its files; main expire never eats branch-shared data") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1L -> 10L))             // v1
    val bRoot = VersionedTable.createBranch(spark, root, "scratch")
    VersionedTable.append(spark, bRoot, df(2L -> 20L))
    val (vs, removed) = VersionedTable.dropBranch(spark, root, "scratch")
    assert(vs == 2 && removed >= 1, s"unpublished staged files sweep (got $removed)")
    assert(rowsOf(root) == Set(1L -> 10L))
    // clone-marker direction: a live branch holds main's files across
    // main's history rewrite + expire
    val b2 = VersionedTable.createBranch(spark, root, "keeper")
    VersionedTable.overwrite(spark, root, df(9L -> 90L))          // v1 files dead on main
    VersionedTable.expire(spark, root, keepLast = 1)
    assert(VersionedTable.read(spark, b2)
      .collect().map(_.getLong(0)).toSet == Set(1L), "branch still reads the forked snapshot")
  }
}
