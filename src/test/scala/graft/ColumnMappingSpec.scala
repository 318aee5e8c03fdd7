package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Field-id column mapping: RENAME/DROP COLUMN as metadata-only commits.
  * Contract under test: no data file moves on either DDL; reads resolve
  * the frozen physical names under the current logical schema; writes
  * after a rename still land under the physical name (so every file ever
  * written resolves uniformly); per-file metadata (stats/blooms) re-keys
  * with the rename and keeps pruning; time travel reads each version
  * under its own names; a dropped-then-re-added column never resurrects
  * the dead data; the manifest round-trips the mapping through JSON
  * (fresh parse, not the writer's cache); and partition columns refuse. */
class ColumnMappingSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cm").resolve("t").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id").withColumn("payload", col("id") * 10).coalesce(1)
  }

  test("rename is metadata-only; reads, time travel and appends keep working") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // v1
    val filesBefore = VersionedTable.filesOf(spark, root)
    val v2 = VersionedTable.renameColumn(spark, root, "payload", "amount")
    assert(v2 == 2)
    assert(VersionedTable.filesOf(spark, root) == filesBefore,
      "a rename must not touch a single data file")
    // current version reads under the NEW name, old data intact
    val now = VersionedTable.read(spark, root)
    assert(now.columns.toSeq == Seq("id", "amount"))
    assert(now.filter(col("id") === 2).select("amount")
      .collect().head.getLong(0) == 20L)
    // time travel reads v1 under ITS name
    val old = VersionedTable.read(spark, root, Some(1))
    assert(old.columns.toSeq == Seq("id", "payload"))
    // an append AFTER the rename arrives with the logical name and must
    // read back uniformly with the pre-rename files
    VersionedTable.append(spark, root,
      df(4).withColumnRenamed("payload", "amount"))               // v3
    assert(VersionedTable.read(spark, root)
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L))
    // ...because it physically wrote the FROZEN name: the raw parquet of
    // the post-rename file still carries 'payload'
    val newFile = VersionedTable.filesOf(spark, root)
      .filterNot(filesBefore.contains).head
    val raw = spark.read.parquet(new java.io.File(root, newFile).toString)
    assert(raw.columns.contains("payload") && !raw.columns.contains("amount"),
      s"post-rename files must keep the physical name, got ${raw.columns.toSeq}")
  }

  test("renamed column keeps pruning: stats re-key with the logical name") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // file A: 1-3
    VersionedTable.append(spark, root, df(100, 200))              // file B: 100-200
    VersionedTable.renameColumn(spark, root, "id", "doc_id")
    val keep = VersionedTable.prunedFiles(spark, root,
      Map("doc_id" -> (Some(150L), Some(250L))))
    assert(keep.size == 1, s"the renamed column's stats must still prune: $keep")
    // and the DML triad works on the new name
    VersionedTable.deleteWhereVectored(spark, root,
      Map("doc_id" -> (Some(200L), Some(200L))), col("doc_id") === 200)
    assert(VersionedTable.read(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 100L))
  }

  test("drop is metadata-only; re-adding the name never resurrects dead data") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    val filesBefore = VersionedTable.filesOf(spark, root)
    VersionedTable.dropColumn(spark, root, "payload")             // v2
    assert(VersionedTable.filesOf(spark, root) == filesBefore)
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id"))
    // time travel still sees the dropped column's data
    assert(VersionedTable.read(spark, root, Some(1))
      .select("payload").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L))
    // re-add the same NAME: a fresh field — old values must NOT come back
    VersionedTable.addColumn(spark, root, "payload", "bigint")    // v3
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "payload"))
    assert(got.select("payload").collect().forall(_.isNullAt(0)),
      "re-added column must read NULL, never the dropped field's data")
    // and writing to the re-added field round-trips
    VersionedTable.append(spark, root,
      df(9).withColumn("payload", lit(999L)))                     // v4
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 9).select("payload")
      .collect().head.getLong(0) == 999L)
  }

  test("the mapping survives a fresh JSON parse (copied table, cold cache)") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    VersionedTable.append(spark, root,
      df(3).withColumnRenamed("payload", "amount"))               // v3 (delta manifest)
    // copy the whole table: different path => different manifest-cache
    // keys => the reader must PARSE the mapping, not replay the writer's
    // in-memory snapshot
    val copy = Files.createTempDirectory("graft_cm_copy").resolve("t").toString
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        val d = new java.io.File(dst, f.getName)
        if (f.isDirectory) copyDir(f, d)
        else Files.copy(f.toPath, d.toPath)
      }
    }
    copyDir(new java.io.File(root), new java.io.File(copy))
    val got = VersionedTable.read(spark, copy)
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L))
  }

  test("compaction after a rename materializes under the physical name") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))
    VersionedTable.append(spark, root, df(3, 4))
    VersionedTable.renameColumn(spark, root, "payload", "amount")
    VersionedTable.compact(spark, root, targetBytes = 1L << 30)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L))
    // the compacted file carries the frozen physical name too
    val raw = spark.read.parquet(
      new java.io.File(root, VersionedTable.filesOf(spark, root).head).toString)
    assert(raw.columns.contains("payload"),
      s"compacted files must keep the physical name, got ${raw.columns.toSeq}")
  }

  test("partition columns refuse rename and drop; refusals are clear") {
    val root = freshRoot()
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "b")).toDF("id", "bucket")
    VersionedTable.create(spark, root, d, partitionBy = Seq("bucket"))
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "bucket", "b2")
    }
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "bucket")
    }
    assert(e2.getMessage.contains("partition column"))
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "id", "bucket") // exists
    }
  }

  test("CDF across a rename reads both sides under the new names") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2, 3))               // v1
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(2L), Some(2L))), col("id") === 2)         // v3
    val (adds, rems) = VersionedTable.changesBetween(spark, root, 2, 3)
    assert(adds.count() == 0)
    assert(rems.columns.toSeq == Seq("id", "amount"))
    assert(rems.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("a stream STARTED AFTER a rename delivers pre-rename files under the new name") {
    // the stream pins the post-rename logical schema; pre-rename files
    // physically carry the old name — delivery must resolve through the
    // column mapping, or every historical row's renamed column reads
    // NULL (the silent-corruption shape this spec exists to refuse)
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1 (phys: payload)
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    VersionedTable.append(spark, root,
      df(3).withColumnRenamed("payload", "amount"))               // v3
    val out = Files.createTempDirectory("cm_out2").toString
    val q = spark.readStream.format("graft-versioned").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("cm_ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L),
      "pre-rename files' values must arrive under the new logical name")
  }

  test("ignoreSchemaChanges: a pre-rename pinned stream keeps its OLD name") {
    // the complementary delivery mode: the stream pinned 'payload'
    // before the rename; with the escape hatch it keeps delivering
    // under that name — which IS the frozen physical name, so both
    // pre- and post-rename files resolve by fall-through
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    val out = Files.createTempDirectory("cm_out3").toString
    val ckpt = Files.createTempDirectory("cm_ck3").toString
    // ONE continuous query: a restart legitimately re-pins the current
    // (post-rename) schema, so the pre-rename pin only exists live
    val q = spark.readStream.format("graft-versioned")
      .option("ignoreSchemaChanges", "true").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable() // pins (id, payload), snapshot delivered
      VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
      VersionedTable.append(spark, root,
        df(3).withColumnRenamed("payload", "amount"))               // v3
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id", "payload"),
      "the pinned stream keeps its pre-rename column name")
    assert(got.select("payload").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L),
      "post-rename appends' values still arrive (they physically carry " +
        "the frozen old name)")
  }

  test("CDF: a pinned pre-rename stream keeps values through the rename") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    val out = Files.createTempDirectory("cm_cdf_out").toString
    val q = spark.readStream.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("ignoreSchemaChanges", "true").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("cm_cdf_ck").toString).start()
    try {
      q.processAllAvailable() // pinned (id, payload, _change_type)
      VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
      VersionedTable.append(spark, root,
        df(3).withColumnRenamed("payload", "amount"))               // v3
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.columns.contains("payload"))
    assert(got.filter(col("_change_type") === "insert")
      .select("payload").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L),
      "the renamed column's post-rename values must flow under the pin, " +
        "never null-fill")
  }

  test("DOUBLE rename: a stream pinned on the INTERMEDIATE name still " +
    "delivers values (rename lineage, not just phys fall-through)") {
    // payload -> amount -> total, stream pinned between the renames on
    // 'amount'. The pinned name is neither the frozen physical name
    // ('payload', what files carry) nor the current logical ('total'),
    // so both the by-name fall-through and a (phys -> logical) map miss
    // it — only the recorded rename lineage resolves it. Without the
    // lineage every value silently read NULL.
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    val out = Files.createTempDirectory("cm_out_dbl").toString
    val q = spark.readStream.format("graft-versioned")
      .option("ignoreSchemaChanges", "true").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("cm_ck_dbl").toString).start()
    try {
      q.processAllAvailable() // pins (id, amount), snapshot delivered
      VersionedTable.renameColumn(spark, root, "amount", "total")  // v3
      VersionedTable.append(spark, root,
        df(3).withColumnRenamed("payload", "total"))               // v4
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id", "amount"))
    assert(got.select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L),
      "values pinned on the intermediate name must flow, never null-fill")
  }

  test("DOUBLE rename: a pinned CDF stream resolves the intermediate name") {
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    val out = Files.createTempDirectory("cm_cdf_dbl").toString
    val q = spark.readStream.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("ignoreSchemaChanges", "true").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("cm_cdf_ck_dbl").toString).start()
    try {
      q.processAllAvailable() // pinned (id, amount, _change_type)
      VersionedTable.renameColumn(spark, root, "amount", "total")  // v3
      VersionedTable.append(spark, root,
        df(3).withColumnRenamed("payload", "total"))               // v4
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.columns.contains("amount"))
    assert(got.filter(col("_change_type") === "insert")
      .select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L),
      "CDF pinned on the intermediate name must resolve through lineage")
  }

  test("rename lineage: reclaiming a historical name and the ambiguity refusal") {
    // reclaim: payload -> amount -> payload; 'amount' still resolves to
    // the field (its current name never lists itself in the lineage)
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1))
    VersionedTable.renameColumn(spark, root, "payload", "amount")
    VersionedTable.renameColumn(spark, root, "amount", "payload")
    val read = VersionedTable.read(spark, root)
    assert(read.columns.toSeq == Seq("id", "payload"))
    assert(read.select("payload").head.getLong(0) == 10L)
    assert(VersionedTable.historicalToCurrent(spark, root)
      .get("amount").contains(Some("payload")))
    // a chain's every historical name resolves to the head
    VersionedTable.renameColumn(spark, root, "payload", "zz")
    val lin = VersionedTable.historicalToCurrent(spark, root)
    assert(lin.get("amount").contains(Some("zz")) &&
      lin.get("payload").contains(Some("zz")))
    // the SQL inspection face shows the same lineage (ordered by when
    // each name was last relinquished — payload was reclaimed then
    // given up again, so it re-enters after amount)
    val face = spark.sql(s"CALL graft.column_lineage('$root')")
      .collect().map(r => r.getString(1) -> r.getString(3)).toMap
    assert(face("zz") == "amount,payload",
      s"column_lineage must list the full rename chain, got $face")
    // AMBIGUITY, built through the public API: field A once held
    // 'shared' (A: shared -> a1), a NEW column is added under 'shared'
    // and renamed away too (B: shared -> b1) — now BOTH fields carry
    // 'shared' in their lineage, and resolution must map it to None
    // (the readers refuse rather than guess which field a pinned
    // 'shared' meant)
    val root2 = freshRoot()
    VersionedTable.create(spark, root2,
      df(1).withColumnRenamed("payload", "shared"))
    VersionedTable.renameColumn(spark, root2, "shared", "a1")
    VersionedTable.addColumn(spark, root2, "shared", "bigint")
    VersionedTable.renameColumn(spark, root2, "shared", "b1")
    assert(VersionedTable.historicalToCurrent(spark, root2)
      .get("shared").contains(None),
      "a name two fields held over history is ambiguous: None, not a guess")
  }

  test("a live stream refuses a mid-stream rename like any schema change") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    VersionedTable.create(spark, root, df(1, 2))                  // v1
    val out = Files.createTempDirectory("cm_out").toString
    val ckpt = Files.createTempDirectory("cm_ck").toString
    val q = spark.readStream.format("graft-versioned").load(root)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    VersionedTable.renameColumn(spark, root, "payload", "amount") // v2
    VersionedTable.append(spark, root,
      df(3).withColumnRenamed("payload", "amount"))               // v3
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("changed the table schema"),
      s"rename must trip the evolution guard, got: ${e.getMessage}")
  }
}
