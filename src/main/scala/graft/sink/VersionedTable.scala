package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based versioned table format: snapshot-isolated reads, time
  * travel, rollback, compaction-as-commit, and snapshot expiry over plain
  * parquet — the single-writer core of what table formats (Iceberg/Delta,
  * public designs) provide, built here so the sink layer has a commit
  * protocol that scales past directory renames.
  *
  * Layout:
  * {{{
  *   root/
  *     _log/v00000001.manifest.json   // immutable: file list of version 1
  *     _log/v00000002.manifest.json
  *     data/c2-part-....parquet       // immutable data files (never
  *                                    // rewritten; GC'd only by expire)
  * }}}
  *
  * Commit = write data files under a version-unique prefix, then RENAME
  * the manifest into `_log/` — one atomic filesystem operation publishes
  * the version; a crash before it leaves only unreferenced orphan files
  * (removed by [[expire]]). The newest manifest in `_log/` IS the table
  * state: there is no mutable pointer file to corrupt.
  *
  * Why this matters at 100 TB: [[Writers.compact]] swaps a directory via
  * rename-aside and documents the reader-visible gap; here a compaction
  * or overwrite is just a new manifest — concurrent readers that resolved
  * version N keep reading N's immutable files, and time travel/rollback
  * fall out for free. Single-JVM single-writer by design (like the
  * reference loader); a multi-writer deployment adds a catalog CAS on the
  * version number, not a different layout.
  */
object VersionedTable {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new Path(root, "_log")
  private def dataDir(root: String) = new Path(root, "data")
  private def manifestPath(root: String, v: Int) =
    new Path(logDir(root), f"v$v%08d.manifest.json")

  private val ManifestRe = """v(\d{8})\.manifest\.json""".r

  /** All committed versions, ascending (empty for a non-table path). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = logDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toInt
    }.toSeq.sorted
  }

  /** Newest committed version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  private case class Manifest(version: Int, schemaDdl: String, files: Seq[String],
                              txn: Option[Long] = None)

  // Minimal JSON (de)serialization — file names are commit-generated
  // (uuid-free parquet part names under our own prefix, no escapes
  // needed); the schema DDL is JSON-escaped.
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
  private def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'n' => b += '\n'; i += 2
            case 'u' => b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => b += c; i += 2
          }
        case c => b += c; i += 1
      }
    }
    b.toString
  }

  private def writeManifest(spark: SparkSession, root: String, m: Manifest): Unit = {
    val txnField = m.txn.map(t => s""" "txn": $t,\n""").getOrElse("")
    val json =
      s"""{"version": ${m.version},
         |$txnField "schema": "${esc(m.schemaDdl)}",
         | "files": [${m.files.map(f => "\"" + f + "\"").mkString(", ")}]}""".stripMargin
    val target = manifestPath(root, m.version)
    val f = fs(spark, target)
    f.mkdirs(logDir(root))
    val tmp = new Path(logDir(root), s".v${m.version}.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // the atomic publish: rename into the manifest name. A pre-existing
    // target (two writers racing the same version) fails the rename —
    // single-writer is the contract, but we still refuse to clobber.
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"version ${m.version} already committed at $root")
    }
  }

  private def readManifest(spark: SparkSession, root: String, v: Int): Manifest = {
    val p = manifestPath(root, v)
    val f = fs(spark, p)
    require(f.exists(p), s"no version $v at $root (have ${versions(spark, root)})")
    val in = f.open(p)
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    val schema = """"schema": "((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(text).map(m => unesc(m.group(1))).getOrElse("")
    val files = """"files": \[([^\]]*)\]""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    val txn = """"txn": (\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
    Manifest(v, schema, files, txn)
  }

  /** Transaction ids recorded by committed versions — the idempotence
    * ledger a streaming writer consults before re-applying a batch. */
  def committedTxns(spark: SparkSession, root: String): Set[Long] =
    versions(spark, root)
      .flatMap(v => readManifest(spark, root, v).txn).toSet

  /** Write `df`'s rows as immutable data files under a version-unique
    * prefix and return their table-relative paths. The parquet job writes
    * to a scratch dir; files are MOVED (renamed) under data/ — cheap and
    * local to the table root. */
  private def writeDataFiles(spark: SparkSession, root: String, df: DataFrame,
                             version: Int): Seq[String] = {
    val scratch = new Path(root, s".stage-v$version")
    val f = fs(spark, scratch)
    df.write.mode("overwrite").option("compression", "zstd")
      .parquet(scratch.toString)
    f.mkdirs(dataDir(root))
    val moved = f.listStatus(scratch)
      .filter(_.getPath.getName.startsWith("part-"))
      .map { st =>
        val name = s"c$version-${st.getPath.getName}"
        val dst = new Path(dataDir(root), name)
        require(f.rename(st.getPath, dst), s"stage move failed: ${st.getPath}")
        s"data/$name"
      }.toSeq
    f.delete(scratch, true)
    moved
  }

  private def commit(spark: SparkSession, root: String, df: DataFrame,
                     carryOver: Seq[String], txn: Option[Long] = None): Int = {
    val v = currentVersion(spark, root).getOrElse(0) + 1
    val files = carryOver ++ writeDataFiles(spark, root, df, v)
    writeManifest(spark, root, Manifest(v, df.schema.toDDL, files, txn))
    v
  }

  /** Create version 1 of a new table (fails if the table exists). */
  def create(spark: SparkSession, root: String, df: DataFrame): Int = {
    require(currentVersion(spark, root).isEmpty, s"table exists at $root")
    commit(spark, root, df, Seq.empty)
  }

  /** Append: new version = previous files + the new rows' files. The
    * incoming schema must match the table schema (same DDL) — the
    * guard a schema-on-write table enforces. */
  def append(spark: SparkSession, root: String, df: DataFrame): Int = {
    val cur = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"no table at $root"))
    val m = readManifest(spark, root, cur)
    require(m.schemaDdl == df.schema.toDDL,
      s"schema mismatch: table has [${m.schemaDdl}], append has [${df.schema.toDDL}]")
    commit(spark, root, df, m.files)
  }

  /** Overwrite: new version references ONLY the new rows' files (logical
    * truncate-and-load); earlier versions stay readable until expired. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, Seq.empty)

  /** Idempotent transactional append — the streaming-sink entry point:
    * commit `df` under transaction id `txn` (a micro-batch id), creating
    * the table on first use; if some committed version already carries
    * `txn`, the call is a NO-OP (returns the current version). This is
    * what makes a foreachBatch writer exactly-once under batch REPLAY —
    * checkpoint loss or restart re-delivers a batch, the txn ledger
    * refuses the double-apply. */
  def appendTxn(spark: SparkSession, root: String, df: DataFrame, txn: Long): Int =
    currentVersion(spark, root) match {
      case None => commit(spark, root, df, Seq.empty, Some(txn))
      case Some(cur) =>
        if (committedTxns(spark, root).contains(txn)) cur
        else {
          val m = readManifest(spark, root, cur)
          require(m.schemaDdl == df.schema.toDDL,
            s"schema mismatch: table has [${m.schemaDdl}], append has [${df.schema.toDDL}]")
          commit(spark, root, df, m.files, Some(txn))
        }
    }

  /** Snapshot-isolated read of `version` (default: newest). The returned
    * frame is bound to that version's immutable file list — later commits
    * and compactions never change what it reads. */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalArgumentException(s"no table at $root"))
    val m = readManifest(spark, root, v)
    if (m.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  /** Rollback: publish an older version's exact file list as the NEW
    * newest version (history is preserved — undo is itself a commit). */
  def rollback(spark: SparkSession, root: String, to: Int): Int = {
    val m = readManifest(spark, root, to)
    val v = currentVersion(spark, root).get + 1
    writeManifest(spark, root, Manifest(v, m.schemaDdl, m.files))
    v
  }

  /** Compaction as a commit: rewrite the newest version into
    * ceil(bytes/targetBytes) files and publish as a new version. Readers
    * of any resolved version are untouched — this is the catalog-swap
    * answer to [[Writers.compact]]'s rename-aside caveat. No-op (returns
    * current version) when already at or below the target count. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val cur = currentVersion(spark, root)
      .getOrElse(throw new IllegalArgumentException(s"no table at $root"))
    val m = readManifest(spark, root, cur)
    val f = fs(spark, new Path(root))
    val bytes = m.files.map(p => f.getFileStatus(new Path(root, p)).getLen).sum
    val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (target >= m.files.size) return cur
    val df = read(spark, root, Some(cur)).repartition(target)
    overwrite(spark, root, df)
  }

  /** Expire all but the newest `keepLast` versions: their manifests are
    * deleted, then any data file referenced by NO surviving manifest is
    * removed (this also sweeps orphans from crashed commits). Returns
    * (manifests deleted, data files deleted). */
  def expire(spark: SparkSession, root: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the newest version")
    val vs = versions(spark, root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val f = fs(spark, new Path(root))
    val live = keep.flatMap(v => readManifest(spark, root, v).files).toSet
    drop.foreach(v => f.delete(manifestPath(root, v), false))
    val dd = dataDir(root)
    val removed =
      if (!f.exists(dd)) 0
      else f.listStatus(dd).count { st =>
        val rel = s"data/${st.getPath.getName}"
        !live.contains(rel) && f.delete(st.getPath, false)
      }
    (drop.size, removed)
  }
}
