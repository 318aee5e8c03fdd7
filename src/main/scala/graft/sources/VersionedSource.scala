package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.sink.VersionedTable

/** The SQL/DataFrame face of [[graft.sink.VersionedTable]]: a stable-API
  * relation provider so a versioned root is a first-class Spark table —
  * `spark.read.format("graft-versioned").load(root)`,
  * `df.write.format("graft-versioned")`, and
  * `CREATE TABLE t USING `graft-versioned` OPTIONS (path ...)` followed by
  * plain SQL, `INSERT INTO` included.
  *
  * The point at 100 TB is WHERE the pushed filters land: Catalyst hands
  * this relation its predicates, and the relation turns them into
  * manifest range-stat pruning plus bloom point-lookup pruning — whole
  * FILES are skipped from the snapshot before Spark's parquet scan ever
  * opens a footer (row-group stats then prune within the survivors; this
  * is the layer above, where the catalog metadata lives). All filters are
  * reported unhandled so Spark re-applies them exactly — pruning here
  * only has to be sound, never exact.
  *
  * Built on the V1 `RelationProvider` API deliberately: it is the public,
  * stable delegation point where a relation may answer a scan with
  * another DataFrame's RDD — so the manifest does the file-set work and
  * Spark's own vectorized parquet reader does the row work. A DSv2
  * `TableProvider` would force re-implementing the parquet read path
  * inside `PartitionReader` (internal APIs), for no additional pushdown:
  * V1 `PrunedFilteredScan` already receives both the column projection
  * and the predicate set.
  *
  * Time travel: `option("versionAsOf", n)` binds the relation to version
  * n's immutable file list — concurrent commits never move a bound scan.
  *
  * Streaming: `spark.readStream.format("graft-versioned").load(root)` —
  * the commit log is the offset line (offset = version number), each
  * micro-batch delivers the rows of the files NEW in `(start, end]`, so
  * the table is a first-class streaming source composable with
  * watermarks, windows, and joins (not just the foreachBatch face of
  * [[VersionedTable.followChanges]]). See [[VersionedStreamSource]].
  */
class VersionedSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft-versioned"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.get("path")
      .orElse(parameters.get("table").map(n =>
        // named spelling for the streaming faces: option("table",
        // "graft.t" | "t") resolves through the catalog registry —
        // the sink analog of readStream.table
        graft.catalog.GraftNames.resolveName(
          org.apache.spark.sql.SparkSession.active,
          n.stripPrefix("graft."))))
      .getOrElse(throw new IllegalArgumentException(
        "graft-versioned requires a path or table option"))

  private def isChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readchangefeed").orElse(parameters.get("readChangeFeed"))
      .exists(_.toBoolean)

  /** The stream's schema is fixed at stream start: the CURRENT manifest
    * DDL. A mid-stream schema change (addColumn) REFUSES the batch that
    * crosses it unless `ignoreSchemaChanges = true`, in which case later
    * files keep reading under the pinned schema (parquet resolves by
    * name; extra columns prune away) — see
    * [[VersionedStreamSource.guardSchemaChange]]. With `readChangeFeed`,
    * a `_change_type` column ("insert"/"delete") is appended — the
    * stream is then the table's CHANGELOG, not its append feed. */
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      VersionedTable.schemaOf(sqlContext.sparkSession, rootOf(parameters)))
    (shortName(),
      if (isChangeFeed(parameters))
        base.add("_change_type", "string", nullable = false)
          .add("_commit_version", "bigint", nullable = false)
      else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val root = rootOf(parameters)
    val cdf = isChangeFeed(parameters)
    val dataSchema = schema
      .map(s => StructType(s.filterNot(f => VersionedSource.CdfCols.contains(f.name))))
      .getOrElse(VersionedTable.schemaOf(sqlContext.sparkSession, root))
    // `startingVersion = "latest"` (Delta parity): changes committed
    // AFTER stream start only — the tail-a-live-table spelling without
    // a wall-clock bound
    val byVersion = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")).map {
        case v if v.equalsIgnoreCase("latest") =>
          VersionedTable.currentVersion(sqlContext.sparkSession, root)
            .getOrElse(0) + 1
        case v => v.toInt
      }
    // startingTimestamp (Delta parity): the stream starts at the FIRST
    // version committed at or after the wall-clock bound — resolved
    // from the manifests' in-commit stamps via the same parse as every
    // other timestamp face. A bound past the newest commit starts the
    // stream AFTER the current head (future commits only) rather than
    // failing — the tail-a-live-table shape.
    val byTimestamp = parameters.get("startingtimestamp")
      .orElse(parameters.get("startingTimestamp")).map { t =>
        val s = sqlContext.sparkSession
        VersionedTable.versionSince(s, root,
            VersionedTable.parseTsMillis(s, t))
          .getOrElse(VersionedTable.currentVersion(s, root).getOrElse(0) + 1)
      }
    require(byVersion.isEmpty || byTimestamp.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    new VersionedStreamSource(sqlContext, root,
      if (cdf) dataSchema.add("_change_type", "string", nullable = false)
        .add("_commit_version", "bigint", nullable = false)
      else dataSchema,
      startingVersion = byVersion.orElse(byTimestamp),
      ignoreChanges = parameters.get("ignorechanges")
        .orElse(parameters.get("ignoreChanges")).exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxversionspertrigger")
        .orElse(parameters.get("maxVersionsPerTrigger")).map(_.toInt),
      changeFeed = cdf,
      ignoreSchemaChanges = parameters.get("ignoreschemachanges")
        .orElse(parameters.get("ignoreSchemaChanges")).exists(_.toBoolean),
      maxBytesPerTrigger = parameters.get("maxbytespertrigger")
        .orElse(parameters.get("maxBytesPerTrigger")).map(_.toLong))
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    // BATCH change-feed face (Delta's table_changes): readChangeFeed +
    // startingVersion [+ endingVersion] returns the per-version row
    // deltas with _change_type and an EXACT per-version _commit_version
    // (the batch face never nets a span — each version diffs its own
    // predecessor, and version 1 is the initial snapshot as inserts)
    if (isChangeFeed(parameters)) {
      val s = sqlContext.sparkSession
      val cur = VersionedTable.currentVersion(s, root).getOrElse(
        throw new IllegalArgumentException(s"no table at $root"))
      // wall-clock range bounds (Delta parity): startingTimestamp →
      // the FIRST version committed at or after it (a bound past the
      // head refuses — an empty batch CDF range is a caller bug, like
      // Delta's table_changes); endingTimestamp → the NEWEST version
      // committed at or before it (what a reader at that instant saw)
      val fromTs = parameters.get("startingtimestamp")
        .orElse(parameters.get("startingTimestamp")).map { t =>
          VersionedTable.versionSince(s, root,
              VersionedTable.parseTsMillis(s, t))
            .getOrElse(throw new IllegalArgumentException(
              s"startingTimestamp '$t' is after the newest commit at $root"))
        }
      val toTs = parameters.get("endingtimestamp")
        .orElse(parameters.get("endingTimestamp")).map(t =>
          VersionedTable.versionAsOf(s, root,
            VersionedTable.parseTsMillis(s, t)))
      val fromV = parameters.get("startingversion")
        .orElse(parameters.get("startingVersion")).map(_.toInt)
      val toV = parameters.get("endingversion")
        .orElse(parameters.get("endingVersion")).map(_.toInt)
      require(fromV.isEmpty || fromTs.isEmpty,
        "startingVersion and startingTimestamp are mutually exclusive")
      require(toV.isEmpty || toTs.isEmpty,
        "endingVersion and endingTimestamp are mutually exclusive")
      val from = fromV.orElse(fromTs).getOrElse(1)
      val to = toV.orElse(toTs).getOrElse(cur)
      require(from >= 1 && from <= to && to <= cur,
        s"table_changes range [$from, $to] must sit inside [1, $cur]")
      require(Seq("versionasof", "versionAsOf", "timestampasof",
        "timestampAsOf", "tag").forall(parameters.get(_).isEmpty),
        "readChangeFeed and time travel (versionAsOf/timestampAsOf/tag) " +
          "are mutually exclusive")
      return new ChangesRelation(sqlContext, root, from, to)
    }
    val byVersion =
      parameters.get("versionasof").orElse(parameters.get("versionAsOf")).map(_.toInt)
    // timestampAsOf: epoch millis or an ISO instant / local datetime
    // (session zone) — the parse shared with RESTORE
    // (VersionedTable.parseTsMillis)
    val byTime = parameters.get("timestampasof")
      .orElse(parameters.get("timestampAsOf")).map { t =>
        VersionedTable.versionAsOf(sqlContext.sparkSession, root,
          VersionedTable.parseTsMillis(sqlContext.sparkSession, t))
      }
    // tag: time travel by NAME — the pinned-snapshot read a training
    // run uses ("train-v1") without carrying version numbers around
    val byTag = parameters.get("tag").map(t =>
      VersionedTable.tagVersion(sqlContext.sparkSession, root, t))
    require(Seq(byVersion, byTime, byTag).count(_.nonEmpty) <= 1,
      "versionAsOf, timestampAsOf and tag are mutually exclusive")
    new VersionedRelation(sqlContext, root,
      byVersion.orElse(byTime).orElse(byTag))
  }

  /** Streaming SINK: `df.writeStream.format("graft-versioned")` — each
    * micro-batch is one commit carrying the batch id as its transaction
    * id, so replay after checkpoint recovery is refused by the txn
    * ledger (exactly-once end to end; the same [[VersionedTable
    * .appendTxn]] discipline the foreachBatch sinks use, without the
    * boilerplate). Append mode appends; Complete mode republishes the
    * whole result per batch (idempotent under replay via overwriteTxn).
    * Source + sink close the loop: a versioned table can be maintained
    * FROM a stream and STREAMED from, through one format name. */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    val root = rootOf(parameters)
    val complete = outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()
    val parts = parameters.get("partitionby").orElse(parameters.get("partitionBy"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(partitionColumns)
    // APPLY CHANGES sink mode: option("mergeKeys", "k1,k2") +
    // option("sequenceBy", "seq") [+ option("deleteFlag", "del")] turns
    // every micro-batch into a sequence-guarded CDC fold
    // ([[VersionedTable.applyChanges]]) instead of an append — the
    // one-line CDC sink, no foreachBatch boilerplate. txn = batch id
    // keeps it exactly-once; the persisted sequence keeps redelivered
    // or out-of-order batches from regressing a key.
    val mergeKeys = parameters.get("mergekeys").orElse(parameters.get("mergeKeys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val sequenceBy = parameters.get("sequenceby").orElse(parameters.get("sequenceBy"))
    val deleteFlag = parameters.get("deleteflag").orElse(parameters.get("deleteFlag"))
    require(mergeKeys.isEmpty == sequenceBy.isEmpty,
      "applyChanges sink mode needs BOTH mergeKeys and sequenceBy")
    require(mergeKeys.isEmpty || !complete,
      "applyChanges sink mode is an update fold — use the default " +
        "(append) output mode, not Complete")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the incoming frame is streaming-tagged; re-wrap its rows as a
        // batch frame before handing it to the commit path
        val spark = data.sparkSession
        val batch = org.apache.spark.sql.graft.StreamingBridge.asBatch(spark, data)
        (mergeKeys, sequenceBy) match {
          case (Some(keys), Some(seqCol)) =>
            VersionedTable.applyChanges(spark, root, batch, keys, seqCol,
              deleteCol = deleteFlag, txn = Some(batchId))
          case _ =>
            if (complete) VersionedTable.overwriteTxn(spark, root, batch, batchId, parts)
            else VersionedTable.appendTxn(spark, root, batch, batchId, parts)
        }
        ()
      }
      override def toString: String = s"VersionedSink[$root]"
    }
  }

  /** DataFrameWriter entry: each SaveMode maps onto one commit — a save
    * is a version, never a directory mutation. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val spark = data.sparkSession
    val exists = VersionedTable.currentVersion(spark, root).isDefined
    // hive partition columns for table CREATION (option("partitionBy",
    // "a,b")); an existing table keeps its manifest-recorded layout
    val parts = parameters.get("partitionby")
      .orElse(parameters.get("partitionBy"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    mode match {
      case SaveMode.ErrorIfExists =>
        require(!exists, s"table already exists at $root")
        VersionedTable.create(spark, root, data, parts)
      case SaveMode.Ignore =>
        if (!exists) VersionedTable.create(spark, root, data, parts)
      case SaveMode.Append =>
        if (exists) VersionedTable.append(spark, root, data)
        else VersionedTable.create(spark, root, data, parts)
      case SaveMode.Overwrite =>
        if (exists) VersionedTable.overwrite(spark, root, data)
        else VersionedTable.create(spark, root, data, parts)
    }
    createRelation(sqlContext, parameters)
  }
}

object VersionedSource {
  /** The change-feed's synthetic columns, appended after the table's
    * own fields: the row's op ("insert"/"delete") and the commit
    * version the delta is as-of (Delta CDF's `_commit_version` —
    * exactly the sequence a downstream applyChanges folds by). */
  val CdfCols: Set[String] = Set("_change_type", "_commit_version")

  /** Driver-side record of the last scan's pruning decision
    * (total files in the snapshot, files actually opened) — the
    * observable specs assert on, since a V1 relation's file pruning is
    * invisible in the physical plan string. */
  final case class ScanInfo(root: String, totalFiles: Int, openedFiles: Int)
  @volatile var lastScan: Option[ScanInfo] = None
}

/** The BATCH change-feed relation — `spark.read
  * .format("graft-versioned").option("readChangeFeed", "true")
  * .option("startingVersion", n)[.option("endingVersion", m)]`: every
  * version in [n, m] diffs its predecessor ([[VersionedTable
  * .changesBetween]] — file-set difference + deletion-vector deltas,
  * positions never on the driver), stamped with `_change_type` and the
  * EXACT `_commit_version`. Version 1 delivers the initial snapshot as
  * inserts. Cost is the sum of per-version deltas, not per-version
  * snapshots — the honest CDC bill. Reads under each diff's to-version
  * schema; a range crossing schema evolution unions by name with
  * missing columns null-filled (what a batch read of the evolved table
  * shows for pre-evolution rows).
  *
  * CONTRACT — no-op updates are CDC-invisible: a rewritten row whose
  * image is IDENTICAL before and after (e.g. `SET v = v * 2` over
  * `v = 0.0`) produces NO update_preimage/update_postimage pair — the
  * diff is the file-set difference, and equal rows cancel. This
  * DIVERGES from Delta CDF, which emits a pair for every physically
  * rewritten row even when nothing changed; audit pipelines ported
  * from Delta must not treat the missing no-op pairs as data loss. */
private[graft] class ChangesRelation(override val sqlContext: SQLContext,
                                     root: String, fromV: Int, toV: Int)
    extends BaseRelation with TableScan {
  import org.apache.spark.sql.functions.{col, lit}
  private def spark = sqlContext.sparkSession

  private lazy val finalSchema: StructType =
    VersionedTable.schemaOf(spark, root, Some(toV))

  private lazy val frame: DataFrame = {
    // every per-version diff aligns to the ENDING version's schema —
    // exactly what a batch read of the evolved table shows. A column
    // RENAMED inside the range resolves through the recorded lineage
    // (its pre-rename changes surface under the current name, never as
    // a second half-null column) — trying EVERY historical alias, so a
    // rename CHAIN (x→y→z) recovers the data written under each of its
    // names; a column DROPPED inside the range leaves the feed with
    // the schema; a name two fields held refuses upstream (lineage
    // maps it to None and it simply never aliases here).
    lazy val h2c = VersionedTable.historicalToCurrent(spark, root, Some(toV))
    // .toSeq FIRST: collecting on the Map would collapse the duplicate
    // current-name keys a rename CHAIN produces (x→z and y→z) down to
    // one arbitrary alias, null-filling the other era's data
    val c2h: Map[String, Seq[String]] = h2c.toSeq.collect {
      case (hist, Some(cur)) => cur -> hist
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(finalSchema.fields.toSeq.map { f =>
        if (have.contains(f.name)) col(f.name)
        else c2h.getOrElse(f.name, Seq.empty).find(have.contains) match {
          case Some(hist) => col(hist).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }: _*)
    }
    // metadata-only versions (DDLs, index builds, constraint changes)
    // deliver no rows: skip them from the plan entirely — a long-lived
    // table is MOSTLY such commits, and each skipped pair is two union
    // children Catalyst never has to analyze
    val perVersion = (fromV to toV).flatMap { v =>
      val changed = v == 1 || VersionedTable.versionChangedRows(spark, root, v)
      if (!changed) None
      else Some {
        val (adds, rems) =
          if (v == 1) {
            val first = VersionedTable.read(spark, root, Some(1))
            (first, first.limit(0))
          } else VersionedTable.changesBetween(spark, root, v - 1, v)
        align(adds).withColumn("_change_type", lit("insert"))
          .unionByName(align(rems).withColumn("_change_type", lit("delete")))
          .withColumn("_commit_version", lit(v.toLong))
      }
    }
    // balanced reduce: a left-deep union over thousands of versions is
    // superlinear to analyze; the tree keeps it logarithmic in depth
    def tree(fs: Seq[DataFrame]): DataFrame =
      if (fs.size == 1) fs.head
      else tree(fs.grouped(2).map(g =>
        if (g.size == 2) g(0).unionByName(g(1)) else g(0)).toSeq)
    if (perVersion.nonEmpty) tree(perVersion)
    else {
      val base = VersionedTable.read(spark, root, Some(toV)).limit(0)
      align(base).withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(toV.toLong))
    }
  }

  // the schema is statically known — answering it must not force the
  // per-version union plan (a schema-only consultation of a
  // thousand-version feed would otherwise pay full plan construction).
  // Data fields go NULLABLE: pre-evolution versions null-fill columns
  // added later, whatever the live table declares.
  override def schema: StructType =
    StructType(finalSchema.fields.map(_.copy(nullable = true)))
      .add("_change_type", "string", nullable = false)
      .add("_commit_version", "bigint", nullable = false)
  override def buildScan(): RDD[Row] = frame.rdd
  override def toString: String = s"ChangesRelation[$root, $fromV..$toV]"
}

/** One bound snapshot of a versioned table (root × optional version).
  * `root`/`version` are public so planner rules (e.g.
  * [[graft.plans.MetaAggregates]]) can consult the bound snapshot's
  * manifest. */
class VersionedRelation(override val sqlContext: SQLContext, val root: String,
                        val version: Option[Int])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark = sqlContext.sparkSession

  override val schema: StructType = VersionedTable.schemaOf(spark, root, version)

  /** Real bytes from the manifest file list, so Catalyst's join planning
    * sees a truthful size (small snapshot ⇒ broadcast-eligible). */
  override def sizeInBytes: Long = VersionedTable.tableBytes(spark, root, version)

  /** Every filter is re-applied by Spark; this relation only prunes. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val preds = VersionedRelation.toRangePreds(filters)
    val rangeKeep = VersionedTable.prunedFiles(spark, root, preds, version)
    val bloomKeep = VersionedRelation.eqStrings(filters)
      .foldLeft(rangeKeep.toSet) { case (acc, (col, value)) =>
        acc.intersect(
          VersionedTable.bloomPrunedFiles(spark, root, col, value, version).toSet)
      }
    val keep = rangeKeep.filter(bloomKeep.contains)
    VersionedSource.lastScan =
      Some(VersionedSource.ScanInfo(root,
        VersionedTable.prunedFiles(spark, root, Map.empty, version).size,
        keep.size))
    val df = VersionedTable.readSubset(spark, root, keep, version)
    val projected =
      if (requiredColumns.isEmpty) df.select() // arity-0 rows keep count(*) exact
      else df.select(requiredColumns.toSeq.map(df.col): _*)
    projected.rdd
  }

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` — a commit either way. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val aligned = data.toDF(schema.fieldNames.toSeq: _*)
    if (overwrite) VersionedTable.overwrite(spark, root, aligned)
    else VersionedTable.append(spark, root, aligned)
  }
}

/** V1 streaming offset carrying a committed version number, optionally
  * mid-version: `part >= 0` means only the first `part` of the
  * version's ADDED files (in manifest order — immutable, so the prefix
  * is stable) have been delivered; -1 means the version is complete.
  * Serialized form is the bare number for complete offsets — a
  * checkpoint written before byte-capped admission existed parses back
  * losslessly — and `v#part` mid-version. */
final case class VersionOffset(v: Long, part: Int = -1)
    extends org.apache.spark.sql.execution.streaming.Offset {
  override def json: String = if (part < 0) v.toString else s"$v#$part"
}

/** Stream a versioned table by following its commit log: offset =
  * version number, micro-batch (start, end] = the rows of data files
  * present in end's manifest but not in start's. Because commits carry
  * files over BY NAME, that diff costs the commit delta — following a
  * 100 TB table reads only what each commit added, never the table.
  *
  * First batch (no checkpoint, no `startingVersion`) delivers the
  * current snapshot — every file of the newest version — then the
  * stream is incremental. `startingVersion = s` starts the feed at
  * commit s instead (s ≤ oldest un-expired version required).
  *
  * Append-only is the contract (the Delta readStream default): a commit
  * in range that REMOVED a file (overwrite, delete, merge-rewrite,
  * compaction) fails the batch — silently re-emitting rewritten rows
  * would double-count downstream aggregates. `ignoreChanges = true`
  * opts into exactly that (rows of rewritten files re-deliver; the
  * consumer deduplicates by key, same caveat as Delta's).
  *
  * Exactly-once: the offset log remembers `end`; replay after a crash
  * re-reads the SAME immutable file set, so re-delivered batches are
  * byte-identical — downstream transactional sinks (appendTxn keyed on
  * batchId) refuse the double-apply. */
class VersionedStreamSource(sqlContext: SQLContext, root: String,
                            override val schema: StructType,
                            startingVersion: Option[Int],
                            ignoreChanges: Boolean,
                            maxVersionsPerTrigger: Option[Int] = None,
                            changeFeed: Boolean = false,
                            ignoreSchemaChanges: Boolean = false,
                            maxBytesPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxRows}

  private def spark = sqlContext.sparkSession

  /** Versions at or below the floor predate the stream's start and are
    * never delivered. */
  private val floorVersion: Int = startingVersion.map(_ - 1).getOrElse(0)

  /** Trigger.AvailableNow pin: versions committed after prepare() are
    * the NEXT run's work — this drain stops at the pinned offset. */
  @volatile private var availableNowCap: Option[Long] = None

  private def versionOf(o: org.apache.spark.sql.execution.streaming.Offset): Int =
    partsOf(o)._1

  /** (version, part) of an offset; part -1 = the version is complete.
    * A bare-number checkpoint from before byte-capped admission parses
    * as complete. */
  private def partsOf(o: org.apache.spark.sql.execution.streaming.Offset)
      : (Int, Int) =
    o match {
      case VersionOffset(v, p) => (v.toInt, p)
      case other => // SerializedOffset from the checkpoint
        val t = other.json.trim
        val i = t.indexOf('#')
        if (i < 0) (t.toInt, -1)
        else (t.substring(0, i).toInt, t.substring(i + 1).toInt)
    }

  /** Version `x`'s ADDED files in manifest order (immutable — the
    * stable sequence mid-version offsets index into). */
  private def addedOf(x: Int): Seq[String] = {
    val prev =
      if (x <= 1) Set.empty[String]
      else VersionedTable.filesOf(spark, root, Some(x - 1)).toSet
    VersionedTable.filesOf(spark, root, Some(x)).filterNot(prev)
  }

  private def fileLen(rel: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root, rel)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    VersionedTable.currentVersion(spark, root)
      .filter(_ > floorVersion).map(v => VersionOffset(v.toLong))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = VersionedTable.currentVersion(spark, root).map(_.toLong)

  /** Versions-per-batch cap, carried in ReadLimit's row-count slot (the
    * unit is OURS to interpret — commits, not rows — exactly as the file
    * source interprets it as files). This is the admission-control knob
    * that turns a 10k-commit backfill into bounded micro-batches instead
    * of one giant first batch. */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val (startV0, startPart) = Option(startOffset)
      .map(o => partsOf(
        org.apache.spark.sql.execution.streaming.SerializedOffset(o.json)))
      .getOrElse((floorVersion, -1))
    val startV = math.max(startV0, floorVersion).toLong
    val current = VersionedTable.currentVersion(spark, root).map(_.toLong)
    val pinned = availableNowCap
      .map(cap => current.map(math.min(_, cap))).getOrElse(current)
    val limited = limit match {
      case r: ReadMaxRows => pinned.map(math.min(_, startV + r.maxRows))
      case _ => pinned
    }
    maxBytesPerTrigger match {
      case Some(budget) =>
        limited.map(_.toInt).flatMap(maxV =>
          byteCappedOffset(startV.toInt, startPart, maxV, budget)).orNull
      case None =>
        // a partially-delivered head version (a byte-capped run whose
        // option was since removed) still has files to finish: complete
        // it even when no NEWER version exists
        limited.filter(mx => mx > startV || (startPart >= 0 && mx >= startV))
          .map(mx => VersionOffset(math.max(mx, startV))).orNull
    }
  }

  /** Byte-capped admission: walk versions (and within a version, its
    * added files in manifest order) from the start offset, admitting
    * files until the next one would cross `budget` — always at least
    * one, so a single file larger than the budget still progresses. A
    * version with no added files (metadata-only commit: addColumn,
    * index builds) passes through for free, so schema guards still
    * fire on it. The change feed is version-granular (its diffs read
    * whole commits), so there admission rounds DOWN to complete
    * versions — never below one. */
  private def byteCappedOffset(startV: Int, startPart: Int, maxV: Int,
                               budget: Long): Option[VersionOffset] =
    try byteCappedWalk(startV, startPart, maxV, budget)
    catch {
      // retention expired an intermediate manifest (addedOf(x) needs x
      // AND x−1): the range cannot be SIZED, but whole-version delivery
      // needs only the endpoint manifests — forfeit the byte cap for
      // this range instead of failing the feed, mirroring
      // changesBetween's forfeit-the-skip on expired intermediates
      case _: IllegalArgumentException =>
        if (maxV > startV || startPart >= 0) Some(VersionOffset(maxV))
        else None
    }

  private def byteCappedWalk(startV: Int, startPart: Int, maxV: Int,
                             budget: Long): Option[VersionOffset] = {
    if (maxV <= startV && startPart < 0) return None
    var bytes = 0L
    var admitted = 0
    var lastV = startV
    var lastPart = startPart
    val firstV = if (startPart >= 0) startV else startV + 1
    var x = firstV
    while (x <= maxV) {
      val a = addedOf(x)
      var i = if (x == startV && startPart >= 0) startPart else 0
      while (i < a.size) {
        val len = fileLen(a(i))
        if (admitted > 0 && bytes + len > budget) {
          // the change feed cannot split a version: round down to the
          // last COMPLETE version (but never refuse all progress)
          return Some(
            if (!changeFeed) {
              if (i == 0) VersionOffset(x - 1) else VersionOffset(x, i)
            }
            else if (x - 1 > startV) VersionOffset(x - 1)
            else VersionOffset(x)) // never round down to no progress
        }
        bytes += len
        admitted += 1
        lastV = x
        lastPart = i + 1
        i += 1
      }
      if (lastV == x && lastPart == a.size) lastPart = -1 // version complete
      if (a.isEmpty) { lastV = x; lastPart = -1 }
      x += 1
    }
    if (lastPart < 0 || changeFeed) {
      // complete through lastV (metadata-only tail versions included)
      val endV = math.max(lastV, maxV)
      if (endV > startV || startPart >= 0) Some(VersionOffset(endV)) else None
    } else Some(VersionOffset(lastV, lastPart))
  }

  /** Mid-stream schema evolution guard, shared by BOTH delivery modes:
    * a running stream keeps its start-time schema, so a commit that
    * widened the table would have its new column silently dropped from
    * every delivered row (and a narrowing would surface phantom nulls).
    * The contract mirrors the `ignoreChanges` precedent: REFUSE the
    * batch with the restart instruction, unless the caller opted into
    * pinned-schema delivery with `ignoreSchemaChanges = true`. Only a
    * change WITHIN `(fromV, toV]` trips the guard — a table that
    * evolved before stream start is simply the stream's schema. */
  private def guardSchemaChange(fromV: Int, toV: Int): Unit = {
    if (ignoreSchemaChanges) return
    // names + types only: a rewrite (compaction) may relax NOT NULL on
    // its output files' schema — nullability-widening delivers the same
    // columns and must not kill the feed
    def shape(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.catalogString))
    val after = shape(VersionedTable.schemaOf(spark, root, Some(toV)))
    if (fromV > 0) {
      val unchanged =
        try shape(VersionedTable.schemaOf(spark, root, Some(fromV))) == after
        catch { case _: IllegalArgumentException => false } // anchor expired
      if (unchanged) return // no change in range
    }
    // the INITIAL batch (fromV == 0) anchors on the PINNED SCHEMA
    // ITSELF, never on a separately-captured construction-time version:
    // a column added between sourceSchema's pin and source construction
    // would make any version-vs-toV compare see two post-change schemas
    // and pass — while the stream delivers the pre-change pin, silently
    // dropping the new column. Falling through to the pinned-schema
    // compares below decides it from the one artifact that cannot race.
    // the change is only a problem for a stream that predates it. A
    // (re)started stream pins the table's schema at start, so it passes
    // when the range's END schema equals its pin — and also when its
    // pin equals the CURRENT schema even though toV's doesn't (a SECOND
    // change landed above this replayed range while the stream was
    // down: delivering the old range under the final pinned schema,
    // null-filled, is exactly the correct replay). Refusing either case
    // would wedge the restart forever and make the error's own remedy
    // a lie.
    val pinned = shape(StructType(schema.filterNot(f =>
      VersionedSource.CdfCols.contains(f.name))))
    if (after == pinned) return
    val current =
      try shape(VersionedTable.schemaOf(spark, root))
      catch { case _: IllegalArgumentException => Seq.empty }
    if (pinned == current) return
    throw new IllegalStateException(
      s"versions ($fromV, $toV] of $root changed the table schema; this " +
        "stream pinned its schema before the change, so delivering would " +
        "silently drop it. Restart the stream to adopt the new schema, or " +
        "set ignoreSchemaChanges=true to keep delivering the pinned columns.")
  }

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
                        end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val (fromV0, fromPart) = start.map(partsOf).getOrElse((floorVersion, -1))
    val fromV = math.max(fromV0, floorVersion)
    val (toV, toPart) = partsOf(end)
    guardSchemaChange(fromV, toV)
    if (changeFeed) return changeFeedBatch(fromV, toV)
    val before =
      if (fromV == 0) Set.empty[String]
      else VersionedTable.filesOf(spark, root, Some(fromV)).toSet
    val after = VersionedTable.filesOf(spark, root, Some(toV))
    val removed = before -- after.toSet
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"versions ($fromV, $toV] of $root removed ${removed.size} data " +
          "file(s) (overwrite/delete/compaction): not an append-only feed. " +
          "Set ignoreChanges=true to re-deliver rewritten files' rows.")
    // a vectored delete removes ROWS while the file set stands still —
    // detect it from the manifest's deletion-vector references, or the
    // append-only contract silently loses the deleted rows' absence
    val dvBefore =
      if (fromV == 0) Map.empty[String, (String, Long)]
      else VersionedTable.dvRefs(spark, root, Some(fromV))
    val dvAfter = VersionedTable.dvRefs(spark, root, Some(toV))
    val dvChanged = after.exists(f =>
      before.contains(f) && dvBefore.get(f) != dvAfter.get(f))
    if (dvChanged && !ignoreChanges)
      throw new IllegalStateException(
        s"versions ($fromV, $toV] of $root changed deletion vectors " +
          "(merge-on-read delete): not an append-only feed. Set " +
          "ignoreChanges=true to continue (removed rows are never " +
          "re-delivered).")
    val fresh =
      if (fromPart < 0 && toPart < 0) after.filterNot(before)
      else {
        // MID-VERSION batch (byte-capped admission): the file list is a
        // deterministic function of the two offsets alone — per-version
        // ADDED lists in manifest order, sliced by the offsets' part
        // indices — so a checkpoint replay rebuilds the identical batch.
        // Under ignoreChanges a file rewritten away later in the range
        // is dropped like the whole-version path's net difference.
        val afterSet = after.toSet
        val firstV = if (fromPart >= 0) fromV else fromV + 1
        try (firstV to toV).flatMap { x =>
          val a = addedOf(x)
          val lo = if (x == fromV && fromPart >= 0) fromPart else 0
          val hi = if (x == toV && toPart >= 0) toPart else a.size
          a.slice(lo, hi)
        }.filter(f => !ignoreChanges || afterSet.contains(f))
        catch {
          // retention expired an intermediate manifest of the range. For
          // a complete-version END offset the same batch is derivable
          // from the ENDPOINTS alone: everything net-new minus the
          // already-delivered prefix of fromV's added list (whose two
          // manifests are the checkpointed restart point — if THOSE are
          // gone the feed is genuinely unrecoverable and the error
          // stands). A mid-version end offset references the expired
          // order itself; nothing sound can rebuild it.
          case e: IllegalArgumentException if toPart < 0 =>
            // fromV's UNDELIVERED tail sits inside `before` (filesOf
            // already includes the whole version) — add it back
            val tail =
              if (fromPart < 0) Seq.empty[String]
              else addedOf(fromV).drop(fromPart)
            (tail ++ after.filterNot(before))
              .filter(f => !ignoreChanges || afterSet.contains(f))
          case e: IllegalArgumentException => throw new IllegalStateException(
            s"cannot rebuild mid-version batch ($fromV#$fromPart, $toV#$toPart] " +
              s"of $root: an intermediate manifest expired (${e.getMessage}). " +
              "Raise manifest retention above checkpoint replay depth.", e)
        }
      }
    // partition-aware read under the stream's PINNED schema (partition
    // values resolve from the k=v dir names, clones included); rows a
    // vector already deleted AT toV are not delivered — a replay of this
    // batch re-resolves the same immutable manifest, so re-delivery stays
    // byte-identical
    val batch = VersionedTable.readFilesAs(spark, root, fresh, schema, Some(toV))
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(spark, batch, schema)
  }

  /** CHANGE-FEED delivery for `(fromV, toV]`: the table's changelog as
    * typed rows. Inserts are the net-new rows, deletes the net-removed
    * ones — both from [[VersionedTable.changesBetween]], so the batch
    * reads only the file-set difference plus deletion-vector deltas;
    * carried-over rewrites (compaction) cancel and deliver NOTHING.
    * Unlike the append feed, removals are first-class rows here, so the
    * append-only guard does not apply. A replayed batch re-resolves the
    * same immutable manifests — re-delivery is byte-identical, and a
    * downstream folding the feed by key with batch-id txns stays
    * exactly-once. The initial batch (fromV = floor) delivers the start
    * snapshot as inserts. */
  private def changeFeedBatch(fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dataFields = schema.filterNot(f =>
      VersionedSource.CdfCols.contains(f.name))
    // every delivered frame aligns to the STREAM's pinned schema: a
    // checkpoint-recovery replay re-reads versions that may PREDATE a
    // later addColumn while the restarted source already pinned the
    // widened schema — pre-evolution rows null-fill the new column
    // (exactly what a batch read of the evolved table shows for them)
    // a pinned PRE-RENAME name isn't gone — the field lives on under its
    // current logical name; resolve it through the recorded rename
    // LINEAGE (any historical name, a double-rename's intermediate one
    // included) before null-filling, or a pinned CDF stream silently
    // loses every renamed column's values. A name two fields held over
    // history refuses rather than guesses.
    lazy val h2c = VersionedTable.historicalToCurrent(spark, root, Some(toV))
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(dataFields.map(f =>
        if (have.contains(f.name)) col(f.name)
        else h2c.get(f.name) match {
          case Some(Some(cur)) if have.contains(cur) => col(cur).as(f.name)
          case Some(None) => throw new IllegalStateException(
            s"pinned column ${f.name} matches the rename lineage of more " +
              "than one field; restart the stream to adopt the current schema")
          case _ => lit(null).cast(f.dataType).as(f.name)
        }): _*)
    }
    val (add, rem) =
      if (fromV == 0) {
        val first = VersionedTable.read(spark, root, Some(toV))
        (first, first.limit(0))
      } else VersionedTable.changesBetween(spark, root, fromV, toV)
    // _commit_version: the version this delta is AS-OF — exact when
    // the trigger admits one version per batch (maxVersionsPerTrigger=1,
    // the CDC-pipeline setting); a multi-version batch NETS its span
    // (carried rewrites cancel), so its rows all carry the span head
    val batch = align(add)
      .withColumn("_change_type", lit("insert"))
      .unionByName(align(rem)
        .withColumn("_change_type", lit("delete")))
      .withColumn("_commit_version", lit(toV.toLong))
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(spark, batch, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"VersionedStreamSource[$root]"
}

object VersionedRelation {

  /** A pushed literal, converted to the manifest stat domain: dates as
    * days-since-epoch and timestamps as epoch micros (the parquet
    * physical values the footer stats recorded), integrals as Long,
    * fractionals as Double, strings as-is. None ⇒ the literal is not
    * stat-comparable and contributes no bound (sound: prunes less). */
  private def statValue(v: Any): Option[Any] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case t: java.time.Instant =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case n: java.lang.Byte => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Long => Some(n.longValue())
    case n: java.lang.Float => Some(n.doubleValue())
    case n: java.lang.Double => Some(n.doubleValue())
    case n: java.math.BigDecimal => Some(n.doubleValue())
    case n: scala.math.BigDecimal => Some(n.toDouble)
    case s: String => Some(s)
    case _ => None
  }

  private def cmpV(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None // mixed domains never combine
  }

  /** Fold the pushed predicate set into per-column inclusive ranges for
    * manifest pruning. Strict bounds relax to inclusive (sound), `In`
    * becomes its [min, max] envelope, `StringStartsWith` its prefix
    * interval, `And` recurses; anything else (Or, Not, null tests, UDFs)
    * contributes nothing — those rows still filter exactly, post-scan. */
  def toRangePreds(filters: Array[Filter]): VersionedTable.RangePreds = {
    val los = scala.collection.mutable.Map.empty[String, Any]
    val his = scala.collection.mutable.Map.empty[String, Any]
    def tightenLo(col: String, v: Any): Unit =
      los.get(col) match {
        case Some(cur) => if (cmpV(v, cur).exists(_ > 0)) los(col) = v
        case None => los(col) = v
      }
    def tightenHi(col: String, v: Any): Unit =
      his.get(col) match {
        case Some(cur) => if (cmpV(v, cur).exists(_ < 0)) his(col) = v
        case None => his(col) = v
      }
    def walk(f: Filter): Unit = f match {
      case EqualTo(c, v) => statValue(v).foreach { sv => tightenLo(c, sv); tightenHi(c, sv) }
      case EqualNullSafe(c, v) if v != null =>
        statValue(v).foreach { sv => tightenLo(c, sv); tightenHi(c, sv) }
      case GreaterThan(c, v) => statValue(v).foreach(tightenLo(c, _))
      case GreaterThanOrEqual(c, v) => statValue(v).foreach(tightenLo(c, _))
      case LessThan(c, v) => statValue(v).foreach(tightenHi(c, _))
      case LessThanOrEqual(c, v) => statValue(v).foreach(tightenHi(c, _))
      case In(c, vs) if vs.nonEmpty =>
        val svs = vs.toSeq.flatMap(v => statValue(v))
        // envelope only when every literal converted and shares a domain
        if (svs.size == vs.length && svs.forall(v => cmpV(v, svs.head).isDefined)) {
          val sorted = svs.sortWith((a, b) => cmpV(a, b).exists(_ < 0))
          tightenLo(c, sorted.head); tightenHi(c, sorted.last)
        }
      case StringStartsWith(c, p) if p.nonEmpty =>
        tightenLo(c, p); tightenHi(c, p + '￿')
      case And(l, r) => walk(l); walk(r)
      case _ => ()
    }
    filters.foreach(walk)
    (los.keySet ++ his.keySet).map(c => c -> (los.get(c), his.get(c))).toMap
  }

  /** Equality literals usable for bloom pruning — the value must render
    * exactly as Spark's cast-to-string (what [[VersionedTable.indexBloom]]
    * hashed): strings, integrals, and dates do; floats/timestamps are
    * excluded (rendering drift would prune wrongly). */
  def eqStrings(filters: Array[Filter]): Seq[(String, String)] = {
    def walk(f: Filter): Seq[(String, String)] = f match {
      case EqualTo(c, v) => render(v).map(c -> _).toSeq
      case EqualNullSafe(c, v) if v != null => render(v).map(c -> _).toSeq
      case And(l, r) => walk(l) ++ walk(r)
      case _ => Seq.empty
    }
    def render(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case n: java.lang.Byte => Some(n.toString)
      case n: java.lang.Short => Some(n.toString)
      case n: java.lang.Integer => Some(n.toString)
      case n: java.lang.Long => Some(n.toString)
      case d: java.sql.Date => Some(d.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    filters.toSeq.flatMap(walk)
  }
}
