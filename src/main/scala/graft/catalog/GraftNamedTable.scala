package graft.catalog

import java.util.{Map => JMap, Set => JSet}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TruncatableTable}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.sink.VersionedTable

/** The NAME → root registry behind the `graft` catalog's table face: the
  * reference addresses its tables by NAME over a connection
  * (`load_to_postgis.py:140-149` — `SELECT id FROM ndvi_full WHERE …`),
  * so the engine's tables get the same UX through a Spark
  * [[org.apache.spark.sql.connector.catalog.TableCatalog]]:
  * `SELECT … FROM graft.ndvi_full`, `INSERT INTO graft.ndvi_full …`,
  * `ALTER TABLE graft.ndvi_full ADD COLUMNS (…)` in vanilla Spark SQL.
  *
  * A name resolves in two ways, both rooted at the WAREHOUSE directory
  * (the runtime conf `spark.sql.catalog.graft.warehouse` — read at each
  * access, so a session can point at its warehouse after startup):
  *
  *   1. a LINK: `<warehouse>/_names/<name>.link` holds the absolute
  *      root of an existing table anywhere on storage (written by
  *      `CALL graft.register_table('name', '/path')`) — dropping the
  *      name removes the link, never the data;
  *   2. a MANAGED directory: `<warehouse>/<name>` with a `_log` — what
  *      `CREATE TABLE graft.name …` makes; dropping deletes it.
  *
  * Resolution is one file read / one existence probe — O(1) driver
  * metadata, nothing that grows with table size. */
object GraftNames {
  val WarehouseConf = "spark.sql.catalog.graft.warehouse"
  private val NameRe = """[A-Za-z_][A-Za-z0-9_]*""".r

  /** Names are one or two dot-separated segments: `t` (top level) or
    * `db.t` (namespaced — `graft.db.t` in SQL). Each segment is
    * word-only, which doubles as the path-traversal guard; the
    * warehouse layout is the path join (`<warehouse>/db/t`,
    * `<warehouse>/_names/db/t.link`), so a namespace is one directory
    * level and resolution stays one link read. */
  private def segments(name: String): Seq[String] = name.split('.').toSeq
  private def rel(name: String): String = segments(name).mkString("/")

  def warehouse(spark: SparkSession): Option[String] =
    spark.conf.getOption(WarehouseConf).map(_.stripSuffix("/"))
      .filter(_.nonEmpty)

  private def requireWarehouse(spark: SparkSession): String =
    warehouse(spark).getOrElse(throw new IllegalArgumentException(
      s"named graft tables need the warehouse conf: SET $WarehouseConf = '/dir'"))

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def linkPath(w: String, name: String) =
    new Path(s"$w/_names", s"${rel(name)}.link")

  def validName(name: String): Boolean = {
    val segs = segments(name)
    segs.nonEmpty && segs.length <= 2 && segs.forall(NameRe.matches) &&
      // a 2-segment name's FIRST segment is a namespace directory —
      // the engine-state guard applies (no `_x.t` under `$w/_x`)
      (segs.length == 1 || !segs.head.startsWith("_"))
  }

  /** One namespace/table SEGMENT — the path-traversal guard for every
    * name-to-path join (a backticked `../evil` must never escape the
    * warehouse). */
  def validSegment(s: String): Boolean = NameRe.matches(s)

  /** A NAMESPACE segment additionally may not start with '_': the
    * warehouse's '_'-prefixed directories are ENGINE state (`_names`
    * is the link registry) — without this guard `DROP NAMESPACE
    * graft._names` would probe as an existing empty namespace and
    * recursively delete every registered table name. */
  def validNamespace(db: String): Boolean =
    validSegment(db) && !db.startsWith("_")

  /** O(1) namespace existence: a direct probe of the ONE candidate —
    * the managed DIRECTORY (that is not itself a table; a stray plain
    * file never reads as a namespace) or its link subdirectory — never
    * a warehouse-wide listing (which is O(tables) filesystem
    * round-trips and runs on every USE / name resolution). */
  def namespaceExists(spark: SparkSession, db: String): Boolean =
    validNamespace(db) && warehouse(spark).exists { w =>
      val dir = new Path(s"$w/$db")
      val f = fs(spark, dir)
      def isDir(p: Path): Boolean =
        f.exists(p) && f.getFileStatus(p).isDirectory
      (isDir(dir) &&
        VersionedTable.currentVersion(spark, dir.toString).isEmpty) ||
        isDir(new Path(s"$w/_names/$db"))
    }

  /** True when `$w/<db>` is an existing MANAGED TABLE root — a name
    * that can never double as a namespace directory. Without this
    * guard, `CREATE TABLE graft.db.t` with `db` an existing top-level
    * table would nest t's data INSIDE that table's root: `DROP TABLE
    * graft.db` then recursively deletes the nested table, while
    * `SHOW TABLES IN graft.db` throws NoSuchNamespaceException even as
    * `SELECT FROM graft.db.t` works — the split-brain the link-shadow
    * guard already refuses for the flat case. */
  def tableShadowsNamespace(spark: SparkSession, db: String): Boolean =
    warehouse(spark).exists(w =>
      VersionedTable.currentVersion(spark, s"$w/$db").nonEmpty)

  /** The namespace-segment guard for every 2-segment name-to-path
    * binding (managed create and link register). */
  private def requireNamespaceSegmentFree(spark: SparkSession,
                                          name: String): Unit = {
    val segs = segments(name)
    if (segs.length == 2)
      require(!tableShadowsNamespace(spark, segs.head),
        s"cannot use '${segs.head}' as a namespace: a managed table " +
          s"already lives at that warehouse path — DROP TABLE " +
          s"graft.${segs.head} first, or pick another namespace")
  }

  /** The SYMMETRIC shadow guard: a top-level managed CREATE may not land
    * on an existing NAMESPACE (the table would swallow the namespace's
    * directory — `SHOW TABLES IN graft.x` dies while `graft.x` reads as
    * a table, and any tables inside become orphans). True when `x` is a
    * live namespace OR its directory still holds nested tables/links. */
  def namespaceShadowsTable(spark: SparkSession, x: String): Boolean =
    validNamespace(x) &&
      (namespaceExists(spark, x) || list(spark, Some(x)).nonEmpty)

  /** Bind `name` to an EXISTING table root (the link form). Re-binding
    * an existing name is an update — the link is the only state. */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    require(validName(name),
      s"table name must be 1-2 dot-separated ${NameRe.regex} segments: $name")
    require(VersionedTable.currentVersion(spark, root).nonEmpty,
      s"no graft table at $root — create it first, then register")
    requireNamespaceSegmentFree(spark, name)
    val w = requireWarehouse(spark)
    // a link may not SHADOW a managed table: the two-bindings state
    // would make DROP ambiguous (remove the link and the name silently
    // falls back to the managed directory)
    require(VersionedTable.currentVersion(spark, s"$w/${rel(name)}").isEmpty,
      s"$name is a managed table at $w/${rel(name)} — DROP it first, or " +
        "pick another name")
    val lp = linkPath(w, name)
    val f = fs(spark, lp)
    f.mkdirs(lp.getParent)
    val out = f.create(lp, true)
    try out.write(root.getBytes("UTF-8")) finally out.close()
  }

  def unregister(spark: SparkSession, name: String): Boolean =
    validName(name) && {
      val lp = linkPath(requireWarehouse(spark), name)
      fs(spark, lp).delete(lp, false)
    }

  /** The root `name` resolves to: link first (explicit wins), then the
    * managed `<warehouse>/<name>` directory if it holds a table. */
  def lookup(spark: SparkSession, name: String): Option[String] =
    // NameRe is also the traversal guard: a backticked name like `..`
    // must never resolve (or worse, DROP) a directory outside the
    // warehouse
    if (!validName(name)) None
    else warehouse(spark).flatMap { w =>
      val lp = linkPath(w, name)
      val f = fs(spark, lp)
      if (f.exists(lp)) {
        val in = f.open(lp)
        val root = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        Some(root)
      } else {
        val managed = s"$w/${rel(name)}"
        if (VersionedTable.currentVersion(spark, managed).nonEmpty) Some(managed)
        else None
      }
    }

  /** Accept either spelling where a procedure takes a table: a PATH
    * (anything with a '/') passes through; a bare registered NAME
    * resolves; an unknown bare token passes through unchanged so the
    * downstream "no table at <x>" error names what the caller typed. */
  def resolve(spark: SparkSession, pathOrName: String): String =
    if (pathOrName.contains('/')) pathOrName
    else lookup(spark, pathOrName).getOrElse(pathOrName)

  /** resolve() for SQL named targets: unknown names REFUSE with the
    * setup hint instead of falling through as a relative path. */
  def resolveName(spark: SparkSession, name: String): String =
    lookup(spark, name).getOrElse(throw new IllegalArgumentException(
      s"no graft table named $name" + warehouse(spark).fold(
        s" (warehouse conf $WarehouseConf is unset)")(w =>
        s" under warehouse $w — CREATE TABLE graft.$name … or " +
          s"CALL graft.register_table('$name', '/path')")))

  /** Every visible name in one namespace level: links plus managed
    * directories with a table. `db = None` lists the TOP level (bare
    * names); `db = Some(ns)` lists inside `graft.ns` (bare table
    * segments, not re-qualified). */
  def list(spark: SparkSession, db: Option[String] = None): Seq[String] =
    warehouse(spark).toSeq.flatMap { w =>
      require(db.forall(validNamespace), s"bad namespace: ${db.get}")
      val sub = db.fold("")(x => s"/$x")
      val wp = new Path(w + sub)
      val f = fs(spark, wp)
      val links =
        if (!f.exists(new Path(s"$w/_names$sub"))) Seq.empty
        else f.listStatus(new Path(s"$w/_names$sub")).toSeq
          .map(_.getPath.getName)
          .filter(_.endsWith(".link")).map(_.stripSuffix(".link"))
      val managed =
        if (!f.exists(wp)) Seq.empty
        else f.listStatus(wp).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(n => !n.startsWith("_"))
          .filter(n => VersionedTable.currentVersion(spark,
            s"$w$sub/$n").nonEmpty)
      (links ++ managed).distinct.sorted
    }

  /** Namespace directories the warehouse currently holds: top-level
    * non-table directories plus `_names` subdirectories (a namespace
    * that exists only as links still lists). */
  def listNamespaces(spark: SparkSession): Seq[String] =
    warehouse(spark).toSeq.flatMap { w =>
      val wp = new Path(w)
      val f = fs(spark, wp)
      val dirs =
        if (!f.exists(wp)) Seq.empty
        else f.listStatus(wp).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(n => !n.startsWith("_"))
          .filter(n => NameRe.matches(n) &&
            VersionedTable.currentVersion(spark, s"$w/$n").isEmpty)
      val linkDirs =
        if (!f.exists(new Path(w, "_names"))) Seq.empty
        else f.listStatus(new Path(w, "_names")).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(NameRe.matches(_))
      (dirs ++ linkDirs).distinct.sorted
    }

  /** Managed location for CREATE TABLE graft.name / graft.db.name. */
  def managedRoot(spark: SparkSession, name: String): String = {
    require(validName(name),
      s"table name must be 1-2 dot-separated ${NameRe.regex} segments: $name")
    val segs = segments(name)
    if (segs.length == 2) requireNamespaceSegmentFree(spark, name)
    else require(!namespaceShadowsTable(spark, name),
      s"cannot create table '$name': a namespace with that name exists " +
        s"— DROP NAMESPACE graft.$name first, or pick another name")
    s"${requireWarehouse(spark)}/${rel(name)}"
  }
}

/** The DSv2 [[Table]] a name loads to. WRITES go through the V1 write
  * bridge ([[V1Write]] → [[InsertableRelation]]): `INSERT INTO graft.t`
  * and `INSERT OVERWRITE graft.t` become the engine's committed
  * append/overwrite — the same write path `.format("graft-versioned")`
  * uses, with its rebase-on-conflict and contract enforcement. READS
  * never execute through this Table: [[GraftNamedTableReads]] swaps the
  * resolved relation for the DSv1 versioned relation (stats pruning,
  * truthful sizeInBytes, MetaAggregates) before planning, which is why
  * no read capability is declared here. `asOf` pins time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF` resolve it at loadTable). */
case class GraftNamedTable(tableName: String, root: String,
                           asOf: Option[Int] = None)
    extends Table with SupportsWrite with TruncatableTable {
  override def name(): String = tableName
  // ONE manifest read per Table instance: Spark calls schema()/
  // version()/properties() several times per statement (resolution,
  // cache-token checks, DESCRIBE paths), and loadTable hands out a
  // fresh instance per resolution anyway — staleness is bounded to
  // the statement, repeated metadata I/O is not.
  private lazy val boundVersion: Option[Int] =
    asOf.orElse(VersionedTable.currentVersion(SparkSession.active, root))
  private lazy val fullSchema: StructType =
    VersionedTable.schemaOf(SparkSession.active, root, asOf)
  private lazy val tableProps: Map[String, String] =
    VersionedTable.propertiesOf(SparkSession.active, root)
  // Table.version() is Spark's cache-invalidation token: the pinned
  // time-travel version, or the table's current version otherwise
  override def version(): String =
    boundVersion.map(_.toString).orNull
  // The ENGINE-OWNED row-id column is hidden from the named-table
  // face (like Delta's row tracking, surfaced via metadata, not a
  // user column): exposing it would force every positional INSERT to
  // supply it — and a supplied value would bypass the id-uniqueness
  // machinery every other write face routes through assignIdentity.
  // Row-id consumers (CDF pairing) read through the path-based faces.
  override def schema(): StructType = StructType(
    fullSchema.fields.filterNot(_.name == VersionedTable.RowIdCol))
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def properties(): JMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    // the manifest's table properties surface through Spark's own
    // SHOW TBLPROPERTIES graft.t / DESCRIBE EXTENDED
    tableProps.foreach { case (k, v) => m.put(k, v) }
    m.put("location", root)
    asOf.foreach(v => m.put("versionAsOf", v.toString))
    m
  }

  /** `TRUNCATE TABLE graft.t` — a committed LOGICAL truncate (an
    * overwrite with zero rows): earlier versions stay time-travel
    * readable until expired, like every other destructive face. */
  override def truncateTable(): Boolean = {
    val s = SparkSession.active
    VersionedTable.overwrite(s, root,
      VersionedTable.read(s, root).limit(0))
    true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val s = data.sparkSession
              // positional like every SQL INSERT: Spark already cast the
              // query to the DECLARED schema (engine-owned columns
              // hidden, see schema()); restore those names and let the
              // engine's append assign row ids / identity values
              val names = VersionedTable.schemaOf(s, root).fieldNames
                .filterNot(_ == VersionedTable.RowIdCol).toSeq
              val aligned = data.toDF(names: _*)
              if (overwriteAll || overwrite)
                VersionedTable.overwrite(s, root, aligned)
              else VersionedTable.append(s, root, aligned)
            }
          }
      }
    }
}

/** Resolution rule (SparkSessionExtensions.injectResolutionRule): any
  * [[GraftNamedTable]] relation the analyzer resolved from the catalog
  * is swapped for the engine's DSv1 versioned relation — so
  * `SELECT … FROM graft.t` plans EXACTLY like
  * `spark.read.format("graft-versioned").load(root)`: manifest range/
  * bloom file pruning in buildScan, truthful sizeInBytes for broadcast
  * decisions, and the MetaAggregates manifest-only rewrites (which
  * match on the DSv1 relation). The swap is attribute-preserving — an
  * alias per column keeps the V2 relation's exprIds, so references
  * already resolved against it stay bound. INSERT targets are left to
  * the V1 write bridge (the rule descends only into the query side). */
case class GraftNamedTableReads(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    def go(p: LogicalPlan): LogicalPlan = p match {
      case i: InsertIntoStatement =>
        // the write TARGET stays a V2 relation (AppendDataExecV1 runs
        // the engine append); only the source query rewrites
        i.copy(query = go(i.query))
      case sr @ org.apache.spark.sql.catalyst.streaming.StreamingRelationV2(
          _, _, t: GraftNamedTable, opts, output, _, _, _) =>
        // `spark.readStream.table("graft.t")`: swap the V2 streaming
        // relation for the V1 graft-versioned streaming source — the
        // same plan `.readStream.format("graft-versioned").load(root)`
        // builds, with reader options (startingVersion,
        // maxVersionsPerTrigger, …) passed through. The change-feed
        // face stays on the PATH spelling: the catalog face's schema
        // cannot expose _change_type, so a readChangeFeed stream here
        // would silently project the feed columns away — refuse it.
        require(t.asOf.isEmpty,
          s"${t.tableName}: cannot stream a version-pinned (AS OF) " +
            "snapshot — use option(\"startingVersion\", …) instead")
        require(!opts.containsKey("readChangeFeed") &&
          !opts.containsKey("readchangefeed"),
          s"${t.tableName}: stream the change feed through the path " +
            "face (readStream.format(\"graft-versioned\")" +
            ".option(\"readChangeFeed\", true).load(root)) — the named " +
            "face cannot carry the _change_type column")
        val rb = session.readStream.format("graft-versioned")
        val withOpts = scala.jdk.CollectionConverters
          .MapHasAsScala(opts).asScala.foldLeft(rb) {
            case (b, (k, v)) => b.option(k, v) }
        val resolved = withOpts.load(t.root).queryExecution.analyzed
        val byName = resolved.output.map(a => a.name -> a).toMap
        Project(output.map { o =>
          byName.get(o.name) match {
            case Some(n) if n.dataType == o.dataType =>
              Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
            case _ => throw new IllegalStateException(
              s"${t.tableName}: column ${o.name} changed between catalog " +
                "resolution and planning (concurrent DDL) — re-run the query")
          }
        }, resolved)
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftNamedTable] =>
        val t = r.table.asInstanceOf[GraftNamedTable]
        val reader0 = session.read.format("graft-versioned")
        val reader =
          t.asOf.fold(reader0)(v => reader0.option("versionAsOf", v.toString))
        val resolved = reader.load(t.root).queryExecution.analyzed
        // match by NAME, not position: the fresh load may expose MORE
        // columns than the catalog face (the hidden engine row id), and
        // schema drift between loadTable and this rule must ERROR, not
        // silently bind a reference to a different column
        val byName = resolved.output.map(a => a.name -> a).toMap
        Project(r.output.map { o =>
          byName.get(o.name) match {
            case Some(n) if n.dataType == o.dataType =>
              Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
            case _ => throw new IllegalStateException(
              s"${t.tableName}: column ${o.name} changed between catalog " +
                "resolution and planning (concurrent DDL) — re-run the query")
          }
        }, resolved)
      case other => other.mapChildren(go)
    }
    go(plan)
  }
}
