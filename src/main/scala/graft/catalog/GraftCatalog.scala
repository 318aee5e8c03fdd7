package graft.catalog

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sink.VersionedTable

/** The engine's SQL MAINTENANCE face: a Spark 4 [[ProcedureCatalog]], so
  * every table-format operation a 100 TB deployment runs on a schedule —
  * compaction, retention, rollback, index builds, merge-on-read deletes,
  * shallow clones, the audit history — is a plain `CALL` statement:
  *
  * {{{
  *   spark.conf: spark.sql.catalog.graft = graft.catalog.GraftCatalog
  *   CALL graft.compact('/path/to/table', 134217728)
  *   CALL graft.delete_where('/path/to/table', 'id % 5 = 0', true)
  *   CALL graft.history('/path/to/table')
  * }}}
  *
  * Spark binds and type-checks the arguments (ResolveProcedures /
  * BindProcedures), and each procedure returns its outcome as a result
  * set through a driver-side [[LocalScan]] — mutations report the
  * committed version, `history` streams the manifest-level audit rows.
  * This is the Spark-native answer to the reference's psql maintenance
  * scripts (`/root/reference/src/load/load_to_postgis.py` drives table
  * upkeep through SQL statements): same UX, but the statements commit
  * manifest versions instead of mutating rows in place. */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog
    with TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    // the named-table surface is name-coupled by design: the parser's
    // `graft.<name>` DML targets and the GraftNames warehouse conf key
    // both spell the catalog 'graft' — registering this plugin under
    // another name would leave SELECT working but UPDATE/DELETE/
    // OPTIMIZE half-broken. Refuse up front instead of half-working.
    require(name == "graft",
      s"graft.catalog.GraftCatalog must be registered as 'graft' " +
        s"(spark.sql.catalog.graft), got '$name' — the SQL DML faces " +
        "and the warehouse conf are keyed to that name")
    catalogName = name
  }

  override def name(): String = catalogName

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.procedures.keys.toArray.sorted
      .map(n => Identifier.of(namespace, n))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"unknown namespace ${ident.namespace().mkString(".")}")
    GraftCatalog.procedures.getOrElse(ident.name().toLowerCase,
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name()}; have " +
          GraftCatalog.procedures.keys.toSeq.sorted.mkString(", ")))
  }

  // ---- TableCatalog: named graft tables ([[GraftNames]] registry) ----
  // `SELECT … FROM graft.t`, `INSERT INTO graft.t`, `CREATE TABLE
  // graft.t AS …`, `ALTER TABLE graft.t ADD COLUMNS (…)` in vanilla
  // Spark SQL — the reference's named-table surface
  // (load_to_postgis.py:140-149) without the quoted-path marker.

  private def spark = SparkSession.active

  /** One optional namespace level: `graft.t` or `graft.db.t` — the
    * dotted registry name is the ident's segments joined, and the
    * warehouse layout is the path join (one extra directory level;
    * resolution stays one link read). */
  private def nameOf(ident: Identifier): String = {
    require(ident.namespace().length <= 1,
      s"the graft catalog supports at most one namespace level; got " +
        s"graft.${(ident.namespace() :+ ident.name()).mkString(".")}")
    (ident.namespace() :+ ident.name()).mkString(".")
  }

  private def rootOf(ident: Identifier): String =
    GraftNames.lookup(spark, nameOf(ident)).getOrElse(
      throw new NoSuchTableException(ident))

  private def qualified(ident: Identifier): String =
    s"$catalogName.${nameOf(ident)}"

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.length <= 1,
      s"the graft catalog supports at most one namespace level; got " +
        namespace.mkString("."))
    // a namespace typo must ERROR (the listTables contract), not read
    // as an empty namespace
    if (namespace.length == 1 && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    GraftNames.list(spark, namespace.headOption)
      .map(n => Identifier.of(namespace, n)).toArray
  }

  // ---- SupportsNamespaces: `graft.<db>` as one directory level ----

  override def listNamespaces(): Array[Array[String]] =
    GraftNames.listNamespaces(spark).map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // one level deep only
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (namespace.length == 1 &&
      GraftNames.namespaceExists(spark, namespace(0)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    if (namespaceExists(namespace)) Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  /** CREATE NAMESPACE graft.db — one warehouse directory. */
  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"graft namespaces are one level: ${namespace.mkString(".")}")
    // the traversal guard every name-to-path join enforces: a
    // backticked `../evil` must never mkdir outside the warehouse, a
    // name list/lookup would reject must not be creatable at all, and
    // '_'-prefixed names are engine state (_names is the link registry)
    require(GraftNames.validNamespace(namespace(0)),
      s"invalid namespace name: ${namespace(0)}")
    // the SupportsNamespaces contract: existence is an error here (Spark's
    // CreateNamespaceExec pre-checks for IF NOT EXISTS; a direct call must
    // not silently "succeed")
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    // a namespace may not shadow a managed TABLE directory: mkdirs on an
    // existing table root would "succeed" while namespaceExists keeps
    // reporting the name absent
    require(!GraftNames.tableShadowsNamespace(spark, namespace(0)),
      s"cannot create namespace ${namespace(0)}: a managed table already " +
        s"lives at that warehouse path — DROP TABLE graft.${namespace(0)} " +
        "first, or pick another name")
    val w = GraftNames.warehouse(spark).getOrElse(
      throw new IllegalArgumentException(
        s"namespaces need the warehouse conf: SET " +
          s"${GraftNames.WarehouseConf} = '/dir'"))
    val p = new org.apache.hadoop.fs.Path(s"$w/${namespace(0)}")
    p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)
    // TOCTOU closure: a concurrent CREATE TABLE graft.<db> can land
    // between the pre-check and the mkdirs (which silently no-ops on the
    // table's root). Nothing to undo — the directory is the table's —
    // but the caller must learn the namespace did NOT come into being.
    if (GraftNames.tableShadowsNamespace(spark, namespace(0)))
      throw new java.util.ConcurrentModificationException(
        s"CREATE NAMESPACE ${namespace(0)} lost a table/namespace race — " +
          "a managed table claimed the name; retry")
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  /** DROP NAMESPACE: refuses while tables remain unless CASCADE. */
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    require(namespace.length == 1,
      s"graft namespaces are one level: ${namespace.mkString(".")}")
    val db = namespace(0)
    require(GraftNames.validNamespace(db), s"invalid namespace name: $db")
    if (!namespaceExists(namespace)) return false
    val tables = GraftNames.list(spark, Some(db))
    require(cascade || tables.isEmpty,
      s"namespace $db still holds ${tables.size} table(s); " +
        "use DROP NAMESPACE ... CASCADE")
    tables.foreach(t => dropTable(Identifier.of(namespace, t)))
    val w = GraftNames.warehouse(spark).get
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(s"$w/$db")
    val linkDir = new org.apache.hadoop.fs.Path(s"$w/_names/$db")
    val f = dir.getFileSystem(conf)
    if (f.exists(linkDir)) f.delete(linkDir, true)
    if (f.exists(dir)) f.delete(dir, true) else true
  }

  override def loadTable(ident: Identifier): Table =
    GraftNamedTable(qualified(ident), rootOf(ident))

  /** `VERSION AS OF n` — the integer manifest version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF takes the integer manifest version; got '$version'")
    }
    GraftNamedTable(qualified(ident), root, Some(v))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootOf(ident)
    GraftNamedTable(qualified(ident), root,
      Some(VersionedTable.versionAsOf(spark, root, timestampMicros / 1000L)))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length <= 1 &&
      GraftNames.lookup(spark, nameOf(ident)).nonEmpty

  override def invalidateTable(ident: Identifier): Unit = ()

  /** One Spark transform → the engine's layout-grammar entry. The
    * transform NAMES (years/months/days/hours/bucket/truncate) are the
    * grammar's function names, so the mapping is mechanical. */
  private def layoutOf(t: Transform): String = {
    def render(e: V2Expression): String = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        r.fieldNames()(0)
      case l: V2Literal[_] => String.valueOf(l.value())
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform argument: $other")
    }
    t.name().toLowerCase match {
      case "identity" => render(t.arguments()(0))
      case fn @ ("years" | "months" | "days" | "hours" | "bucket"
                 | "truncate") =>
        s"$fn(${t.arguments().map(render).mkString(", ")})"
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other (have: identity, " +
          "years, months, days, hours, bucket, truncate)")
    }
  }

  override def createTable(ident: Identifier,
                           schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    val root = GraftNames.managedRoot(spark, nameOf(ident))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    VersionedTable.create(spark, root, empty,
      partitionBy = partitions.map(layoutOf).toSeq)
    // TOCTOU closure for the shadow guards: managedRoot's pre-checks can
    // race a concurrent CREATE on the OTHER side of the table/namespace
    // invariant (namespace dir lands between our check and our create, or
    // a table lands on our namespace segment). Re-verify AFTER our commit
    // and self-undo on loss — two racers that both re-verify both undo,
    // which is a double refusal, never a split-brain.
    val lostRace = ident.namespace().headOption match {
      case Some(db) => GraftNames.tableShadowsNamespace(spark, db)
      case None =>
        GraftNames.list(spark, Some(ident.name())).nonEmpty ||
          // an empty namespace dir cannot be probed by namespaceExists
          // anymore (our root IS that dir now) — the link registry's
          // namespace subdir is the remaining witness
          GraftNames.warehouse(spark).exists { w =>
            val p = new org.apache.hadoop.fs.Path(s"$w/_names/${ident.name()}")
            p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
          }
    }
    if (lostRace) {
      GraftCatalog.undoOwnCreate(spark, root)
      throw new java.util.ConcurrentModificationException(
        s"CREATE TABLE ${qualified(ident)} lost a table/namespace race — " +
          "the name resolved to the other side's commit; retry")
    }
    // user table properties carry into the manifest; Spark's reserved
    // bookkeeping keys (provider/location/owner/…) are not table state
    import scala.jdk.CollectionConverters._
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_TABLE_TYPE,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_COLLATION)
    val props = properties.asScala.toSeq
      .filterNot { case (k, _) =>
        reserved.contains(k) || k.startsWith(TableCatalog.OPTION_PREFIX) }
      .sortBy(_._1)
    if (props.nonEmpty) VersionedTable.setTableProperties(spark, root, props)
    // final own-root re-verify (r17 ADVICE): a racer's undo or a CASCADE
    // drop may have removed our commit between the re-verify above and
    // here — never report success for a table whose manifest is gone
    if (VersionedTable.currentVersion(spark, root).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"CREATE TABLE ${qualified(ident)} was removed by a concurrent " +
          "operation before it completed; retry")
    GraftNamedTable(qualified(ident), root)
  }

  /** `ALTER TABLE graft.t …` through Spark's OWN grammar: each
    * TableChange maps onto the engine's committed DDL — the same code
    * the CALL procedures and the quoted-path SQL face run. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    def one(names: Array[String]): String = {
      require(names.length == 1,
        s"nested columns are unsupported: ${names.mkString(".")}")
      names(0)
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        VersionedTable.addColumn(spark, root, one(a.fieldNames()),
          a.dataType().sql,
          Option(a.defaultValue()).map(_.getSql))
      case d: TableChange.DeleteColumn =>
        VersionedTable.dropColumn(spark, root, one(d.fieldNames()))
      case r: TableChange.RenameColumn =>
        VersionedTable.renameColumn(spark, root, one(r.fieldNames()),
          r.newName())
      case u: TableChange.UpdateColumnType =>
        VersionedTable.alterColumnType(spark, root, one(u.fieldNames()),
          u.newDataType().sql)
      case n: TableChange.UpdateColumnNullability =>
        VersionedTable.alterColumnNullability(spark, root,
          one(n.fieldNames()), nullable = n.nullable())
      case p: TableChange.SetProperty =>
        VersionedTable.setTableProperties(spark, root,
          Seq(p.property() -> p.value()))
      case p: TableChange.RemoveProperty =>
        VersionedTable.unsetTableProperties(spark, root, Seq(p.property()))
      case other => throw new IllegalArgumentException(
        s"unsupported ALTER for graft tables: $other")
    }
    loadTable(ident)
  }

  /** DROP: a LINK unbinds the name and never touches data (the root may
    * be shared); a MANAGED `<warehouse>/<name>` directory deletes. */
  override def dropTable(ident: Identifier): Boolean = {
    val name = nameOf(ident)
    GraftNames.warehouse(spark).exists { w =>
      if (GraftNames.unregister(spark, name)) true
      else {
        val managed = new org.apache.hadoop.fs.Path(
          s"$w/${name.replace('.', '/')}")
        val f = managed.getFileSystem(spark.sessionState.newHadoopConf())
        VersionedTable.currentVersion(spark, managed.toString).nonEmpty &&
          f.delete(managed, true)
      }
    }
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier, newIdent0: Identifier): Unit = {
    // RENAME TO's target arrives catalog-UNRESOLVED (`RENAME TO
    // graft.t2` keeps the catalog name in the namespace) — normalize
    val newIdent =
      if (newIdent0.namespace().headOption.contains(catalogName))
        Identifier.of(newIdent0.namespace().drop(1), newIdent0.name())
      else newIdent0
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val root = rootOf(oldIdent)
    val newName = nameOf(newIdent)
    require(GraftNames.validName(newName),
      s"invalid table name $newName")
    val w = GraftNames.warehouse(spark).get // rootOf proved it's set
    if (root == s"$w/${nameOf(oldIdent).replace('.', '/')}") {
      // managed: move the directory itself (into the target's
      // namespace directory, created on demand)
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dest = new org.apache.hadoop.fs.Path(
        s"$w/${newName.replace('.', '/')}")
      f.mkdirs(dest.getParent)
      require(f.rename(new org.apache.hadoop.fs.Path(root), dest),
        s"rename failed: $root")
    } else {
      // link: re-bind, then drop the old name
      GraftNames.register(spark, newName, root)
      GraftNames.unregister(spark, nameOf(oldIdent))
    }
  }
}

object GraftCatalog {

  /** One procedure: fixed IN parameters, driver-side body, result rows
    * via LocalScan. `bind` is identity — the parameter list IS the
    * signature, Spark coerces the call-site arguments to it. */
  private final class Proc(procName: String, procDescription: String,
                           params: Seq[(String, DataType)],
                           resultSchema: StructType,
                           body: (SparkSession, InternalRow) => Seq[InternalRow],
                           defaults: Map[String, String] = Map.empty)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) =>
        val b = ProcedureParameter.in(n, t)
        defaults.get(n).foreach(b.defaultValue)
        b.build()
      }.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] = {
      val resultRows = body(SparkSession.active, input).toArray
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = resultSchema
        override def description(): String = s"graft.$procName result"
      }).iterator()
    }
  }

  private val versionResult = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))

  /** Undo for a CREATE that lost the table/namespace race: delete only
    * THIS create's own artifacts — the `_log` directory it wrote
    * (exclusively ours: a racer's nested table logs live a level down,
    * `<root>/<t>/_log`), its staged/committed data files (direct-child
    * plain files, `.stage-*` scratch dirs, and hive `k=v` cell dirs —
    * `=` and a `.` prefix can never appear in a table or namespace
    * segment), then the root directory itself only if now EMPTY
    * (non-recursive). The previous recursive `dropTable` here destroyed
    * a nested table a concurrent `CREATE TABLE graft.<name>.t` had
    * legitimately committed under the same directory, after which that
    * racer's own lostRace re-verify saw no shadow and reported SUCCESS
    * for a table whose files were just deleted (r17 ADVICE, medium). */
  private[graft] def undoOwnCreate(spark: SparkSession, root: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    // `top` guards the one name that is ambiguous between the two
    // layouts: `_log` at the root is OURS, but inside `data/` it could
    // only be a racer's nested table legitimately NAMED `data` (its
    // own files then live a level deeper still, in `data/data/`, which
    // this sweep never enters)
    def sweep(dir: org.apache.hadoop.fs.Path, top: Boolean): Unit =
      if (f.exists(dir)) {
        f.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          if (!st.isDirectory || n.startsWith(".") || n.contains("=") ||
              (top && n == "_log"))
            f.delete(st.getPath, true)
          else if (top && n == "data") sweep(st.getPath, top = false)
        }
        // succeeds only when nothing else lives here; a racer's nested
        // content keeps the dir alive as the namespace's directory
        try f.delete(dir, false)
        catch { case _: java.io.IOException => () }
      }
    sweep(rootP, top = true)
  }

  /** The q248 register of a lakehouse table's numeric column at the
    * fixed 2-dp point: one distributed aggregate, register-sized output
    * (cell BIGINT, cnt BIGINT). Shared by quantile_sketch (collect +
    * walk) and quantile_sketch_save (commit as a table). `weightCol`
    * (the q253 generalization) makes cnt the SUM of an integral weight
    * column instead of the row count — rank walks then answer
    * weight-quantiles (e.g. token-weighted score cutoffs); additivity,
    * not counting, is what merge/tree-reduce rely on, so everything
    * downstream is unchanged. */
  private[catalog] def sketchRegisterOf(spark: SparkSession, root: String,
                                        colName: String,
                                        weightCol: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = VersionedTable.read(spark, root)
      .select(col(colName).cast("double").as("v") +:
        weightCol.map(w => col(w).cast("long").as("wt")).toSeq: _*)
      .where(col("v").isNotNull &&
        weightCol.map(_ => col("wt").isNotNull && col("wt") > 0)
          .getOrElse(lit(true)))
      .withColumn("x", floor(col("v") * 100.0 + 0.5).cast("long"))
      .withColumn("w", graft.queries.StatQueries.sketchW(col("x")))
      .withColumn("cell",
        graft.queries.StatQueries.sketchCell(col("x"), col("w")))
    base.groupBy(col("cell")).agg(
      weightCol.map(_ => sum(col("wt"))).getOrElse(count(lit(1))).as("cnt"))
  }

  private[catalog] def parseProbes(s: String): Seq[Double] = {
    val ps = s.split(",").map(_.trim.toDouble).toSeq
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"probes must be in (0, 1]: $s")
    ps
  }

  /** Driver-side rank walk over a cell-sorted register: rank r =
    * ceil(p·N) into the running count, estimate = signed cell midpoint
    * (±0.5% relative + ½ grid step absolute of the exact rank-r order
    * statistic). Register-sized input by construction. */
  private[catalog] def sketchRankWalk(reg: Array[(Long, Long)],
                                      ps: Seq[Double]): Seq[InternalRow] = {
    val n = reg.iterator.map(_._2).sum
    require(n > 0, "empty register")
    val cum = reg.scanLeft(0L)(_ + _._2).drop(1)
    def wOf(c: Long): Long = {
      val digits = math.abs(c).toString.length
      if (digits <= graft.queries.StatQueries.SketchSigDigits) 1L
      else math.pow(10,
        digits - graft.queries.StatQueries.SketchSigDigits).toLong
    }
    ps.map { p =>
      val r = math.ceil(p * n.toDouble).toLong
      val i = cum.indexWhere(_ >= r)
      val c = reg(i)._1
      val est =
        if (c == 0L) 0.0
        else (2 * c + (if (c > 0) wOf(c) else -wOf(c))).toDouble / 200.0
      InternalRow(p, r, est, n, reg.length.toLong)
    }
  }

  private def versionRow(v: Int): Seq[InternalRow] =
    Seq(InternalRow(v))

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  /** A procedure's table argument accepts BOTH spellings: a root path
    * (anything with a '/') or a registered catalog NAME
    * ([[GraftNames.resolve]]) — `CALL graft.history('ndvi_full')` works
    * like `CALL graft.history('/path/to/ndvi_full')`. */
  private def pathArg(r: InternalRow): String =
    GraftNames.resolve(SparkSession.active, str(r, 0))

  private val historySchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("op", StringType, nullable = true),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_live_rows", LongType, nullable = true),
    StructField("n_deleted_rows", LongType, nullable = false),
    StructField("txn", LongType, nullable = true)))

  private[catalog] val procedures: Map[String, UnboundProcedure] = Seq[UnboundProcedure](

    new Proc("history",
      "the table's commit audit trail, from manifests alone",
      Seq("path" -> StringType), historySchema,
      (spark, in) => VersionedTable.describeHistory(spark, pathArg(in))
        .queryExecution.executedPlan.executeCollect().toSeq),

    new Proc("compact",
      "rewrite the newest version into ~target_bytes files (OPTIMIZE)",
      Seq("path" -> StringType, "target_bytes" -> LongType), versionResult,
      (spark, in) => versionRow(
        VersionedTable.compact(spark, pathArg(in), targetBytes = in.getLong(1)))),

    // Approximate quantiles over ANY numeric column of a lakehouse
    // table via the mergeable fixed-point register sketch (q248's
    // grid: 2 dp fixed point, 3-significant-digit relative-error
    // cells): ONE distributed register aggregate (tree-reduces like
    // the HLL/CMS registers), a register-sized collect, a driver-side
    // rank walk. Estimates are cell midpoints — within ±0.5% relative
    // (+½ grid step absolute) of the exact rank-r order statistic —
    // with NO global sort and no t-digest nondeterminism: the same
    // call on the same snapshot returns bit-identical rows on any
    // cluster. Negative values ride the signed grid (integer DIV
    // truncates toward zero, so cells stay value-ordered).
    new Proc("quantile_sketch",
      "approximate quantiles of a numeric column from one register-" +
        "sketch aggregate (±0.5% relative, deterministic); probes is a " +
        "comma-separated list in (0, 1]",
      Seq("path" -> StringType, "column" -> StringType,
        "probes" -> StringType),
      StructType(Seq(
        StructField("p", DoubleType, nullable = false),
        StructField("rank_r", LongType, nullable = false),
        StructField("estimate", DoubleType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_cells", LongType, nullable = false))),
      (spark, in) => {
        val reg = GraftCatalog.sketchRegisterOf(spark, pathArg(in), str(in, 1))
          .orderBy(org.apache.spark.sql.functions.col("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(reg.nonEmpty, s"no non-null values in ${str(in, 1)}")
        GraftCatalog.sketchRankWalk(reg, GraftCatalog.parseProbes(str(in, 2)))
      },
      defaults = Map("probes" -> "'0.25,0.5,0.75,0.95'")),

    // The q253 weighted read-out as a SQL face: cells carry the SUM of
    // an integral weight column (tokens, bytes, rows-represented), and
    // the rank walk answers "the value below which p of the WEIGHT
    // sits" — e.g. the quality-score cutoff for a token budget. Same
    // register cost shape; same ±0.5% relative bound on the value axis.
    new Proc("quantile_sketch_weighted",
      "approximate WEIGHT-quantiles of a numeric column (ranks walk " +
        "the cumulative integral weight column, not row counts) from " +
        "one register aggregate; probes as in quantile_sketch",
      Seq("path" -> StringType, "column" -> StringType,
        "weight_column" -> StringType, "probes" -> StringType),
      StructType(Seq(
        StructField("p", DoubleType, nullable = false),
        StructField("rank_w", LongType, nullable = false),
        StructField("estimate", DoubleType, nullable = false),
        StructField("n_weight", LongType, nullable = false),
        StructField("n_cells", LongType, nullable = false))),
      (spark, in) => {
        val reg = GraftCatalog.sketchRegisterOf(spark, pathArg(in),
            str(in, 1), Some(str(in, 2)))
          .orderBy(org.apache.spark.sql.functions.col("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(reg.nonEmpty,
          s"no rows with non-null ${str(in, 1)} and positive ${str(in, 2)}")
        GraftCatalog.sketchRankWalk(reg, GraftCatalog.parseProbes(str(in, 3)))
      },
      defaults = Map("probes" -> "'0.25,0.5,0.75,0.95'")),

    // The register as a STORABLE artifact (the q251 pattern as a SQL
    // face): per-ingest work builds and commits the register of the NEW
    // table only; quantile_sketch_merge later answers union-wide
    // quantiles from the saved registers alone — cell-wise count
    // addition, never a rescan of any source table. Counts add exactly,
    // so merge-of-registers ≡ one pass over the union, bit for bit.
    new Proc("quantile_sketch_save",
      "build the mergeable quantile register of a numeric column and " +
        "commit it as its own versioned table (cell BIGINT, cnt " +
        "BIGINT); merge saved registers with quantile_sketch_merge",
      Seq("path" -> StringType, "column" -> StringType,
        "out" -> StringType),
      StructType(Seq(
        StructField("n_cells", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      (spark, in) => {
        import org.apache.spark.sql.functions._
        val reg = GraftCatalog.sketchRegisterOf(spark, pathArg(in), str(in, 1))
          .orderBy(col("cell")).coalesce(1) // register-sized: one file
        val out = GraftNames.resolve(spark, str(in, 2))
        val v = VersionedTable.create(spark, out, reg)
        val m = VersionedTable.read(spark, out)
          .agg(count(lit(1)), coalesce(sum(col("cnt")), lit(0L)))
          .collect().head
        Seq(InternalRow(m.getLong(0), m.getLong(1), v))
      }),

    new Proc("quantile_sketch_merge",
      "approximate quantiles over the UNION of saved registers (comma-" +
        "separated paths) by cell-wise count addition — bit-identical " +
        "to one pass over the union of the source tables, without " +
        "rescanning any of them; probes as in quantile_sketch",
      Seq("paths" -> StringType, "probes" -> StringType),
      StructType(Seq(
        StructField("p", DoubleType, nullable = false),
        StructField("rank_r", LongType, nullable = false),
        StructField("estimate", DoubleType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_cells", LongType, nullable = false))),
      (spark, in) => {
        import org.apache.spark.sql.functions._
        val roots = str(in, 0).split(",").map(_.trim).filter(_.nonEmpty)
          .map(GraftNames.resolve(spark, _)).toSeq
        require(roots.nonEmpty, "need at least one register path")
        val reg = roots.map(VersionedTable.read(spark, _)
            .select(col("cell").cast("long").as("cell"),
              col("cnt").cast("long").as("cnt")))
          .reduce(_ unionByName _)
          .groupBy(col("cell")).agg(sum(col("cnt")).as("cnt"))
          .orderBy(col("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(reg.nonEmpty, "all registers are empty")
        GraftCatalog.sketchRankWalk(reg, GraftCatalog.parseProbes(str(in, 1)))
      },
      defaults = Map("probes" -> "'0.25,0.5,0.75,0.95'")),

    // The SQL face defaults min_orphan_age_ms to ONE HOUR, unlike the
    // library's explicit-0 default: a scheduled `CALL graft.expire` is
    // exactly the operator least likely to know about the single-writer
    // staging window, and a default-0 sweep racing a live commit deletes
    // its staged (not-yet-published) data files. An hour comfortably
    // clears any real commit's staging time; pass 0 explicitly for
    // maintenance-window GC with writers quiesced (Delta's
    // deleted-file-retention default guards the same race with 7 days).
    new Proc("expire",
      "drop all but the newest keep_last versions and sweep unreferenced " +
        "files; min_orphan_age_ms (default 1h) protects a concurrent " +
        "writer's staged (not-yet-published) files from the sweep",
      Seq("path" -> StringType, "keep_last" -> IntegerType,
        "min_orphan_age_ms" -> LongType),
      StructType(Seq(
        StructField("removed_versions", IntegerType, nullable = false),
        StructField("removed_files", IntegerType, nullable = false))),
      (spark, in) => {
        val (versions, files) = VersionedTable.expire(spark, pathArg(in),
          keepLast = in.getInt(1), minOrphanAgeMillis = in.getLong(2))
        Seq(InternalRow(versions, files))
      },
      defaults = Map("min_orphan_age_ms" -> "3600000")),

    new Proc("vacuum",
      "retention with a DRY RUN face: what expire(keep_last) would " +
        "remove — dropped manifests + their checkpoints, then data " +
        "files / DV sidecars referenced only by dropped history (or by " +
        "nothing: crashed-commit orphans) — with byte accounting from " +
        "manifests + one listing. keep_last 0 (the default) keeps ALL " +
        "history (orphans only); dry_run true (the default) deletes " +
        "NOTHING; min_orphan_age_ms (default 1h) protects a concurrent " +
        "writer's staged files like expire's. Shares the retention " +
        "decision (txn/tag pins, clone protection) with expire, so " +
        "report and sweep cannot disagree",
      Seq("path" -> StringType, "keep_last" -> IntegerType,
        "dry_run" -> BooleanType, "min_orphan_age_ms" -> LongType),
      StructType(Seq(
        StructField("kind", StringType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false))),
      (spark, in) => VersionedTable.vacuum(spark, pathArg(in),
        keepLast = in.getInt(1), dryRun = in.getBoolean(2),
        minOrphanAgeMillis = in.getLong(3))
        .map { case (k, p, b) => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(k),
          org.apache.spark.unsafe.types.UTF8String.fromString(p), b) },
      defaults = Map("keep_last" -> "0", "dry_run" -> "true",
        "min_orphan_age_ms" -> "3600000")),

    new Proc("expire_older_than",
      "expire versions committed at or before ts_millis, keeping at " +
        "least keep_at_least newest; min_orphan_age_ms as in expire",
      Seq("path" -> StringType, "ts_millis" -> LongType,
        "keep_at_least" -> IntegerType, "min_orphan_age_ms" -> LongType),
      StructType(Seq(
        StructField("removed_versions", IntegerType, nullable = false),
        StructField("removed_files", IntegerType, nullable = false))),
      (spark, in) => {
        val (versions, files) = VersionedTable.expireOlderThan(
          spark, pathArg(in), in.getLong(1), keepAtLeast = in.getInt(2),
          minOrphanAgeMillis = in.getLong(3))
        Seq(InternalRow(versions, files))
      },
      defaults = Map("min_orphan_age_ms" -> "3600000")),

    new Proc("rollback",
      "publish an old version's exact file list as the new newest version",
      Seq("path" -> StringType, "to_version" -> IntegerType), versionResult,
      (spark, in) => versionRow(
        VersionedTable.rollback(spark, pathArg(in), to = in.getInt(1)))),

    new Proc("index_bloom",
      "attach per-file bloom filters over the given comma-separated columns",
      Seq("path" -> StringType, "columns" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.indexBloom(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq))),

    new Proc("index_hll",
      "attach per-file HLL registers over the given comma-separated columns",
      Seq("path" -> StringType, "columns" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.indexHll(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq))),

    new Proc("delete_where",
      "DELETE rows matching a SQL predicate; vectored=true commits " +
        "merge-on-read deletion vectors instead of rewriting files",
      Seq("path" -> StringType, "predicate" -> StringType,
        "vectored" -> BooleanType), versionResult,
      (spark, in) => {
        val cond = org.apache.spark.sql.functions.expr(str(in, 1))
        versionRow(
          if (in.getBoolean(2))
            VersionedTable.deleteWhereVectored(spark, pathArg(in), Map.empty, cond)
          else
            VersionedTable.deleteWhere(spark, pathArg(in), Map.empty, cond))
      }),

    // The MoR DML face: scheduled CDC apply / upsert without dropping to
    // Scala. The source is any registered view/table (CREATE TEMP VIEW
    // over the batch, then CALL) — the one SQL-native way to hand a
    // relation to a procedure; keys are comma-separated.
    new Proc("merge_into",
      "MERGE a registered view/table into the target by key: matched " +
        "target rows are replaced, unmatched source rows insert; " +
        "vectored=true commits merge-on-read deletion vectors (no " +
        "target file rewrites) instead of copy-on-write",
      Seq("path" -> StringType, "source_view" -> StringType,
        "keys" -> StringType, "vectored" -> BooleanType), versionResult,
      (spark, in) => {
        val src = spark.table(str(in, 1))
        val keys = str(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        versionRow(
          if (in.getBoolean(3))
            VersionedTable.mergeIntoVectored(spark, pathArg(in), src, keys)
          else VersionedTable.mergeInto(spark, pathArg(in), src, keys))
      },
      defaults = Map("vectored" -> "false")),

    // assignments parse as "col = <sql expr>" pairs split on ';' (not
    // ',' — commas appear inside expressions); every right-hand side
    // sees the OLD row, standard UPDATE semantics
    new Proc("update_where",
      "merge-on-read UPDATE: rows matching the SQL predicate are " +
        "vectored away and re-written with the ';'-separated " +
        "assignments (col = expr) applied — no target file rewrites",
      Seq("path" -> StringType, "predicate" -> StringType,
        "assignments" -> StringType), versionResult,
      (spark, in) => {
        val cond = org.apache.spark.sql.functions.expr(str(in, 1))
        // quote-aware split: a ';' inside a SQL string literal is part
        // of the expression, not a separator. Handles BOTH escapes
        // Spark's parser accepts: backslash (the default) and '' —
        // a backslash inside a literal consumes the next char verbatim
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        val sb = new StringBuilder
        val s = str(in, 2)
        var i = 0
        var inQuote = false
        while (i < s.length) {
          val c = s.charAt(i)
          if (inQuote && c == '\\' && i + 1 < s.length) {
            sb += c += s.charAt(i + 1); i += 2
          } else {
            if (c == '\'') inQuote = !inQuote
            if (c == ';' && !inQuote) { parts += sb.toString; sb.clear() }
            else sb += c
            i += 1
          }
        }
        parts += sb.toString
        val set = parts.map(_.trim).filter(_.nonEmpty).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"malformed assignment '$a' (want: col = expr)")
          a.substring(0, i).trim ->
            org.apache.spark.sql.functions.expr(a.substring(i + 1).trim)
        }.toMap
        versionRow(VersionedTable.updateWhereVectored(
          spark, pathArg(in), Map.empty, cond, set))
      }),

    new Proc("zorder",
      "rewrite the table Z-ORDERED on the given comma-separated columns " +
        "(multi-dimensional clustering: every listed column's per-file " +
        "range narrows at once, so conjunctive range filters prune on " +
        "all dimensions)",
      Seq("path" -> StringType, "columns" -> StringType,
        "target_bytes" -> LongType, "curve" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.zorderBy(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        targetBytes = in.getLong(2), curve = str(in, 3))),
      defaults = Map("target_bytes" -> "134217728", "curve" -> "'morton'")),

    new Proc("index_sums",
      "attach exact per-file sums (and live-exact bounds/null counts) " +
        "for the given comma-separated integral columns; " +
        "only_missing=true indexes just the files lacking one " +
        "(incremental, O(new files) after appends)",
      Seq("path" -> StringType, "columns" -> StringType,
        "only_missing" -> BooleanType), versionResult,
      (spark, in) => versionRow(VersionedTable.indexSums(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        onlyMissing = in.getBoolean(2))),
      defaults = Map("only_missing" -> "false")),

    new Proc("reindex",
      "rebuild blooms (and existing HLL registers) for the given " +
        "comma-separated columns on DV-bearing files, from surviving " +
        "rows only — restores skipping precision after wide vectored " +
        "deletes without rewriting data",
      Seq("path" -> StringType, "columns" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.reindex(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq))),

    new Proc("orphans",
      "dry-run GC report: files no version references and no clone " +
        "protects (what expire would sweep, without dropping history)",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false))),
      (spark, in) => VersionedTable.orphanFiles(spark, pathArg(in))
        .map { case (rel, bytes) =>
          InternalRow(UTF8String.fromString(rel), bytes) }),

    new Proc("clone",
      "shallow-clone a table (or a pinned version) by reference",
      Seq("src" -> StringType, "dst" -> StringType), versionResult,
      (spark, in) => versionRow(
        VersionedTable.cloneShallow(spark, pathArg(in), str(in, 1)))),

    new Proc("add_column",
      "ADD COLUMN as a metadata-only commit; an optional DEFAULT " +
        "(deterministic constant SQL) is both the existence default — " +
        "rows in files predating the column read it instead of NULL — " +
        "and the write default for appends missing the column",
      Seq("path" -> StringType, "name" -> StringType,
        "sql_type" -> StringType, "default_expr" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.addColumn(
        spark, pathArg(in), str(in, 1), str(in, 2),
        Some(str(in, 3)).filter(_.nonEmpty))),
      defaults = Map("default_expr" -> "''")),

    new Proc("alter_column_type",
      "ALTER COLUMN TYPE as a metadata-only commit: lossless widening " +
        "only (tinyint/smallint/int -> bigint/double, float -> double, " +
        "decimal precision-up at fixed scale); each data file keeps its " +
        "written physical type and the scan upcasts per file",
      Seq("path" -> StringType, "name" -> StringType,
        "sql_type" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.alterColumnType(
        spark, pathArg(in), str(in, 1), str(in, 2)))),

    new Proc("rename_column",
      "RENAME COLUMN as a metadata-only commit (field-id column " +
        "mapping): no data file is touched; time travel reads each " +
        "version under its own names; partition columns refuse",
      Seq("path" -> StringType, "from" -> StringType, "to" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.renameColumn(
        spark, pathArg(in), str(in, 1), str(in, 2)))),

    new Proc("add_generated_column",
      "ADD a GENERATED ALWAYS AS (expr) column as a metadata-only " +
        "commit: existing files compute the expression at read, appends " +
        "missing it compute it at write, every writer validates " +
        "g <=> expr on staged files, and updates recompute it when a " +
        "source column changes",
      Seq("path" -> StringType, "name" -> StringType,
        "sql_type" -> StringType, "expr" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.addGeneratedColumn(
        spark, pathArg(in), str(in, 1), str(in, 2), str(in, 3)))),

    new Proc("generated_columns",
      "the table's generated columns as (name, expr) rows",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expr", StringType, nullable = false))),
      (spark, in) => VersionedTable.generatedOf(spark, pathArg(in))
        .toSeq.sortBy(_._1)
        .map { case (n, e) => org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(n),
          org.apache.spark.unsafe.types.UTF8String.fromString(e)) }),

    new Proc("add_identity_column",
      "ADD a BIGINT IDENTITY column (GENERATED BY DEFAULT, START WITH " +
        "start) as a metadata-only commit: appends missing it get " +
        "unique engine-assigned values from the manifest's high-water " +
        "mark (per-partition bands — sparse, shuffle-free); the mark " +
        "auto-advances past every committed value",
      Seq("path" -> StringType, "name" -> StringType,
        "start" -> LongType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.addIdentityColumn(
        spark, pathArg(in), str(in, 1), in.getLong(2))),
      defaults = Map("start" -> "1")),

    new Proc("identity_columns",
      "the table's identity columns as (name, next_value) rows",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("next_value", LongType, nullable = false))),
      (spark, in) => VersionedTable.identityOf(spark, pathArg(in))
        .toSeq.sortBy(_._1)
        .map { case (n, hw) => org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(n), hw) }),

    new Proc("detail",
      "DESCRIBE DETAIL: one operational summary row from the manifest " +
        "+ one listing — version, live files/bytes/rows (DV-aware), " +
        "partition layout, clustering keys/curve, row tracking, and " +
        "the contract counts. Zero data scanned",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("num_files", LongType, nullable = false),
        StructField("total_bytes", LongType, nullable = false),
        StructField("num_rows", LongType, nullable = false),
        StructField("partition_cols", StringType, nullable = false),
        StructField("cluster_by", StringType, nullable = false),
        StructField("cluster_curve", StringType, nullable = false),
        StructField("row_tracking", BooleanType, nullable = false),
        StructField("n_checks", IntegerType, nullable = false),
        StructField("n_defaults", IntegerType, nullable = false),
        StructField("n_generated", IntegerType, nullable = false),
        StructField("n_identity", IntegerType, nullable = false),
        StructField("n_properties", IntegerType, nullable = false))),
      (spark, in) => {
        val d = VersionedTable.detailOf(spark, pathArg(in))
        Seq(InternalRow(d._1, d._2, d._3, d._4,
          org.apache.spark.unsafe.types.UTF8String.fromString(d._5),
          org.apache.spark.unsafe.types.UTF8String.fromString(d._6),
          org.apache.spark.unsafe.types.UTF8String.fromString(d._7),
          d._8, d._9, d._10, d._11, d._12, d._13))
      }),

    new Proc("operation_metrics",
      "per-commit operation metrics from manifest pairs (Delta's " +
        "operationMetrics analog): files/rows added and removed, and " +
        "merge-on-read rows vectored away in place. Zero data scanned",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("op", StringType, nullable = true),
        StructField("files_added", LongType, nullable = false),
        StructField("files_removed", LongType, nullable = false),
        StructField("rows_added", LongType, nullable = false),
        StructField("rows_removed", LongType, nullable = false),
        StructField("dv_rows_deleted", LongType, nullable = false))),
      (spark, in) => VersionedTable.operationMetrics(spark, pathArg(in))
        .map { case (v, op, fa, fr, ra, rr, dv) =>
          InternalRow(v,
            if (op.isEmpty) null
            else org.apache.spark.unsafe.types.UTF8String.fromString(op),
            fa, fr, ra, rr, dv)
        }),

    new Proc("loads",
      "COPY INTO's idempotence ledger: every source file a LIVE " +
        "manifest records as ingested (expired history forgets its " +
        "loads — keep retention longer than your slowest ingest replay)",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("source_file", StringType, nullable = false))),
      (spark, in) => VersionedTable.loadedSourceFiles(spark, pathArg(in))
        .toSeq.sorted.map(f => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(f)))),

    new Proc("partitions",
      "per-partition stats from the manifest + one listing (the " +
        "Iceberg partitions metadata table): k=v directory chain " +
        "('' = unpartitioned files), file count, DV-aware live rows " +
        "(-1 when a file predates row counts), bytes. Zero data " +
        "scanned — the 'which partition needs compactWhere' answer",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("partition", StringType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false))),
      (spark, in) => VersionedTable.partitionsOf(spark, pathArg(in))
        .map { case (p, nf, nr, b) => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(p),
          nf, nr, b) }),

    new Proc("files",
      "per-file inventory from the manifest + one listing (the Iceberg " +
        "files metadata table): path, partition chain, rows / DV-aware " +
        "live rows (-1 when a file predates row counts), bytes, DV " +
        "cardinality, bloom-indexed and HLL-register columns. Zero " +
        "data scanned — the per-file face of CALL graft.partitions",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("partition", StringType, nullable = false),
        StructField("rows", LongType, nullable = false),
        StructField("live_rows", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("dv_card", LongType, nullable = false),
        StructField("bloom_cols", StringType, nullable = false),
        StructField("hll_cols", StringType, nullable = false))),
      (spark, in) => VersionedTable.filesReport(spark, pathArg(in))
        .map { case (f, p, r, lr, b, dv, bc, hc) => InternalRow(
          UTF8String.fromString(f), UTF8String.fromString(p),
          r, lr, b, dv,
          UTF8String.fromString(bc), UTF8String.fromString(hc)) }),

    new Proc("file_stats",
      "per-(file, column) recorded stats from the manifest alone: stat " +
        "domain, [lo, hi] canonical strings, null count (-1 unknown), " +
        "whether the stat is DV-survivor-exact, and the exact column " +
        "sum where indexed. col '' = every column. Zero data scanned",
      Seq("path" -> StringType, "col" -> StringType),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("col", StringType, nullable = false),
        StructField("typ", StringType, nullable = false),
        StructField("lo", StringType, nullable = false),
        StructField("hi", StringType, nullable = false),
        StructField("nulls", LongType, nullable = false),
        StructField("live", BooleanType, nullable = false),
        StructField("sum", LongType, nullable = true))),
      (spark, in) => VersionedTable.fileColumnStats(spark, pathArg(in),
          Some(str(in, 1)).filter(_.nonEmpty))
        .map { case (f, c, t, lo, hi, n, lv, sm) => InternalRow(
          UTF8String.fromString(f), UTF8String.fromString(c),
          UTF8String.fromString(t), UTF8String.fromString(lo),
          UTF8String.fromString(hi), n, lv, sm.getOrElse(null)) },
      defaults = Map("col" -> "''")),

    new Proc("set_property",
      "SET a table property (metadata-only commit; the tblproperties " +
        "analog). Engine keys validate: graft.clusterBy must name live " +
        "non-partition columns; graft.rowTracking refuses (use " +
        "enable_row_tracking)",
      Seq("path" -> StringType, "key" -> StringType,
        "value" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.setTableProperty(
        spark, pathArg(in), str(in, 1), str(in, 2)))),

    new Proc("unset_property",
      "UNSET a table property (metadata-only; unknown keys refuse)",
      Seq("path" -> StringType, "key" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.unsetTableProperty(
        spark, pathArg(in), str(in, 1)))),

    new Proc("properties",
      "the table's properties as (key, value) rows",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("key", StringType, nullable = false),
        StructField("value", StringType, nullable = false))),
      (spark, in) => VersionedTable.propertiesOf(spark, pathArg(in))
        .toSeq.sortBy(_._1)
        .map { case (k, v) => org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(k),
          org.apache.spark.unsafe.types.UTF8String.fromString(v)) }),

    new Proc("enable_row_tracking",
      "enable STABLE ROW IDS: adds the engine-owned _row_id column + " +
        "identity contract + property marker (one metadata commit), " +
        "then backfills ids into files predating the column (one " +
        "rewrite commit, skipped when none). Ids survive compact/" +
        "zorder/update; merge and apply_changes preserve matched " +
        "keys' ids and assign fresh ones to inserts",
      Seq("path" -> StringType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.enableRowTracking(
        spark, pathArg(in)))),

    new Proc("apply_changes",
      "fold a CDC changelog (a view/table of full row images + the " +
        "sequence column, optionally a boolean delete-flag column) " +
        "into the target with sequence-guarded upserts: last writer " +
        "per key wins, stale/out-of-order rows never regress, deletes " +
        "are guarded too; one merge-on-read commit, txn-idempotent " +
        "when txn >= 0",
      Seq("path" -> StringType, "source" -> StringType,
        "keys" -> StringType, "sequence_by" -> StringType,
        "delete_flag" -> StringType, "txn" -> LongType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.applyChanges(
        spark, pathArg(in), spark.table(str(in, 1)),
        str(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        str(in, 3),
        deleteCol = Some(str(in, 4)).filter(_.nonEmpty),
        txn = Some(in.getLong(5)).filter(_ >= 0))),
      defaults = Map("delete_flag" -> "''", "txn" -> "-1")),

    new Proc("replace_where",
      "predicate-scoped atomic overwrite: drop every row of the " +
        "closed range region (col:lo:hi triples, ';'-separated; empty " +
        "lo/hi = open bound) and land the source view's rows in ONE " +
        "commit; rows outside the region refuse; files provably inside " +
        "drop without being read",
      Seq("path" -> StringType, "source" -> StringType,
        "region" -> StringType),
      versionResult,
      (spark, in) => {
        // Bounds parse in the PREDICATE COLUMN's stat domain, resolved
        // from the table schema — never by numeric-looking guesswork: a
        // zero-padded string value like '0123' must stay a string, or
        // the stat-domain pruning (lexicographic) and the Spark row
        // filter (numeric after implicit cast) would define two
        // DIFFERENT regions and rows could survive a lexically-pruned
        // file. Dates accept ISO form or epoch days; timestamps epoch
        // micros (the recorded stat domains).
        val schema = VersionedTable.schemaOf(spark, pathArg(in))
        val types = schema.fields.map(f => f.name -> f.dataType).toMap
        val preds: VersionedTable.RangePreds =
          str(in, 2).split(";").map(_.trim).filter(_.nonEmpty).map { t =>
            val parts = t.split(":", -1)
            require(parts.length == 3,
              s"region entry '$t' must be col:lo:hi (empty = open bound)")
            val c = parts(0).trim
            def v(s: String): Option[Any] =
              Some(s.trim).filter(_.nonEmpty).map { x =>
                types.get(c) match {
                  case Some(ByteType | ShortType | IntegerType | LongType) =>
                    x.toLong
                  case Some(FloatType | DoubleType) => x.toDouble
                  case Some(DateType) => scala.util.Try(x.toLong: Any)
                    .getOrElse(java.time.LocalDate.parse(x).toEpochDay)
                  case Some(TimestampType) =>
                    // epoch micros, or ISO instant / space- or
                    // T-separated local datetime (read as UTC) — the
                    // same tolerance the date branch has
                    scala.util.Try(x.toLong: Any).getOrElse {
                      val inst = scala.util.Try(java.time.Instant.parse(x))
                        .getOrElse(java.time.LocalDateTime
                          .parse(x.replace(' ', 'T'))
                          .toInstant(java.time.ZoneOffset.UTC))
                      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                    }
                  case _ => x // string & others: the value as written
                }
              }
            c -> (v(parts(1)), v(parts(2)))
          }.toMap
        versionRow(VersionedTable.replaceWhere(
          spark, pathArg(in), spark.table(str(in, 1)), preds))
      }),

    new Proc("analyze",
      "CBO-grade column statistics from METADATA alone: exact live row " +
        "count, exact null count where every file recorded one (-1 " +
        "otherwise; survivor-exact under deletion vectors), [lo, hi] " +
        "bounds where recorded, HLL NDV estimate where the column is " +
        "indexed (-1 un-indexed). Zero data scanned. Empty columns = " +
        "every column",
      Seq("path" -> StringType, "columns" -> StringType),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("lo", StringType, nullable = false),
        StructField("hi", StringType, nullable = false),
        StructField("ndv", LongType, nullable = false))),
      (spark, in) => VersionedTable.analyzeTable(spark, pathArg(in),
        str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .map { case (c, n, nn, lo, hi, ndv) =>
          org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(c), n, nn,
            org.apache.spark.unsafe.types.UTF8String.fromString(lo),
            org.apache.spark.unsafe.types.UTF8String.fromString(hi), ndv) },
      defaults = Map("columns" -> "''")),

    new Proc("histogram",
      "equi-width histogram for a numeric column from MANIFEST stats " +
        "alone (zero data scanned): each file's non-null rows spread " +
        "uniformly over its recorded [lo, hi], overlap-weighted into " +
        "equal slices of the global range — exact under a " +
        "range-clustered layout, graceful toward uniform otherwise; " +
        "DV-bearing files contribute survivor counts",
      Seq("path" -> StringType, "column" -> StringType,
        "buckets" -> IntegerType),
      StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("lo", DoubleType, nullable = false),
        StructField("hi", DoubleType, nullable = false),
        StructField("est_rows", DoubleType, nullable = false))),
      (spark, in) => VersionedTable.histogramOf(spark, pathArg(in),
        str(in, 1), in.getInt(2))
        .map { case (b, l, h, e) => InternalRow(b, l, h, e) },
      defaults = Map("buckets" -> "16")),

    new Proc("alter_column_nullability",
      "ALTER COLUMN SET/DROP NOT NULL: loosening is pure metadata; " +
        "tightening proves no live NULL from recorded per-file null " +
        "counts where possible (zero-scan) and reads only the files " +
        "lacking that proof",
      Seq("path" -> StringType, "name" -> StringType,
        "nullable" -> BooleanType),
      versionResult,
      (spark, in) => versionRow(VersionedTable.alterColumnNullability(
        spark, pathArg(in), str(in, 1), in.getBoolean(2)))),

    new Proc("add_constraint",
      "ADD a named CHECK constraint (SQL semantics: NULL passes, FALSE " +
        "violates); validates existing data first, then every " +
        "row-adding writer enforces it on staged files before commit",
      Seq("path" -> StringType, "name" -> StringType,
        "expr" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.addConstraint(
        spark, pathArg(in), str(in, 1), str(in, 2)))),

    new Proc("drop_constraint",
      "DROP a CHECK constraint (metadata-only)",
      Seq("path" -> StringType, "name" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.dropConstraint(
        spark, pathArg(in), str(in, 1)))),

    new Proc("constraints",
      "the table's CHECK constraints as (name, expr) rows",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expr", StringType, nullable = false))),
      (spark, in) => VersionedTable.constraintsOf(spark, pathArg(in))
        .map(c => org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(c.name),
          org.apache.spark.unsafe.types.UTF8String.fromString(c.expr)))),

    new Proc("column_lineage",
      "the column mapping as a table: field id, current logical name, " +
        "frozen physical name, rename lineage — which historical name " +
        "maps where (empty until a rename/drop activates the mapping)",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("field_id", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("physical_name", StringType, nullable = false),
        StructField("prior_names", StringType, nullable = false))),
      (spark, in) => VersionedTable.describeColumnLineage(spark, pathArg(in))
        .queryExecution.executedPlan.executeCollect().toSeq),

    new Proc("drop_column",
      "DROP COLUMN as a metadata-only commit: the physical column stays " +
        "in old files, never projected again; a later add_column of the " +
        "same name is a fresh field (dead data never resurrects)",
      Seq("path" -> StringType, "column" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.dropColumn(
        spark, pathArg(in), str(in, 1)))),

    // The multi-table transaction face: the K9 stage-commit-ordering
    // story (aois → full → clipped → viz visible together or not at
    // all) drivable from pure SQL. Staging rides normal table commits;
    // the txn catalog's single hard-link CAS is the atomicity point.
    new Proc("register_table",
      "bind a catalog NAME to an existing versioned-table root (a " +
        "<warehouse>/_names link; warehouse = the runtime conf " +
        "spark.sql.catalog.graft.warehouse) — after this, SQL " +
        "addresses the table as graft.<name> and every CALL accepts " +
        "the bare name where it takes a path",
      Seq("name" -> StringType, "path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("root", StringType, nullable = false))),
      (spark, in) => {
        GraftNames.register(spark, str(in, 0), str(in, 1))
        Seq(InternalRow(UTF8String.fromString(str(in, 0)),
          UTF8String.fromString(str(in, 1))))
      }),

    new Proc("unregister_table",
      "drop a NAME binding — the link only, never the data",
      Seq("name" -> StringType),
      StructType(Seq(StructField("removed", BooleanType, nullable = false))),
      (spark, in) =>
        Seq(InternalRow(GraftNames.unregister(spark, str(in, 0))))),

    new Proc("txn_apply",
      "stage each comma-separated source view/table into its paired " +
        "target table (create or overwrite under <cat_root>/tables/" +
        "<name>) and publish ONE atomic cross-table transaction " +
        "pinning the batch — catalog readers see every table move " +
        "together or none; a crash mid-staging leaves them on the " +
        "previous consistent snapshot",
      Seq("cat_root" -> StringType, "tables" -> StringType,
        "sources" -> StringType),
      StructType(Seq(StructField("txn", IntegerType, nullable = false))),
      (spark, in) => {
        val cat = pathArg(in)
        val names = str(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val srcs = str(in, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(names.nonEmpty && names.size == srcs.size,
          s"tables (${names.size}) and sources (${srcs.size}) must pair up")
        val frames = names.zip(srcs).map { case (n, s) => n -> spark.table(s) }
        Seq(InternalRow(graft.sink.TxnCatalog.commitTables(
          spark, cat, frames, n => s"$cat/tables/$n")))
      }),

    new Proc("txn_snapshot",
      "register every table of a committed transaction (default the " +
        "newest) as temp views <prefix>_<table> pinned to their exact " +
        "versions — the consistent cross-table snapshot read; pass " +
        "txn >= 1 for cross-table time travel",
      Seq("cat_root" -> StringType, "prefix" -> StringType,
        "txn" -> IntegerType),
      StructType(Seq(StructField("view", StringType, nullable = false))),
      (spark, in) => {
        val t = Some(in.getInt(2)).filter(_ >= 1)
        graft.sink.TxnCatalog.registerViews(spark, pathArg(in), str(in, 1), t)
          .map(v => InternalRow(UTF8String.fromString(v)))
      },
      defaults = Map("prefix" -> "'txn'", "txn" -> "-1")),

    new Proc("set_partition_layout",
      "partition evolution: change the hive layout FUTURE writes land " +
        "under (comma-separated entries — plain columns or transforms " +
        "like days(ts), bucket(16, id), truncate(4, s); empty = " +
        "unpartitioned) as a metadata-only commit — existing files keep " +
        "their layout and stay prunable; compact/zorder migrate them " +
        "gradually",
      Seq("path" -> StringType, "columns" -> StringType), versionResult,
      (spark, in) => versionRow(VersionedTable.setPartitionLayout(
        spark, pathArg(in), graft.sink.Layout.split(str(in, 1))))),

    // Named refs: tags pin versions against retention (reproducible
    // training snapshots); branches stage audited writes that publish
    // with a metadata-only fast-forward — write-audit-publish from SQL.
    new Proc("create_tag",
      "tag a version (default newest) with an immutable name; a tagged " +
        "version survives expire until the tag is dropped",
      Seq("path" -> StringType, "name" -> StringType,
        "version" -> IntegerType), versionResult,
      (spark, in) => versionRow(VersionedTable.createTag(spark, pathArg(in),
        str(in, 1), Some(in.getInt(2)).filter(_ >= 1))),
      defaults = Map("version" -> "-1")),

    new Proc("drop_tag",
      "drop a tag, releasing its retention pin; returns the version it pinned",
      Seq("path" -> StringType, "name" -> StringType), versionResult,
      (spark, in) => versionRow(
        VersionedTable.dropTag(spark, pathArg(in), str(in, 1)))),

    new Proc("tags",
      "all tags as (name, pinned version)",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      (spark, in) => VersionedTable.tags(spark, pathArg(in))
        .map { case (n, v) => InternalRow(UTF8String.fromString(n), v) }),

    new Proc("tag_snapshot",
      "register the version a tag pins as temp view <view> — time " +
        "travel by name from pure SQL",
      Seq("path" -> StringType, "name" -> StringType,
        "view" -> StringType),
      StructType(Seq(StructField("view", StringType, nullable = false))),
      (spark, in) => {
        VersionedTable.readTag(spark, pathArg(in), str(in, 1))
          .createOrReplaceTempView(str(in, 2))
        Seq(InternalRow(UTF8String.fromString(str(in, 2))))
      }),

    new Proc("create_branch",
      "shallow-branch a table (write-audit-publish staging): data " +
        "shared by reference, schema and CHECK constraints carried; " +
        "write/audit against the returned root, then fast_forward",
      Seq("path" -> StringType, "name" -> StringType,
        "version" -> IntegerType),
      StructType(Seq(StructField("branch_root", StringType, nullable = false))),
      (spark, in) => Seq(InternalRow(UTF8String.fromString(
        VersionedTable.createBranch(spark, pathArg(in), str(in, 1),
          Some(in.getInt(2)).filter(_ >= 1))))),
      defaults = Map("version" -> "-1")),

    new Proc("fast_forward",
      "publish a branch onto main as ONE metadata-only commit (files " +
        "adopted by reference); refuses if main advanced since the " +
        "fork — the audited snapshot would be stale",
      Seq("path" -> StringType, "name" -> StringType), versionResult,
      (spark, in) => versionRow(
        VersionedTable.fastForward(spark, pathArg(in), str(in, 1)))),

    new Proc("drop_branch",
      "drop a branch: manifests go; data files survive only where a " +
        "fast-forward published them into main",
      Seq("path" -> StringType, "name" -> StringType),
      StructType(Seq(
        StructField("removed_versions", IntegerType, nullable = false),
        StructField("removed_files", IntegerType, nullable = false))),
      (spark, in) => {
        val (vs, files) = VersionedTable.dropBranch(spark, pathArg(in), str(in, 1))
        Seq(InternalRow(vs, files))
      }),

    new Proc("branches",
      "all branches as (name, fork base on main, branch head version)",
      Seq("path" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("fork_base", IntegerType, nullable = false),
        StructField("head_version", IntegerType, nullable = false))),
      (spark, in) => VersionedTable.branches(spark, pathArg(in))
        .map { case (n, fb, h) =>
          InternalRow(UTF8String.fromString(n), fb, h) }),

    new Proc("txn_history",
      "the catalog's committed transactions: one row per (txn, table) " +
        "pin — every row is a readable consistent cross-table snapshot",
      Seq("cat_root" -> StringType),
      StructType(Seq(
        StructField("txn", IntegerType, nullable = false),
        StructField("table", StringType, nullable = false),
        StructField("root", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
      (spark, in) => {
        val cat = pathArg(in)
        graft.sink.TxnCatalog.txns(spark, cat).flatMap { t =>
          graft.sink.TxnCatalog.snapshot(spark, cat, Some(t))
            .tables.toSeq.sortBy(_._1).map { case (n, (root, v)) =>
              InternalRow(t, UTF8String.fromString(n),
                UTF8String.fromString(root), v)
            }
        }
      })

  ).map(p => p.name() -> p).toMap
}
