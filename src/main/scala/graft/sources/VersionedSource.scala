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
  */
class VersionedSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-versioned requires a path option"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    val byVersion =
      parameters.get("versionasof").orElse(parameters.get("versionAsOf")).map(_.toInt)
    // timestampAsOf: epoch millis or an ISO instant / local datetime (UTC)
    val byTime = parameters.get("timestampasof")
      .orElse(parameters.get("timestampAsOf")).map { t =>
        val millis = scala.util.Try(t.toLong).getOrElse {
          scala.util.Try(java.time.Instant.parse(t).toEpochMilli).getOrElse(
            java.time.LocalDateTime.parse(t.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
        }
        VersionedTable.versionAsOf(sqlContext.sparkSession, root, millis)
      }
    require(byVersion.isEmpty || byTime.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    new VersionedRelation(sqlContext, root, byVersion.orElse(byTime))
  }

  /** DataFrameWriter entry: each SaveMode maps onto one commit — a save
    * is a version, never a directory mutation. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val spark = data.sparkSession
    val exists = VersionedTable.currentVersion(spark, root).isDefined
    mode match {
      case SaveMode.ErrorIfExists =>
        require(!exists, s"table already exists at $root")
        VersionedTable.create(spark, root, data)
      case SaveMode.Ignore =>
        if (!exists) VersionedTable.create(spark, root, data)
      case SaveMode.Append =>
        if (exists) VersionedTable.append(spark, root, data)
        else VersionedTable.create(spark, root, data)
      case SaveMode.Overwrite =>
        if (exists) VersionedTable.overwrite(spark, root, data)
        else VersionedTable.create(spark, root, data)
    }
    createRelation(sqlContext, parameters)
  }
}

object VersionedSource {
  /** Driver-side record of the last scan's pruning decision
    * (total files in the snapshot, files actually opened) — the
    * observable specs assert on, since a V1 relation's file pruning is
    * invisible in the physical plan string. */
  final case class ScanInfo(root: String, totalFiles: Int, openedFiles: Int)
  @volatile var lastScan: Option[ScanInfo] = None
}

/** One bound snapshot of a versioned table (root × optional version). */
class VersionedRelation(override val sqlContext: SQLContext, root: String,
                        version: Option[Int])
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
