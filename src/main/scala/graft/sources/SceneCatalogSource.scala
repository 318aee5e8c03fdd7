package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 scene-catalog source (SURVEY.md §2.1 S1's "at scale a
  * DSv2 Scan with SupportsPushDownFilters + SupportsPushDownLimit"): the
  * live-STAC access pattern. Two modes share one scan pipeline:
  *
  *  - **synthetic** (default): the "server" is a deterministic generator;
  *    cloud-cover / sensor / limit predicates are evaluated server-side
  *    (inside the partition reader, before rows reach Spark), exactly
  *    where the reference's STAC query parameters run
  *    (download_landsat_stac.py:96-118).
  *  - **HTTP** (`url` option): a REAL paged STAC item-search client.
  *    Pushed filters become search parameters (`eo:cloud_cover`
  *    lte/gte and `platform` eq via the STAC query extension, a pushed
  *    datetime range as the RFC 3339 `datetime=start/end` param), the
  *    pushed LIMIT becomes the page `limit`, and the reader follows
  *    `links[rel=next]` pagination. A pushed datetime range can be split
  *    across `partitions` input partitions — each queries its own
  *    sub-window, which is how a catalog harvest parallelizes at scale
  *    (time-sliced searches, not one serial cursor). Tested against a
  *    loopback HTTP server (no network in CI), same as AssetFetch (S2).
  *
  * Usage: spark.read.format("graft.sources.SceneCatalogSource")
  *        .option("scenes", "10000").load()                  // synthetic
  *        .option("url", "http://host/search")
  *        .option("pageSize", "100").option("partitions", "4") // live
  */
class SceneCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SceneCatalogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SceneCatalogTable(
      Option(properties.get("scenes")).map(_.toInt).getOrElse(1000),
      Option(properties.get("url")),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(100),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(1))
}

object SceneCatalogSource {
  val Schema: StructType = StructType(Seq(
    StructField("scene_id", StringType, nullable = false),
    StructField("sensor", StringType, nullable = false),
    StructField("datetime", TimestampType, nullable = false),
    StructField("cloud_cover", DoubleType, nullable = false),
    StructField("epsg", IntegerType, nullable = false)))

  /** Deterministic "server" row i. */
  def scene(i: Int): (String, String, Long, Double, Int) = {
    val sensor = if (i % 7 == 0) "LE07" else "LC08"
    val date = 1654041600000000L + i.toLong * 3600L * 1000000L // 2022-06-01 + i hours (us)
    val cloud = (i * 37 % 101).toDouble
    (f"${sensor}_L2SP_${190000 + i}%06d", sensor, date, cloud, 32635 + i % 2)
  }
}

class SceneCatalogTable(nScenes: Int, url: Option[String], pageSize: Int,
                        partitions: Int) extends Table with SupportsRead {
  override def name(): String =
    url.map(u => s"scene_catalog($u)").getOrElse(s"scene_catalog($nScenes)")
  override def schema(): StructType = SceneCatalogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SceneCatalogScanBuilder(nScenes, url, pageSize, partitions)
}

class SceneCatalogScanBuilder(nScenes: Int, url: Option[String], pageSize: Int,
                              partitions: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SceneCatalogSource.Schema
  private var limit: Int = Int.MaxValue

  private def supported(f: Filter): Boolean = f match {
    case LessThanOrEqual("cloud_cover", _) => true
    case GreaterThanOrEqual("cloud_cover", _) => true
    case EqualTo("sensor", _) => true
    // the HTTP mode ships a datetime range to the server (and uses it to
    // split the search into parallel time windows); the synthetic reader
    // has no server to ship it to, so Spark keeps evaluating it there
    case LessThanOrEqual("datetime", _) => url.isDefined
    case GreaterThanOrEqual("datetime", _) => url.isDefined
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    filters.filterNot(supported) // Spark re-evaluates only these
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  override def build(): Scan =
    new SceneCatalogScan(nScenes, url, pageSize, partitions, pushed, required, limit)
}

class SceneCatalogScan(nScenes: Int, url: Option[String], pageSize: Int,
                       partitions: Int, pushed: Array[Filter],
                       required: StructType, limit: Int)
    extends Scan with Batch with Serializable {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SceneCatalogScan pushed=[${pushed.mkString(", ")}] limit=$limit" +
      url.map(u => s" url=$u").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = url match {
    case Some(u) => StacSearch.plan(u, pageSize, partitions, pushed, limit)
    case None =>
      val nParts = 4
      (0 until nParts).map { p =>
        SceneRange(p * nScenes / nParts, (p + 1) * nScenes / nParts): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (url.isDefined) new StacReaderFactory(required.fieldNames, limit)
    else new SceneReaderFactory(pushed, required.fieldNames, limit)
}

case class SceneRange(start: Int, end: Int) extends InputPartition

class SceneReaderFactory(pushed: Array[Filter], columns: Array[String],
                         limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[SceneRange]
    new PartitionReader[InternalRow] {
      private var i = range.start - 1
      private var emitted = 0
      private var current: InternalRow = _

      private def passes(cloud: Double, sensor: String): Boolean =
        pushed.forall {
          case LessThanOrEqual("cloud_cover", v) => cloud <= v.asInstanceOf[Number].doubleValue
          case GreaterThanOrEqual("cloud_cover", v) => cloud >= v.asInstanceOf[Number].doubleValue
          case EqualTo("sensor", v) => sensor == v.toString
          case _ => true
        }

      override def next(): Boolean = {
        while (i + 1 < range.end && emitted < limit) {
          i += 1
          val (id, sensor, ts, cloud, epsg) = SceneCatalogSource.scene(i)
          if (passes(cloud, sensor)) {
            val all = Map[String, Any](
              "scene_id" -> UTF8String.fromString(id),
              "sensor" -> UTF8String.fromString(sensor),
              "datetime" -> ts, "cloud_cover" -> cloud, "epsg" -> epsg)
            current = InternalRow.fromSeq(columns.toSeq.map(all))
            emitted += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
