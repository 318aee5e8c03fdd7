package graft.sources

import java.time.Instant
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.unsafe.types.UTF8String

/** The live half of S1: a paged STAC item-search client for
  * [[SceneCatalogSource]]'s HTTP mode (reference
  * download_landsat_stac.py:96-118 — bbox/datetime/cloud-cover search
  * against a STAC API, pystac_client-style).
  *
  * Pushdown mapping (all server-side, nothing post-filtered by the
  * reader): cloud-cover bounds and the platform equality ride the STAC
  * query extension (`query={"eo:cloud_cover":{"lte":…}}`), a datetime
  * range becomes the RFC 3339 `datetime=start/end` parameter, and the
  * pushed LIMIT becomes the page `limit`. Pagination follows the
  * response's `links[rel=next]` href — the standard STAC cursor.
  *
  * Scale: one STAC cursor is inherently serial, so the planner splits a
  * pushed datetime RANGE into `partitions` disjoint sub-windows, each an
  * independent paged search on its own executor — the time-sliced
  * harvest pattern. Without a two-sided range the search stays one
  * partition (there is nothing safe to slice on).
  *
  * A search failure (non-2xx, bad JSON) fails the task: unlike per-asset
  * fetches (S2, failures-as-rows), a failed CATALOG page means the item
  * list is incomplete — silently returning a prefix would be wrong.
  */
object StacSearch {

  private[sources] def toMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000L
    case i: Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case l: Long => l
    case other => throw new IllegalArgumentException(s"Unsupported datetime filter value: $other")
  }

  private def rfc3339(us: Long): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** Build the per-partition search specs from the pushed filters. */
  def plan(url: String, pageSize: Int, partitions: Int,
           pushed: Array[Filter], limit: Int): Array[InputPartition] = {
    var cloudLte: Option[Double] = None
    var cloudGte: Option[Double] = None
    var platform: Option[String] = None
    var tLo: Option[Long] = None
    var tHi: Option[Long] = None
    pushed.foreach {
      case LessThanOrEqual("cloud_cover", v) =>
        cloudLte = Some(v.asInstanceOf[Number].doubleValue)
      case GreaterThanOrEqual("cloud_cover", v) =>
        cloudGte = Some(v.asInstanceOf[Number].doubleValue)
      case EqualTo("sensor", v) => platform = Some(v.toString)
      case LessThanOrEqual("datetime", v) => tHi = Some(toMicros(v))
      case GreaterThanOrEqual("datetime", v) => tLo = Some(toMicros(v))
      case _ => ()
    }
    // STAC query extension object, deterministic key order
    val queryParts =
      cloudLte.map(v => s""""eo:cloud_cover":{"lte":$v}""").toSeq ++
      cloudGte.map(v => s""""eo:cloud_cover":{"gte":$v}""").toSeq ++
      platform.map(p => s""""platform":{"eq":"$p"}""").toSeq
    val query = if (queryParts.isEmpty) None else Some(queryParts.mkString("{", ",", "}"))
    def dtParam(lo: Option[Long], hi: Option[Long]): Option[String] =
      (lo, hi) match {
        case (None, None) => None
        case _ => Some(s"${lo.map(rfc3339).getOrElse("..")}/${hi.map(rfc3339).getOrElse("..")}")
      }
    val windows: Seq[(Option[Long], Option[Long])] = (tLo, tHi) match {
      case (Some(lo), Some(hi)) if partitions > 1 && hi > lo =>
        // k disjoint sub-windows; [lo, hi] inclusive bounds, windows meet
        // at w-1/w boundaries so no item is seen twice
        val span = hi - lo
        (0 until partitions).map { p =>
          val wLo = lo + span * p / partitions + (if (p == 0) 0 else 1)
          val wHi = lo + span * (p + 1) / partitions
          (Some(wLo), Some(wHi))
        }
      case _ => Seq((tLo, tHi))
    }
    windows.map { case (lo, hi) =>
      StacQuery(url, pageSize, query, dtParam(lo, hi), limit): InputPartition
    }.toArray
  }
}

/** One paged search: a base URL plus its query-extension JSON and
  * datetime window. `limit` is the PUSHED row limit (per partition — the
  * global limit is a valid per-window bound, Spark re-applies it). */
case class StacQuery(url: String, pageSize: Int, query: Option[String],
                     datetime: Option[String], limit: Int) extends InputPartition {
  def firstUrl: String = {
    val ps = math.min(pageSize.toLong, limit.toLong)
    val params = Seq(s"limit=$ps") ++
      datetime.map(d => s"datetime=${java.net.URLEncoder.encode(d, "UTF-8")}") ++
      query.map(q => s"query=${java.net.URLEncoder.encode(q, "UTF-8")}")
    s"$url?${params.mkString("&")}"
  }
}

class StacReaderFactory(columns: Array[String], limit: Int)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val q = partition.asInstanceOf[StacQuery]
    new PartitionReader[InternalRow] {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private var nextUrl: Option[String] = Some(q.firstUrl)
      private var page: Iterator[InternalRow] = Iterator.empty
      private var emitted = 0
      private var current: InternalRow = _

      private def httpGet(u: String): Array[Byte] = {
        val conn = new java.net.URI(u).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(240000) // the reference's 240 s budget
        try {
          val code = conn.getResponseCode
          if (code >= 300)
            throw new java.io.IOException(s"STAC search HTTP $code for $u")
          conn.getInputStream.readAllBytes()
        } finally conn.disconnect()
      }

      private def fetchPage(): Unit = {
        val u = nextUrl.get
        val root = mapper.readTree(httpGet(u))
        val feats = root.path("features")
        require(feats.isArray, s"STAC response has no features array ($u)")
        val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        feats.forEach { f =>
          val props = f.path("properties")
          val us = {
            val inst = Instant.parse(props.path("datetime").asText)
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L
          }
          val all = Map[String, Any](
            "scene_id" -> UTF8String.fromString(f.path("id").asText),
            "sensor" -> UTF8String.fromString(props.path("platform").asText),
            "datetime" -> us,
            "cloud_cover" -> props.path("eo:cloud_cover").asDouble,
            "epsg" -> props.path("proj:epsg").asInt)
          rows += InternalRow.fromSeq(columns.toSeq.map(all))
        }
        page = rows.iterator
        var nx: Option[String] = None
        root.path("links").forEach { l =>
          if (l.path("rel").asText == "next") nx = Some(l.path("href").asText)
        }
        nextUrl = nx
      }

      override def next(): Boolean = {
        while (!page.hasNext && nextUrl.isDefined && emitted < limit) fetchPage()
        if (page.hasNext && emitted < limit) {
          current = page.next(); emitted += 1; true
        } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
