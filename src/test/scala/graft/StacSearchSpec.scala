package graft

import java.time.Instant
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** S1's live half: the DSv2 catalog source against a REAL (loopback) STAC
  * item-search endpoint — paged item fetch via links[rel=next], pushed
  * filters arriving as STAC search parameters and applied SERVER-side,
  * limit pushdown bounding the page size, and a pushed datetime range
  * split into parallel search windows. Same offline-CI pattern as the S2
  * loopback fetch spec: the server is in-process, the HTTP is real. */
class StacSearchSpec extends SparkSpec {

  /** Catalog content = the same deterministic generator the synthetic
    * mode serves, so expectations are client-side recomputable. */
  private val N = 250
  private val items = (0 until N).map(graft.sources.SceneCatalogSource.scene)

  private def itemJson(it: (String, String, Long, Double, Int)): String = {
    val (id, sensor, us, cloud, epsg) = it
    val iso = java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
    s"""{"type":"Feature","id":"$id","properties":{"platform":"$sensor",""" +
      s""""datetime":"$iso","eo:cloud_cover":$cloud,"proj:epsg":$epsg}}"""
  }

  /** Loopback STAC /search: applies limit/datetime/query params to the
    * item list, pages with a rel=next link, records every request URI. */
  private def withStacServer(f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val requests = new ConcurrentLinkedQueue[String]()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val uri = ex.getRequestURI.toString
        requests.add(uri)
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val limit = params.get("limit").map(_.toInt).getOrElse(100)
        val offset = params.get("offset").map(_.toInt).getOrElse(0)
        def micros(s: String): Long = {
          val i = Instant.parse(s)
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        val (tLo, tHi) = params.get("datetime") match {
          case Some(d) =>
            val Array(a, b) = d.split("/", 2)
            (if (a == "..") Long.MinValue else micros(a),
             if (b == "..") Long.MaxValue else micros(b))
          case None => (Long.MinValue, Long.MaxValue)
        }
        var cloudLte = Double.MaxValue; var cloudGte = Double.MinValue
        var platform: Option[String] = None
        params.get("query").foreach { q =>
          val node = mapper.readTree(q)
          val cc = node.path("eo:cloud_cover")
          if (cc.has("lte")) cloudLte = cc.get("lte").asDouble
          if (cc.has("gte")) cloudGte = cc.get("gte").asDouble
          val p = node.path("platform")
          if (p.has("eq")) platform = Some(p.get("eq").asText)
        }
        val matching = items.filter { case (_, sensor, us, cloud, _) =>
          us >= tLo && us <= tHi && cloud <= cloudLte && cloud >= cloudGte &&
            platform.forall(_ == sensor)
        }
        val page = matching.slice(offset, offset + limit)
        val nextLink =
          if (offset + limit < matching.length) {
            val keep = params - "offset"
            val qs = (keep + ("offset" -> (offset + limit).toString)).map {
              case (k, v) => s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"
            }.mkString("&")
            s""",{"rel":"next","href":"http://127.0.0.1:${server.getAddress.getPort}/search?$qs"}"""
          } else ""
        val body = (s"""{"type":"FeatureCollection","features":[""" +
          page.map(itemJson).mkString(",") +
          s"""],"links":[{"rel":"self","href":"$uri"}$nextLink]}""").getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/geo+json")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/search", requests)
    finally server.stop(0)
  }

  private def live(url: String, extra: (String, String)*) = {
    val r = spark.read.format("graft.sources.SceneCatalogSource").option("url", url)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("paged item search: full catalog arrives across rel=next pages") {
    withStacServer { (url, requests) =>
      val df = live(url, "pageSize" -> "100")
      val got = df.collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getDouble(3), r.getInt(4))).sortBy(_._1)
      assert(got.length == N)
      // values round-trip the JSON exactly (timestamps at ms precision here)
      val expect = items.map { case (id, s2, us, c, e) => (id, s2, us / 1000L, c, e) }
        .sortBy(_._1)
      assert(got.toSeq == expect)
      assert(requests.size() == 3, s"expected 3 pages of 100, got: $requests")
    }
  }

  test("pushed filters arrive as STAC query-extension parameters and filter SERVER-side") {
    withStacServer { (url, requests) =>
      val df = live(url).filter(col("cloud_cover") <= 10.0 && col("sensor") === "LC08")
      val rows = df.collect()
      val expect = items.count { case (_, s2, _, c, _) => c <= 10.0 && s2 == "LC08" }
      assert(rows.length == expect && expect > 0)
      val qs = requests.toArray.map(_.toString)
      assert(qs.forall(_.contains("query=")), s"no query param in $qs")
      val decoded = java.net.URLDecoder.decode(qs.head, "UTF-8")
      assert(decoded.contains(""""eo:cloud_cover":{"lte":10.0}"""))
      assert(decoded.contains(""""platform":{"eq":"LC08"}"""))
      // server-side filtering: way fewer than N items crossed the wire,
      // so the whole (filtered) result fits one page
      assert(requests.size() == 1)
      // and the scan itself reports the pushdown
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val desc = plan.collect { case b: BatchScanExec => b }.head.scan.description()
      assert(desc.contains("cloud_cover") && desc.contains("url="))
    }
  }

  test("limit pushdown becomes the page limit — the server never over-serves") {
    withStacServer { (url, requests) =>
      val rows = live(url).limit(5).collect()
      assert(rows.length == 5)
      assert(requests.size() == 1)
      assert(requests.peek().contains("limit=5"),
        s"pushed limit missing from ${requests.peek()}")
    }
  }

  test("a pushed datetime range splits into disjoint parallel search windows") {
    withStacServer { (url, requests) =>
      val lo = java.sql.Timestamp.from(Instant.parse("2022-06-02T00:00:00Z"))
      val hi = java.sql.Timestamp.from(Instant.parse("2022-06-06T00:00:00Z"))
      val df = live(url, "partitions" -> "2")
        .filter(col("datetime") >= lo && col("datetime") <= hi)
      val rows = df.collect()
      val expect = items.count { case (_, _, us, _, _) =>
        us >= lo.getTime * 1000 && us <= hi.getTime * 1000
      }
      assert(rows.length == expect && expect > 0)
      // two distinct windows, both constrained (no open ".." end), and
      // together they return each matching item exactly once
      val windows = requests.toArray.map(_.toString)
        .flatMap(u => java.net.URLDecoder.decode(u, "UTF-8")
          .split("[?&]").find(_.startsWith("datetime=")))
        .distinct
      assert(windows.length == 2, s"expected 2 search windows, got ${windows.toSeq}")
      assert(windows.forall(!_.contains("..")))
      assert(rows.map(_.getString(0)).distinct.length == expect, "windows overlap")
    }
  }
}
