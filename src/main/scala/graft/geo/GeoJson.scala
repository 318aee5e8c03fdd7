package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RasterModel.Aoi

/** GeoJSON vector read (S5 — reference gpd.read_file of the AOI
  * FeatureCollection, download_landsat_stac.py:72-80 et al.):
  * spark.read.json on the FeatureCollection + geometry decode into the
  * `aoi` DataFrame (WKT + envelope). Polygon and MultiPolygon supported;
  * CRS defaults to EPSG:4326 when absent (reference behavior).
  *
  * The feature list is dimension-sized (one-to-few AOIs), so the decode
  * maps over a typed Dataset — the geometry never needs distributed array
  * surgery; at scale the AOI side is broadcast anyway (SURVEY §2.4 C6).
  */
object GeoJson {

  private case class Feat(name: Option[String],
                          gtype: String,
                          poly: Option[Seq[Seq[Seq[Double]]]],
                          multi: Option[Seq[Seq[Seq[Seq[Double]]]]])

  /** NOTE: feature collections must be geometry-homogeneous (all Polygon
    * or all MultiPolygon) — spark.read.json infers ONE array depth for
    * `coordinates`, so mixing depths in one file is not decodable. */
  def readAoi(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val feats = raw.select(explode(col("features")).as("f"))
    val ds = feats.select(
      col("f.properties.name").as("name"),
      col("f.geometry.type").as("gtype"),
      col("f.geometry.coordinates").as("coords"))
    val rows = ds.collect().zipWithIndex.map { case (r, i) =>
      val name = Option(r.getAs[String]("name")).getOrElse(s"aoi_$i")
      val gtype = r.getAs[String]("gtype")
      val coords = r.get(r.fieldIndex("coords"))
      val polys: Seq[Seq[Seq[(Double, Double)]]] = gtype match {
        case "Polygon" =>
          Seq(asRings(coords))
        case "MultiPolygon" =>
          asSeq(coords).map(asRings)
        case t => throw new IllegalArgumentException(s"Unsupported geometry: $t")
      }
      val wkt = toWkt(polys)
      val env = Wkt.envelope(Wkt.parse(wkt))
      Aoi(i + 1L, name, wkt, env._1, env._2, env._3, env._4)
    }
    spark.createDataFrame(rows.toSeq)
  }

  /** K10 — AOI bootstrap (reference `ensure_aoi_geojson_from_bbox`,
    * main.py:68-91, called from main.py:100): write a GeoJSON
    * FeatureCollection holding the bbox polygon at `path` IF MISSING
    * (idempotent — an existing file is never touched), creating parent
    * directories, and return the absolute path. The ring matches the
    * reference's shapely `box(minx, miny, maxx, maxy)` CCW vertex
    * order. Driver-side file I/O like the reference: the AOI is
    * dimension-sized configuration, not data. */
  def ensureAoiFromBbox(bbox: Seq[Double], path: String): String = {
    require(bbox.length == 4,
      s"bbox must be [minLon, minLat, maxLon, maxLat], got $bbox")
    val p = java.nio.file.Paths.get(path).toAbsolutePath
    if (!java.nio.file.Files.exists(p)) {
      Option(p.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
      val Seq(minLon, minLat, maxLon, maxLat) = bbox
      def pt(x: Double, y: Double) = s"[$x, $y]"
      val ring = Seq(
        pt(maxLon, minLat), pt(maxLon, maxLat), pt(minLon, maxLat),
        pt(minLon, minLat), pt(maxLon, minLat)).mkString("[", ", ", "]")
      val fc = s"""{"type": "FeatureCollection", "features": [{"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [$ring]}, "properties": {"name": "AOI", "crs": "EPSG:4326"}}]}"""
      java.nio.file.Files.write(p, fc.getBytes("UTF-8"))
    }
    p.toString
  }

  /** The reference's AOI entry path (main.py:100): bootstrap the GeoJSON
    * from the settings bbox if missing, then read it — so a bbox-only
    * configuration (the reference's default) runs end to end. */
  def ensureAndReadAoi(spark: SparkSession,
                       settings: graft.config.Settings): DataFrame =
    readAoi(spark,
      ensureAoiFromBbox(settings.aoi.bbox, settings.aoi.geojsonPath))

  private def asSeq(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case a: scala.collection.mutable.ArraySeq[_] => a.toSeq
    case other => other.asInstanceOf[Seq[Any]]
  }

  private def asRings(polyCoords: Any): Seq[Seq[(Double, Double)]] =
    asSeq(polyCoords).map { ring =>
      asSeq(ring).map { pt =>
        val xy = asSeq(pt).map {
          case d: Double => d
          case l: Long => l.toDouble
          case n: java.math.BigDecimal => n.doubleValue
        }
        (xy.head, xy(1))
      }
    }

  private def toWkt(polys: Seq[Seq[Seq[(Double, Double)]]]): String = {
    def ring(r: Seq[(Double, Double)]): String =
      r.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")")
    def poly(p: Seq[Seq[(Double, Double)]]): String =
      p.map(ring).mkString("(", ", ", ")")
    if (polys.length == 1) s"POLYGON ${poly(polys.head)}"
    else s"MULTIPOLYGON ${polys.map(poly).mkString("(", ", ", ")")}"
  }
}
