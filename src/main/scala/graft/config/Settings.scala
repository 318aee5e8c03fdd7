package graft.config

import java.nio.file.{Files, Paths}

/** Pipeline settings (S6 — reference config/settings.yaml:1-24, loaders
  * main.py:54-65). Plain Scala case classes (not a DataFrame op, per
  * SURVEY.md §2.1 S6), with a minimal parser for the YAML subset the
  * reference uses: two-space-indented sections, scalar values, inline
  * numeric lists, quoted strings, trailing comments. No YAML library
  * offline — the subset keeps parity without one.
  */
final case class AoiSettings(bbox: Seq[Double], geojsonPath: String,
                             bboxPadKm: Double)
final case class DateSettings(start: String, end: String)
final case class DownloadSettings(outputDir: String, maxCloudCover: Double,
                                  maxItems: Int)
final case class StacSettings(endpoint: String, collection: String)
final case class ProductSettings(reprojectCrs: String, buildOverviews: Boolean)

final case class Settings(aoi: AoiSettings, dates: DateSettings,
                          download: DownloadSettings, stac: StacSettings,
                          useIntersects: Boolean, products: ProductSettings)

object Settings {

  /** Parse the reference's settings.yaml subset into nested maps. */
  def parseYamlSubset(text: String): Map[String, Map[String, String]] = {
    val out = collection.mutable.Map.empty[String, collection.mutable.Map[String, String]]
    var section: String = null
    text.linesIterator.foreach { raw =>
      val noComment = {
        // strip trailing comments outside quotes
        val idx = raw.indexOf('#')
        if (idx >= 0 && !raw.take(idx).count(_ == '"').%(2).equals(1)) raw.take(idx) else raw
      }
      val line = noComment.replaceAll("\\s+$", "")
      if (line.nonEmpty) {
        if (!line.startsWith(" ") && line.endsWith(":")) {
          section = line.dropRight(1).trim
          out.getOrElseUpdate(section, collection.mutable.Map.empty)
        } else if (line.startsWith("  ") && line.contains(":") && section != null) {
          val Array(k, v @ _*) = line.trim.split(":", 2)
          out(section)(k.trim) = v.mkString(":").trim.stripPrefix("\"").stripSuffix("\"")
        }
      }
    }
    out.view.mapValues(_.toMap).toMap
  }

  private def parseList(s: String): Seq[Double] =
    s.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toDouble).toSeq

  /** Load from a file path, defaulting like the reference (two-path
    * search: explicit path, else config/settings.yaml — main.py:54-65). */
  def load(path: String = "config/settings.yaml"): Settings =
    fromString(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def fromString(text: String): Settings = {
    val m = parseYamlSubset(text.replace("﻿", "")) // UTF-8-sig tolerant
    def sec(name: String) = m.getOrElse(name, Map.empty)
    Settings(
      aoi = AoiSettings(
        bbox = parseList(sec("aoi").getOrElse("bbox", "[0,0,0,0]")),
        geojsonPath = sec("aoi").getOrElse("geojson_path", "data/aoi/boundary.geojson"),
        bboxPadKm = sec("aoi").getOrElse("bbox_pad_km", "0").toDouble),
      dates = DateSettings(
        start = sec("dates").getOrElse("start", ""),
        end = sec("dates").getOrElse("end", "")),
      download = DownloadSettings(
        outputDir = sec("download").getOrElse("output_dir", "data/raw_landsat"),
        maxCloudCover = sec("download").getOrElse("max_cloud_cover", "10").toDouble,
        maxItems = sec("download").getOrElse("max_items", "10").toInt),
      stac = StacSettings(
        endpoint = sec("stac").getOrElse("endpoint", ""),
        collection = sec("stac").getOrElse("collection", "landsat-c2-l2")),
      useIntersects = sec("search").getOrElse("use_intersects", "true").toBoolean,
      products = ProductSettings(
        reprojectCrs = sec("products").getOrElse("reproject_crs", "EPSG:3857"),
        buildOverviews = sec("products").getOrElse("build_overviews", "true").toBoolean))
  }
}
