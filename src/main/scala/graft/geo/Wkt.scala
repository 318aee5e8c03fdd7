package graft.geo

/** Minimal WKT polygon support: parse POLYGON/MULTIPOLYGON and test point
  * containment by ray casting (even-odd rule, holes supported).
  *
  * Replaces shapely/GEOS in the reference's clip
  * (reference src/transform/compute_ndvi.py:108-136) — pure Scala, public
  * even-odd algorithm; no native libs offline.
  */
object Wkt {

  /** One polygon = outer ring + holes; each ring is a closed (x,y) seq. */
  final case class Polygon(rings: IndexedSeq[IndexedSeq[(Double, Double)]])

  /** Parse POLYGON ((...)) / MULTIPOLYGON (((...))) WKT. */
  def parse(wkt: String): Seq[Polygon] = {
    val body = wkt.trim
    val upper = body.toUpperCase
    def parseRing(s: String): IndexedSeq[(Double, Double)] =
      s.split(",").iterator.map { pt =>
        val xs = pt.trim.split("\\s+")
        (xs(0).toDouble, xs(1).toDouble)
      }.toIndexedSeq
    def parsePolygonBody(s: String): Polygon = {
      // s = "(ring), (ring), ..." with each ring in parens
      val rings = collection.mutable.ArrayBuffer.empty[IndexedSeq[(Double, Double)]]
      var depth = 0; val sb = new StringBuilder
      s.foreach {
        case '(' => depth += 1; if (depth > 1) sb.append('(')
        case ')' =>
          depth -= 1
          if (depth == 0) { rings += parseRing(sb.toString); sb.clear() }
          else sb.append(')')
        case c if depth >= 1 => sb.append(c)
        case _ => ()
      }
      Polygon(rings.toIndexedSeq)
    }
    if (upper.startsWith("POLYGON")) {
      val inner = body.substring(body.indexOf('(') + 1, body.lastIndexOf(')'))
      Seq(parsePolygonBody(inner))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      val inner = body.substring(body.indexOf('(') + 1, body.lastIndexOf(')'))
      // split top-level polygon bodies
      val polys = collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var start = -1
      inner.zipWithIndex.foreach { case (c, i) =>
        if (c == '(') { if (depth == 0) start = i; depth += 1 }
        else if (c == ')') { depth -= 1; if (depth == 0) polys += inner.substring(start + 1, i) }
      }
      polys.toSeq.map(parsePolygonBody)
    } else throw new IllegalArgumentException(s"Unsupported WKT: ${wkt.take(40)}")
  }

  /** Even-odd ray cast for one ring. */
  private def inRing(x: Double, y: Double, ring: IndexedSeq[(Double, Double)]): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Point in polygon set: inside outer ring an odd number of ring hits
    * (holes flip containment via even-odd). */
  def contains(polys: Seq[Polygon], x: Double, y: Double): Boolean =
    polys.exists { p =>
      var hits = 0
      p.rings.foreach(r => if (inRing(x, y, r)) hits += 1)
      hits % 2 == 1
    }

  /** Envelope of the polygon set. */
  def envelope(polys: Seq[Polygon]): (Double, Double, Double, Double) = {
    val pts = polys.iterator.flatMap(_.rings.iterator.flatten)
    pts.foldLeft((Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)) {
      case ((mnx, mny, mxx, mxy), (x, y)) =>
        (math.min(mnx, x), math.min(mny, y), math.max(mxx, x), math.max(mxy, y))
    }
  }
}
