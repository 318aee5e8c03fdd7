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

  // ---- C4 validity + repair ------------------------------------------------
  // The reference fixes invalid AOI geometry with union + buffer(0) and a
  // TopologicalError fallback (reference src/transform/compute_ndvi.py:115-126).
  // The pure-Scala analog: detect self-intersecting / zero-area rings, and
  // repair by NODE-SPLITTING — insert the self-intersection points as ring
  // vertices and pinch off each closed loop as its own simple sub-ring
  // (a bow-tie becomes its two triangles, a figure-eight its two lobes).
  // Even-odd containment is PRESERVED: for any test point, crossing parity
  // summed over the split rings equals the original ring's parity, which is
  // exactly the region buffer(0) keeps. Zero-area slivers are dropped;
  // geometry with nothing left raises the reference's error.

  private def area2(ring: IndexedSeq[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s
  }

  /** Proper (interior-interior) intersection of segments p1p2 / p3p4:
    * returns (t, u, point) with 0<t<1, 0<u<1; None for parallel, shared
    * endpoints, or mere endpoint touches. */
  private def segIntersect(p1: (Double, Double), p2: (Double, Double),
                           p3: (Double, Double), p4: (Double, Double))
      : Option[(Double, Double, (Double, Double))] = {
    val rx = p2._1 - p1._1; val ry = p2._2 - p1._2
    val sx = p4._1 - p3._1; val sy = p4._2 - p3._2
    val denom = rx * sy - ry * sx
    if (denom == 0.0) return None
    val qx = p3._1 - p1._1; val qy = p3._2 - p1._2
    val t = (qx * sy - qy * sx) / denom
    val u = (qx * ry - qy * rx) / denom
    if (t <= 0 || t >= 1 || u <= 0 || u >= 1) None
    else Some((t, u, (p1._1 + t * rx, p1._2 + t * ry)))
  }

  /** Open form of a ring (closing vertex dropped). */
  private def open(ring: IndexedSeq[(Double, Double)]): IndexedSeq[(Double, Double)] =
    if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring

  private def ringSelfIntersects(ring: IndexedSeq[(Double, Double)]): Boolean = {
    val pts = open(ring); val n = pts.length
    (0 until n).exists { i =>
      (i + 1 until n).exists { j =>
        val adjacent = (i + 1) % n == j || (j + 1) % n == i
        !adjacent &&
          segIntersect(pts(i), pts((i + 1) % n), pts(j), pts((j + 1) % n)).isDefined
      }
    }
  }

  /** C4 validity: every ring simple (no proper self-intersection), with at
    * least 3 distinct vertices and nonzero area. */
  def isValid(polys: Seq[Polygon]): Boolean =
    polys.forall(_.rings.forall { r =>
      val o = open(r)
      o.length >= 3 && area2(o) != 0.0 && !ringSelfIntersects(r)
    })

  /** Split one ring at its proper self-intersections into simple sub-rings
    * (closed form). A ring that is already simple returns itself. */
  private[geo] def splitRing(ring: IndexedSeq[(Double, Double)])
      : Seq[IndexedSeq[(Double, Double)]] = {
    val pts = open(ring); val n = pts.length
    if (n < 3) return Seq.empty
    // per-edge cut points (parametric position along the edge)
    val cuts = Array.fill(n)(List.empty[(Double, (Double, Double))])
    for (i <- 0 until n; j <- i + 1 until n) {
      val adjacent = (i + 1) % n == j || (j + 1) % n == i
      if (!adjacent)
        segIntersect(pts(i), pts((i + 1) % n), pts(j), pts((j + 1) % n)).foreach {
          case (t, u, p) => cuts(i) ::= (t, p); cuts(j) ::= (u, p)
        }
    }
    def close(r: IndexedSeq[(Double, Double)]) = r :+ r.head
    if (cuts.forall(_.isEmpty))
      return if (area2(pts) == 0.0) Seq.empty else Seq(close(pts))
    // augmented vertex walk: original vertices with cut points spliced in
    val aug = (0 until n).flatMap(i => pts(i) +: cuts(i).sortBy(_._1).map(_._2))
    // pinch: a revisited vertex closes the loop walked since its first visit
    val out = collection.mutable.ArrayBuffer.empty[IndexedSeq[(Double, Double)]]
    val stack = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    aug.foreach { p =>
      val idx = stack.indexOf(p)
      if (idx >= 0) {
        val loop = stack.slice(idx, stack.length).toIndexedSeq
        stack.remove(idx + 1, stack.length - idx - 1)
        if (loop.length >= 3 && area2(loop) != 0.0) out += close(loop)
      } else stack += p
    }
    if (stack.length >= 3 && area2(stack.toIndexedSeq) != 0.0)
      out += close(stack.toIndexedSeq)
    out.toSeq
  }

  /** C4 repair: node-split every invalid ring, drop zero-area slivers.
    * Throws (the reference's error path) if nothing positive-area remains. */
  def repair(polys: Seq[Polygon]): Seq[Polygon] = {
    val fixed = polys.flatMap { p =>
      val rings = p.rings.flatMap(splitRing)
      if (rings.isEmpty) None else Some(Polygon(rings.toIndexedSeq))
    }
    if (fixed.isEmpty)
      throw new IllegalArgumentException(
        "AOI geometry became empty after repair") // compute_ndvi.py:120-126
    fixed
  }
}
