package graft

import graft.queries.ScaleQueries
import graft.ext.Sketches

/** Semantic invariants for the round-6 scale-path operators (q119–q122):
  * brute-force reimplementations on collected sf0.001 data (exact for the
  * integer PageRank) plus the properties each operator exists to provide. */
class ScaleOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def foldHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  test("q119 multi-probe recall is at least the single-bucket recall (q53)") {
    val single = run("q53_ann_recall").collect().head.getDouble(3)
    val row = run("q119_ann_multiprobe").collect().head
    assert(row.getDouble(2) >= single,
      s"multi-probe recall ${row.getDouble(2)} < single-bucket $single")
    assert(row.getLong(1) <= 10 && row.getDouble(2) <= 1.0)
  }

  test("q120 fixed-point PageRank matches an exact integer reimplementation") {
    import ScaleQueries._
    val edges = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1) + PrPartOffset))
    val bidir = edges.flatMap { case (s0, p) => Seq((s0, p), (p, s0)) }
    val deg = bidir.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nn = deg.size.toLong
    val base = (PrDampDen - PrDampNum) * PrScale / (PrDampDen * nn)
    var r: Map[Long, Long] = deg.view.mapValues(_ => PrScale / nn).toMap
    for (_ <- 1 to PrIters) {
      val in = bidir.groupBy(_._2).view.mapValues { es =>
        es.map { case (src, _) => PrDampNum * r(src) / (PrDampDen * deg(src)) }.sum
      }.toMap
      r = in.view.mapValues(_ + base).toMap
    }
    val rows = run("q120_pagerank_iter").collect()
    assert(rows.length == nn)
    for (row <- rows)
      assert(row.getLong(2) == r(row.getLong(0)),
        s"rank_fp node ${row.getLong(0)}")
  }

  test("q121 grouped HLL estimates match the register-fold reference") {
    val events = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = events.groupBy(_._1)
    val rows = run("q121_hll_grouped").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == byType.keySet)
    for ((t, es) <- byType) {
      val regs = es.map(_._2).distinct.map { uid =>
        val k = uid.toString
        val h0 = foldHash(k) * 1000003L + foldHash(k + "#")
        val h1 = ((h0 % Sketches.HllP) * Sketches.HllA + Sketches.HllB) % Sketches.HllP
        val bucket = h1 % Sketches.HllBuckets
        val w = ((h1 % Sketches.HllP) * Sketches.HllA + Sketches.HllB) % Sketches.HllP
        val rho =
          if (w == 0) Sketches.HllMaxRho
          else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, Sketches.HllMaxRho)
        bucket -> rho.toLong
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expect = Sketches.estimateFromRegisters(regs)
      val r = rows(t)
      assert(math.abs(r.getDouble(1) - expect) < 1e-5, s"estimate $t")
      assert(r.getLong(2) == es.map(_._2).distinct.length.toLong, s"exact $t")
    }
  }

  test("q123 Hilbert layout matches a brute-force xy2d recomputation") {
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 128L
      while (s > 0) {
        val rx = (x / s) % 2; val ry = (y / s) % 2
        d += s * s * (2 * rx + (rx + ry) % 2)
        if (ry == 0) {
          if (rx == 1) { x = 255 - x; y = 255 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val grid = Tables.orders(spark, sf)
      .selectExpr(
        "least(greatest(cast(floor(o_totalprice / 2000.0) as bigint), 0L), 255L) as px",
        "cast(least(greatest(datediff(cast(o_orderdate as date), date'1992-01-01') div 16, 0L), 255L) as long) as py")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = grid.map { case (px, py) => (xy2d(px, py) / 1024L, px, py) }
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._2).min, g.map(_._2).max, g.map(_._3).min, g.map(_._3).max)
      }.toMap
    val rows = run("q123_hilbert_layout").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows == expect)
  }

  test("q124 decontamination is consistent with the q58 signal") {
    import ScaleQueries.DecontamMaxRatio
    val ratios = run("q58_contamination").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val expectDropped = ratios.count(_._2 > DecontamMaxRatio)
    val rows = run("q124_decontaminate").collect()
    assert(rows.map(_.getLong(3)).sum == expectDropped,
      "dropped docs == q58 rows above the threshold")
    for (r <- rows)
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"partition ${r.getString(0)}")
  }

  test("q125 fertility stats match a naive recomputation") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty), r.getLong(2)))
    val rows = run("q125_tokenizer_fertility").collect()
      .map(r => r.getString(0) -> r).toMap
    for ((lang, g) <- docs.groupBy(_._1)) {
      val nt = g.map(_._2.length.toLong).sum
      val tc = g.map(_._2.map(_.length.toLong).sum).sum
      val r = rows(lang)
      assert(r.getLong(1) == g.length && r.getLong(2) == nt && r.getLong(3) == tc)
      assert(r.getLong(5) == nt * 1000 / g.length, s"toks_per_doc $lang")
      if (nt > 0) assert(r.getLong(6) == tc * 1000 / nt, s"chars_per_tok $lang")
    }
  }

  test("q122 duplicated-span islands match a naive recomputation") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val spans = docs.view.mapValues { tk =>
      val th = tk.map(foldHash)
      th.zip(th.drop(1)).map { case (a, b) => (a * 8191L + b) % 1000003L }
    }.toMap.filter(_._2.nonEmpty)
    val docCount = spans.toSeq.flatMap { case (id, sh) => sh.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val rows = run("q122_dup_spans").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == spans.keySet)
    for ((id, sh) <- spans) {
      val dup = sh.map(h => docCount(h) >= ScaleQueries.SpanMinDocs)
      var best = 0; var cur = 0
      for (f <- dup) { if (f) { cur += 1; best = math.max(best, cur) } else cur = 0 }
      val r = rows(id)
      assert(r.getLong(1) == sh.size, s"n_spans doc $id")
      assert(r.getLong(2) == dup.count(identity), s"n_dup doc $id")
      assert(r.getLong(3) == best, s"max_run doc $id")
    }
  }
}
