package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** Semantic invariants for the round-5 analytics operators (q101–q110).
  * Exact value equality is the driver's DuckDB-oracle gate; each test
  * here cross-checks an operator against an independent brute-force
  * reimplementation on collected sf0.001 data, or asserts the property
  * the operator exists to provide. */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def tokensOf(text: String): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq

  private def foldHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  test("q101 repetition signals match a naive per-doc recomputation") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1))).toMap
    val rows = run("q101_repetition").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == docs.filter(_._2.size >= 2).keySet)
    for ((id, tk) <- docs if tk.size >= 2) {
      val th = tk.map(foldHash)
      val sh = th.zip(th.tail).map { case (a, b) => (a * 8191L + b) % 1000003L }
      val top = sh.groupBy(identity).values.map(_.size).max
      val r = rows(id)
      assert(r.getLong(1) == th.size, s"n_toks doc $id")
      assert(r.getLong(2) == th.distinct.size, s"n_types doc $id")
      assert(r.getDouble(4) == top.toDouble / (th.size - 1), s"top_bigram_frac doc $id")
    }
  }

  test("q102 packing matches an imperative greedy fold per stratum") {
    val C = AnalyticsQueries.PackCapacity
    val perLang = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        graft.functions.Portable.charFold(col("text")).as("hk"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .collect()
      .groupBy(_.getString(0))
    val rows = run("q102_seq_packing").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == perLang.keySet)
    for ((lang, rs) <- perLang) {
      val ns = rs.sortBy(r => (r.getLong(2), r.getLong(1))).map(_.getLong(3))
      var bins = 0L; var cur = 0L
      ns.foreach { n =>
        if (cur + n <= C || cur == 0) cur += n else { bins += 1; cur = n }
      }
      val nBins = bins + (if (cur > 0) 1 else 0)
      val r = rows(lang)
      assert(r.getLong(1) == rs.length, s"n_docs $lang")
      assert(r.getLong(2) == ns.sum, s"n_toks $lang")
      assert(r.getLong(3) == nBins, s"n_bins $lang")
      assert(r.getLong(4) == ns.sum * 1000 / (nBins * C), s"fill_milli $lang")
    }
  }

  test("q103 entropy: uniform docs hit ln(k); bounds hold everywhere") {
    val rows = run("q103_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9, s"entropy >= 0, doc ${r.getLong(0)}")
      assert(h <= math.log(k.toDouble) + 1e-6,
        s"entropy <= ln(n_types), doc ${r.getLong(0)}")
      if (k == n) // all tokens distinct => exactly uniform => H = ln(n)
        assert(math.abs(h - math.log(n.toDouble)) < 1e-5, s"uniform doc ${r.getLong(0)}")
    }
  }

  test("q104 one PageRank step conserves mass up to damping leakage") {
    val edges = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nSupp = edges.map(_._1).distinct.length
    val nPart = edges.map(_._2).distinct.length
    val nn = nSupp + nPart
    val rows = run("q104_pagerank_step").collect()
    assert(rows.length == nPart)
    // every part's indegree matches; rank = base + d * sum(contrib)
    val indeg = edges.groupBy(_._2).view.mapValues(_.length).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == indeg(r.getLong(0)), s"n_in node ${r.getLong(0)}")
      assert(r.getDouble(2) > 0.15 / nn - 1e-12)
    }
    // parts receive d * (share of supplier mass that flows to parts) + base
    val total = rows.map(_.getDouble(2)).sum
    val expected = 0.15 * nPart.toDouble / nn + 0.85 * nSupp.toDouble / nn
    assert(math.abs(total - expected) < 1e-6, s"mass $total vs $expected")
  }

  test("q105 weighted sample is the ascending-key prefix with doc_id ties") {
    val rows = run("q105_weighted_sample").collect()
    assert(rows.length == 100)
    val keys = rows.map(r => (r.getDouble(3), r.getLong(0)))
    assert(keys.sameElements(keys.sortBy(identity)), "rows arrive key-ordered")
    // heavier docs should be overrepresented vs a uniform draw: compare
    // mean weight of the sample against the corpus mean
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(greatest(col("n_chars"), lit(1L)))).collect()(0).getDouble(0)
    val sampleMean = rows.map(_.getLong(2).toDouble).sum / rows.length
    assert(sampleMean > corpusMean, s"weighted sample mean $sampleMean <= corpus $corpusMean")
  }

  test("q106 MAD outliers match a naive recomputation per event type") {
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt)
      val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val byType = Tables.events(spark, sf).select("event_type", "value")
      .collect().filter(!_.isNullAt(1))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    val rows = run("q106_mad_outliers").collect()
    rows.foreach { r =>
      val vs = byType(r.getString(0))
      val med = median(vs)
      val mad = median(vs.map(v => math.abs(v - med)))
      assert(math.abs(r.getDouble(1) - med) < 1e-9, s"median ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - mad) < 1e-9, s"mad ${r.getString(0)}")
      val nOut = vs.count(v => math.abs(v - med) > 3 * mad)
      assert(r.getLong(4) == nOut, s"n_outliers ${r.getString(0)}")
    }
  }

  test("q107 PMI matches a naive bigram recomputation") {
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val uni = texts.flatMap(tokensOf).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tu = uni.values.sum
    val allPairs = texts.map(tokensOf).filter(_.size >= 2)
      .flatMap(tk => tk.zip(tk.tail))
    val tb = allPairs.length.toLong
    val pc = allPairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = pc.filter(_._2 >= 5).map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c.toDouble * tu * tu / (tb.toDouble * uni(a) * uni(b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ((a, b), (c, pmi))
    }
    val top = expected.toSeq.sortBy { case ((a, b), (_, pmi)) => (-pmi, a, b) }.take(20)
    val rows = run("q107_pmi_pairs").collect()
    assert(rows.length == top.length.min(20))
    rows.zip(top).foreach { case (r, ((a, b), (c, pmi))) =>
      assert(r.getString(0) == a && r.getString(1) == b, s"pair order ($a,$b)")
      assert(r.getLong(2) == c)
      assert(math.abs(r.getDouble(3) - pmi) < 2e-6, s"pmi($a,$b)")
    }
  }

  test("q108 HLL intersection: union <= sum of parts, estimate near exact") {
    val r = run("q108_hll_intersect").collect()(0)
    val (ea, eb, eu, ei) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val exact = r.getLong(4)
    assert(eu <= ea + eb + 1e-9, "union estimate cannot exceed sum of parts")
    assert(ei == BigDecimal(ea + eb - eu).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(exact > 0)
    // m=64 registers on a 150-user universe: generous error envelope
    assert(math.abs(ei - exact.toDouble) / exact < 0.6, s"est $ei vs exact $exact")
  }

  test("q109 z-order buckets cover all orders and bound both dimensions") {
    val rows = run("q109_zorder").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (zb, pxMin, pxMax, pyMin, pyMax) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(zb >= 0 && zb < 64)
      // a 1024-z bucket spans a 32x32 tile: both dims bounded within it
      assert(pxMax - pxMin < 32, s"px spread in bucket $zb")
      assert(pyMax - pyMin < 32, s"py spread in bucket $zb")
    }
  }

  test("q110 skyline equals the O(n^2) dominance filter") {
    val pts = Tables.part(spark, sf)
      .select(col("p_retailprice"), col("p_size").cast("long"))
      .distinct().collect().map(r => (r.getDouble(0), r.getLong(1)))
    val expected = pts.filter { case (p, s) =>
      !pts.exists { case (p2, s2) => p2 >= p && s2 >= s && (p2 > p || s2 > s) }
    }.toSet
    val rows = run("q110_skyline").collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(rows == expected)
  }
}
