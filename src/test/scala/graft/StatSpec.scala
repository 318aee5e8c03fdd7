package graft

import org.apache.spark.sql.functions._
import graft.queries.StatQueries._

/** Semantic invariants for the round-6 statistics operators (q132–q134):
  * exact scalar reimplementations of the closed-form regressions (all
  * sums are integer/decimal-exact, lns 9-dp-rounded — same-JVM math
  * reproduces Spark bit-for-bit) and a split-leakage recomputation from
  * the independently-specced q52 edge list. */
class StatSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def foldHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("q132 per-segment OLS matches an exact integer reimplementation") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = rows.groupBy(_._1).map { case (seg, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(_._2).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val num = (BigInt(n) * BigInt(sxy) - BigInt(sx) * BigInt(sy)).toDouble
      val den = (BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx)).toDouble
      val slopeMilli = r6(num / den * 1000.0)
      val intercept = r6((sy.toDouble - slopeMilli / 1000.0 * sx.toDouble) /
        n.toDouble / 100.0)
      seg -> (n, slopeMilli, intercept)
    }
    val got = run("q132_group_regression").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got == brute, s"got=$got want=$brute")
  }

  test("q133 Zipf fit matches an exact decimal-sum reimplementation") {
    val freq = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty).map(foldHash))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (h, c) => (-c, h) }.take(ZipfTop)
    val pts = freq.zipWithIndex.map { case ((_, c), i) =>
      (r9(math.log((i + 1).toDouble)), r9(math.log(c.toDouble)))
    }
    val n = BigDecimal(pts.length)
    val sx = pts.map(_._1).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val slope = r6(num.toDouble / den.toDouble)
    val intercept = r6((sy.toDouble - num.toDouble / den.toDouble * sx.toDouble) /
      n.toDouble)
    val row = run("q133_zipf_fit").collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(row.getDouble(1) == slope, s"slope ${row.getDouble(1)} != $slope")
    assert(row.getDouble(2) == intercept)
    assert(slope < 0.0, "token spectrum must be decreasing in rank")
  }

  test("q136 drift quantiles: source rows bracket the corpus row, max_gap is the grid max") {
    val rows = run("q136_quantile_drift").collect()
    assert(rows.length > 1)
    for (r <- rows) {
      val qs = (1 to 5).map(r.getDouble)
      assert(qs == qs.sorted, s"quantiles must be monotone: $qs")
      val gap = r.getDouble(6)
      assert(gap >= 0.0 && gap <= 1.0)
    }
    // at least one source must actually drift from the corpus mixture
    assert(rows.map(_.getDouble(6)).max > 0.0)
  }

  test("q137 dedup curve is monotone non-increasing in the threshold") {
    val rows = run("q137_dedup_rate_curve").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.head._1 == 0.5)
    for (Array(a, b) <- rows.sliding(2).map(_.toArray).toSeq if rows.length > 1) {
      assert(a._2 >= b._2, s"n_pairs must not grow with threshold: $a -> $b")
      assert(a._3 >= b._3, s"n_docs must not grow with threshold: $a -> $b")
    }
    // threshold 0.5 is exactly the full verified relation
    val full = run("q52_minhash_verified").count()
    assert(rows.head._2 == full)
  }

  test("q134 split-leakage matrix matches a recomputation from the q52 edges") {
    val splits = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val b = foldHash(r.getString(1)) % SplitMod
        r.getLong(0) -> (if (b < SplitTrain) "train"
                         else if (b == SplitTrain) "val" else "test")
      }.toMap
    val edges = run("q52_minhash_verified").select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = edges.map { case (da, db) =>
      val (sa, sb) = (splits(da), splits(db))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case ((sa, sb), g) =>
      (sa, sb, g.length.toLong, sa != sb)
    }.toSet
    val got = run("q134_split_leakage").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == brute, s"got=$got want=$brute")
  }

  test("q248 sketch quantiles sit within the ±0.5% relative-error bound of the exact quantiles") {
    // the property the sketch exists to provide: a 3-significant-digit
    // relative-error grid means the cell containing the true rank-r
    // value has width ≤ 1% of that value, and the midpoint estimate is
    // within half of it. Exact reference: the rank-r order statistic
    // over the same half-cent-rounded domain, computed by brute force.
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = run("q248_quantile_sketch").collect()
    assert(rows.length == xs.size * SketchGrid.size,
      "one row per (group, p)")
    rows.foreach { r =>
      val (flag, rank, est) =
        (r.getString(0), r.getLong(2), r.getDouble(3))
      val exact = xs(flag)(rank.toInt - 1).toDouble / 100.0
      assert(math.abs(est - exact) <= 0.005 * exact + 0.01,
        s"$flag p=${r.getDouble(1)}: est $est vs exact $exact " +
          "breaks the relative-error bound")
      // the register stays register-sized (the tree-reduce claim)
      assert(r.getLong(4) < 10000, s"register blew up: ${r.getLong(4)} cells")
    }
    // MERGEABILITY: the register built from two disjoint halves and
    // added cell-wise equals the register built in one pass — counts
    // are the whole state, so the sketch tree-reduces/merges exactly
    val xiM = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("x"))
    def register(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("w", pow(lit(10.0),
        greatest(length(col("x").cast("string")) - SketchSigDigits,
          lit(0)).cast("double")).cast("long"))
      .select((expr("x DIV w") * col("w")).as("cell"))
      .groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = register(xiM)
    val a = register(xiM.filter(col("l_orderkey") % 2 === 0))
    val b = register(xiM.filter(col("l_orderkey") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "cell-wise count addition must equal the one-pass register")
  }

  test("q251 merged persisted registers are bit-identical to the single-pass q248 answer") {
    def rows(q: String) = run(q).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val one = rows("q248_quantile_sketch")
    val merged = rows("q251_sketch_register_merge")
    assert(merged == one,
      "cell-wise addition of the two persisted half-registers must " +
        s"reproduce the one-pass register exactly; diff=${merged.diff(one)}")
  }

  test("q253 weighted quantiles honor the error bound vs exact token-weighted order statistics") {
    // exact (score, weight) pairs straight from the engine's own scalar
    // pipeline — the spec tests the SKETCH, not the score definition
    // (the score's own semantics are pinned by the q26/q249 suites)
    val scored = {
      import org.apache.spark.sql.functions._
      val toks = graft.functions.Portable.tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = graft.ext.TextAnalysis.countIn(toks,
        graft.ext.TextAnalysis.LangProfiles.head._2)
      Tables.documents(spark, sf).select(
          floor(graft.ext.TextAnalysis.qualityScore(nTok, stopN,
            length(col("text"))) * 1000000.0 + 0.5).cast("long").as("x"),
          nTok.as("wt"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val sorted = scored.sortBy(_._1)
    val totalW = sorted.map(_._2).sum
    val cumW = sorted.scanLeft(0L)(_ + _._2).drop(1)
    val rows = run("q253_weighted_quantile_sketch").collect()
    assert(rows.length == graft.queries.StatQueries.DriftGrid.size)
    rows.foreach { r =>
      val (p, rankW, est, nTokens) =
        (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nTokens == totalW, "register must account every token")
      assert(rankW == math.ceil(p * totalW).toLong)
      // exact weighted quantile: the score at the first doc whose
      // cumulative token weight reaches rank r
      val exact = sorted(cumW.indexWhere(_ >= rankW))._1.toDouble / 1e6
      assert(math.abs(est - exact) <= 0.005 * math.abs(exact) + 1e-6,
        s"p=$p: weighted est $est vs exact $exact breaks the bound")
    }
    // token weighting MOVES the answer vs row counting on this corpus:
    // the median by tokens differs from the median by docs (documents
    // are length-skewed — precisely why curation weights by tokens)
    val rowMedian = {
      val xs = scored.map(_._1).sorted
      xs(math.ceil(0.5 * xs.length).toInt - 1).toDouble / 1e6
    }
    val wMedianEst = rows.find(_.getDouble(0) == 0.5).get.getDouble(2)
    val wMedianExact = sorted(
      cumW.indexWhere(_ >= math.ceil(0.5 * totalW).toLong))._1.toDouble / 1e6
    assert(math.abs(wMedianExact - rowMedian) > 1e-9 ||
      math.abs(wMedianEst - rowMedian) > 1e-9,
      "expected the token-weighted median to differ from the row median")
  }

  test("sketch helpers on a SIGNED domain: width ignores the sign, cells are trunc-ordered, estimates keep the relative-error bound (r17 ADVICE)") {
    import graft.queries.StatQueries.{sketchW, sketchCell, sketchMid}
    // mixed-sign fixed-point domain spanning several decades, incl. the
    // r17 ADVICE counter-examples (−155 with w=10 under the broken
    // sign-counting width) and exact decade boundaries both sides of 0
    val xs: Seq[Long] = Seq(-1234567L, -1000000L, -999999L, -1005L, -1000L,
      -999L, -155L, -150L, -12L, -1L, 0L, 1L, 9L, 155L, 999L, 1000L,
      1005L, 123456L) ++ (1 to 500).map(i => (i.toLong * i * 7) - 600000L)
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .withColumn("w", sketchW(col("x")))
      .withColumn("cell", sketchCell(col("x"), col("w")))
      .withColumn("mid", sketchMid(col("cell"), 200.0))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def wOf(v: Long): Long = {
      val d = math.abs(v).toString.length - SketchSigDigits
      if (d <= 0) 1L else math.pow(10, d).toLong
    }
    rows.foreach { case (x, w, cell, mid) =>
      assert(w == wOf(x), s"x=$x: width $w counts the sign as a digit")
      // trunc-toward-zero (Java semantics) — pins Spark's DIV to what
      // sketchCellSql spells for DuckDB (whose // floors)
      assert(cell == (x / w) * w, s"x=$x w=$w: cell $cell is not trunc")
      // the estimate lands INSIDE the cell on the value scale: cell>0
      // covers [c, c+w), cell<0 covers (c−w, c], cell 0 is exactly {0}
      val v = x.toDouble / 100.0
      if (cell == 0L) assert(mid == 0.0 && x == 0L)
      else if (cell > 0)
        assert(mid >= v - wOf(cell) / 100.0 && mid <= v + wOf(cell) / 100.0 &&
          mid * 100.0 > cell - 1e-9 && mid * 100.0 < cell + wOf(cell) + 1e-9,
          s"x=$x cell=$cell mid=$mid outside its cell")
      else
        assert(mid * 100.0 < cell + 1e-9 && mid * 100.0 > cell - wOf(cell) - 1e-9,
          s"x=$x cell=$cell mid=$mid outside its cell")
    }
    // end-to-end rank walk on the signed register keeps the ±0.5%
    // relative (+½ grid step absolute) bound vs exact order statistics
    val reg = rows.groupBy(_._3).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val cum = reg.scanLeft(0L)(_ + _._2).drop(1)
    val sorted = xs.sorted
    SketchGrid.foreach { p =>
      val r = math.ceil(p * xs.size).toLong
      val c = reg(cum.indexWhere(_ >= r))._1
      val est = if (c == 0L) 0.0
        else (2 * c + (if (c > 0) wOf(c) else -wOf(c))).toDouble / 200.0
      val exact = sorted(r.toInt - 1).toDouble / 100.0
      assert(math.abs(est - exact) <= 0.005 * math.abs(exact) + 0.01,
        s"p=$p: signed est $est vs exact $exact breaks the bound")
    }
  }

  test("q249 drift-sketch quantiles honor the relative-error bound per source and corpus; gap arithmetic exact") {
    val drift = run("q249_drift_sketch").collect()
    val scoredDocs = {
      val toks = graft.functions.Portable.tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = graft.ext.TextAnalysis.countIn(toks,
        graft.ext.TextAnalysis.LangProfiles.head._2)
      Tables.documents(spark, sf).select(col("source"),
          floor(graft.ext.TextAnalysis.qualityScore(nTok, stopN,
            length(col("text"))) * 1000000.0 + 0.5).cast("long").as("x"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }
    val bySrc = scoredDocs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val corpus = scoredDocs.map(_._2).sorted
    drift.foreach { r =>
      val (src, p, estS, estC, gap, maxGap) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      def exactAt(xs: Array[Long]): Double =
        xs(math.ceil(p * xs.length).toInt - 1).toDouble / 1e6
      val (eS, eC) = (exactAt(bySrc(src)), exactAt(corpus))
      assert(math.abs(estS - eS) <= 0.005 * eS + 1e-6,
        s"$src p=$p: src est $estS vs exact $eS")
      assert(math.abs(estC - eC) <= 0.005 * eC + 1e-6,
        s"corpus p=$p: est $estC vs exact $eC")
      assert(math.abs(gap - math.abs(estS - estC)) < 1e-12)
      assert(maxGap >= gap - 1e-12)
    }
    assert(drift.length == bySrc.size * DriftGrid.size)
  }
}
