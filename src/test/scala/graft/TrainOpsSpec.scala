package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Property checks for the round-4 training-data operators (q87–q94).
  * Exact value parity is the driver's DuckDB-oracle gate; these assert
  * the semantic invariants each operator promises. */
class TrainOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q87 count-min estimates never underestimate and bound the error") {
    val rows = run("q87_cms_topk").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must overestimate: term ${r.getString(0)}")
    }
    // depth-3/width-256 on this corpus: top terms should be within 2x
    val worst = rows.map(r => r.getLong(2).toDouble / r.getLong(1)).max
    assert(worst < 2.0, s"unexpectedly loose CMS estimate: $worst")
  }

  test("q88 mixture sampling hits each language quota exactly") {
    val ntot = Tables.documents(spark, sf).count()
    val got = run("q88_mixture_sample").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 300L, "de" -> 100L, "es" -> 100L, "fr" -> 100L, "zh" -> 100L)
    val strata = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.foreach { case (l, w) =>
      val quota = math.min(ntot * w / 1000, strata(l))
      assert(got.getOrElse(l, 0L) == quota, s"lang $l: ${got.get(l)} != $quota")
    }
  }

  test("q89 chunks tile every document with stride overlap") {
    val chunks = run("q89_doc_chunks").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(Portable.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nToks.keySet)
    chunks.foreach { case (doc, cs) =>
      val n = nToks(doc)
      // chunk ids are contiguous from 0; starts advance by the stride
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == i * 24L)
      }
      // last chunk reaches the end of the token stream; all others are full
      val last = cs.last
      assert(last.getLong(2) + last.getLong(3) == math.max(n, 0L))
      cs.init.foreach(r => assert(r.getLong(3) == 32L))
      // coverage: next chunk starts before the previous ends (overlap 8)
      assert(cs.length == (if (n <= 32) 1 else ((n - 9) / 24 + 1)))
    }
  }

  test("q90 gaps: totals reconcile with per-user event spans") {
    val rows = run("q90_event_gaps").collect()
    val spans = Tables.eventsMicros(spark, sf)
      .groupBy("user_id")
      .agg((max(col("tus")) - min(col("tus"))).as("span_us"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val (span, n) = spans(r.getLong(0))
      assert(r.getLong(1) == n - 1, "gap count = events - 1")
      // sum of floor(gap_us/1000) <= span/1000, and close to it
      assert(r.getLong(2) <= span / 1000)
      assert(r.getLong(2) >= span / 1000 - (n - 1)) // each floor loses < 1ms
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  test("q91 sign signatures: 16-bit range and deterministic across runs") {
    val a = run("q91_embed_signs").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = run("q91_embed_signs").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sorted.sameElements(b.sorted))
    a.foreach { case (_, sig) => assert(sig >= 0 && sig < (1L << 16)) }
    // projections must actually discriminate: many distinct signatures
    assert(a.map(_._2).distinct.length > a.length / 4)
  }

  test("q92 quantized values stay in int8 range") {
    run("q92_quantize_int8").collect().foreach { r =>
      assert(r.getLong(2) >= -127 && r.getLong(3) <= 127)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }

  test("q93 resample keeps more of longer documents") {
    val joined = run("q93_quality_resample")
      .join(Tables.documents(spark, sf), "doc_id")
    // every kept doc satisfies the hash threshold by construction; check
    // the keep RATE rises with the quality proxy bucket
    val byBucket = joined
      .groupBy((col("p_milli")).as("p")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf)
      .select(least(greatest(expr("(n_chars * 1000) div 600"), lit(100L)), lit(900L)).as("p"))
      .groupBy("p").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rates = totals.toSeq.sortBy(_._1).collect {
      case (p, tot) if tot >= 20 => (p, byBucket.getOrElse(p, 0L).toDouble / tot)
    }
    // low-quality extremes keep less than high-quality extremes
    if (rates.length >= 2)
      assert(rates.last._2 > rates.head._2,
        s"keep rate should rise with quality: $rates")
  }

  test("q94 bloom passes every true member (no false negatives)") {
    val trueKeys = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 480000.0)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val rows = run("q94_bloom_join").collect()
    val passed = rows.map(_.getLong(0)).toSet
    val members = rows.filter(_.getLong(1) == 1L).map(_.getLong(0)).toSet
    assert(members == trueKeys, "is_member flag must equal the exact semi-join")
    assert(trueKeys.subsetOf(passed), "bloom must never drop a true member")
    // false-positive rate stays small at this fill factor
    val fp = (passed -- trueKeys).size.toDouble / math.max(1, rows.length)
    assert(fp < 0.2, s"false-positive rate too high: $fp")
  }

  test("q95 histogram quantile estimates bracket the exact quantiles") {
    val est = run("q95_hist_quantile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    est.foreach { case (p, bin) =>
      val exact = chars(((chars.length * p + 999) / 1000 - 1).toInt)
      val (lo, hi) = (bin * 600.0 / 256, (bin + 1) * 600.0 / 256)
      assert(exact >= lo - 600.0 / 256 && exact <= hi + 600.0 / 256,
        s"p$p: exact $exact outside bin [$lo,$hi] ± one bin")
    }
    assert(est(500L) <= est(900L) && est(900L) <= est(990L))
  }

  test("q96 rank family is internally consistent") {
    val rows = run("q96_window_family").collect()
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      val n = g.length
      g.foreach { r =>
        val (rk, nt, pr, cd) = (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
        assert(nt >= 1 && nt <= 4)
        assert(math.abs(pr - (if (n == 1) 0.0 else (rk - 1).toDouble / (n - 1))) < 1e-12)
        assert(math.abs(cd - rk.toDouble / n) < 1e-12)
      }
      assert(g.map(_.getLong(2)).sorted.sameElements(1L to n))
    }
  }

  test("q97 cdc apply: deletes drop rows, updates win, base passes through") {
    val rows = run("q97_cdc_apply").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val lastOp = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"),
        when(col("o_orderkey") % 97 === 0, "D").otherwise("U"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    Tables.customer(spark, sf).select("c_custkey", "c_acctbal").collect().foreach { c =>
      val (k, bal) = (c.getLong(0), c.getDouble(1))
      lastOp.get(k) match {
        case Some(("D", _)) => assert(!rows.contains(k), s"deleted key $k survived")
        case Some(("U", v)) => assert(rows(k) == ((v, "cdc")), s"update lost for $k")
        case _ => assert(rows(k) == ((bal, "base")), s"base row changed for $k")
      }
    }
  }

  test("q98 salted join equals the plain join (rewrite is result-identical)") {
    val salted = run("q98_salted_join").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.events(spark, sf)
      .select(when(col("event_id") % 3 === 0, 0L)
        .otherwise(col("user_id") % 25).as("sk"), col("value"))
      .join(Tables.nation(spark, sf), col("sk") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
    // the hot key holds ~1/3 of all events plus its share of the rest
    val total = salted.values.map(_._1).sum
    val hot = salted.maxBy(_._2._1)
    assert(hot._2._1 > total / 4, s"expected a dominant key, got $salted")
  }

  test("q99 logprobs are valid probabilities and rank common-term docs higher") {
    val rows = run("q99_unigram_logprob").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(2) < 0.0, "log of p<1 must be negative"))
    // a smoothed unigram logprob is bounded below by ln(1/(T+V))
    val bound = {
      val toks = Tables.documents(spark, sf)
        .select(explode(Portable.tokens(col("text"))).as("t"))
      val t = toks.count(); val v = toks.distinct().count()
      math.log(1.0 / (t + v))
    }
    rows.foreach(r => assert(r.getDouble(2) >= bound - 1e-9))
  }

  test("q100 content-defined chunks match a brute-force fold") {
    val th = Tables.documents(spark, sf)
      .select(col("doc_id"),
        transform(Portable.tokens(col("text")), t => Portable.charFold(t)).as("th"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rows = run("q100_cdc_chunks").collect()
    assert(rows.map(_.getLong(0)).toSet == th.filter(_._2.nonEmpty).keySet)
    rows.foreach { r =>
      var cur = 0L; var mx = 0L; var n = 0L
      th(r.getLong(0)).foreach { h =>
        mx = math.max(mx, cur + 1)
        if (h % 16 == 0) { n += 1; cur = 0 } else cur += 1
      }
      if (cur > 0) n += 1
      assert(r.getLong(1) == n && r.getLong(2) == mx,
        s"doc ${r.getLong(0)}: (${r.getLong(1)},${r.getLong(2)}) != ($n,$mx)")
    }
  }
}
