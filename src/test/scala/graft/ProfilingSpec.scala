package graft

import org.apache.spark.sql.functions._
import graft.queries.ProfilingQueries

/** Round-7 profiling/calibration family — independent value checks
  * (the oracle gate proves cross-engine equality; these prove the MATH). */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q138 AUC equals the brute-force concordant-pair count") {
    // reproduce (score, gold) with the query's own expression, then count
    // pairs the O(n²) way: AUC = (concordant + ties/2) / (npos*nneg)
    val toks = graft.functions.Portable.tokens(col("text"))
    val stopN = graft.ext.TextAnalysis.countIn(
      toks, graft.ext.TextAnalysis.LangProfiles.head._2)
    val rows = Tables.documents(spark, sf).select(
      graft.ext.TextAnalysis.qualityScore(
        size(toks).cast("long"), stopN, length(col("text"))).as("sc"),
      (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var conc = 0L; var ties = 0L
    for (p <- pos; n <- neg) {
      if (p > n) conc += 1 else if (p == n) ties += 1
    }
    val want = (2L * conc + ties).toDouble / (2.0 * pos.length * neg.length)
    val got = run("q138_filter_auc").head
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(math.abs(got.getDouble(2) - want) < 5e-7) // query rounds to 6 dp
  }

  test("q139 edit-distance verification matches a reference DP and the threshold") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val text = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = run("q139_edit_dedup").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (da, db, l, ml) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(l == lev(text(da), text(db)).toLong, s"pair ($da,$db)")
      assert(ml == math.max(text(da).length, text(db).length).toLong)
      assert(l * ProfilingQueries.EditDenom <= ml * ProfilingQueries.EditNum)
    }
  }

  test("q140 temperature weights normalize and undersample the head") {
    val rows = run("q140_temperature_mix")
      .select("source", "n", "weight", "alloc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-6)
    assert(rows.map(_._4).sum <= ProfilingQueries.MixBudget)
    // α<1 flattens the distribution: the largest source gets LESS than its
    // proportional share, the smallest gets MORE (equality iff uniform —
    // sf0.001's sources are near-uniform, so compare with tolerance)
    val ntot = rows.map(_._2).sum.toDouble
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(big._3 <= big._2 / ntot + 1e-9)
    assert(small._3 >= small._2 / ntot - 1e-9)
    if (big._2 > small._2) {
      assert(big._3 < big._2 / ntot)
      assert(small._3 > small._2 / ntot)
    }
  }

  test("q141 cluster-size distribution accounts for every clustered doc") {
    val dist = run("q141_cluster_sizes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    dist.foreach { case (sz, nc, nd) => assert(nd == sz * nc && sz >= 2) }
    val clustered = run("q65_dedup_clusters").select("doc_id").distinct().count()
    assert(dist.map(_._3).sum == clustered)
  }

  test("q142 decayed value is bounded by the raw value and positive") {
    val rows = run("q142_decayed_sum").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, dec, raw) =>
      assert(n > 0)
      // decay weights are in (0, 1]: 0 < decayed <= raw (values positive)
      assert(dec > 0.0 && dec <= raw + 1e-6, s"decayed $dec vs raw $raw")
    }
  }

  test("q143 FK profiling: true FKs hold, the negative control is internally consistent") {
    val rows = run("q143_fk_profile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 5)
    rows.foreach { case (_, nk, nc, cont, isFk) =>
      assert(nc <= nk)
      assert(math.abs(cont - nc.toDouble / nk) < 1e-6)
      assert(isFk == (nc == nk))
    }
    val byName = rows.map(r => r._1 -> r._5).toMap
    assert(byName("lineitem.l_orderkey->orders.o_orderkey"))
    assert(byName("customer.c_nationkey->nation.n_nationkey"))
  }

  test("q145 RRF arithmetic: score equals the rank formula; depth respected") {
    val rows = run("q145_rrf_fusion").collect()
    assert(rows.nonEmpty && rows.length <= ProfilingQueries.RrfTop)
    rows.foreach { r =>
      val ra = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(ra.nonEmpty || rb.nonEmpty)
      ra.foreach(v => assert(v >= 1 && v <= ProfilingQueries.RrfDepth))
      rb.foreach(v => assert(v >= 1 && v <= ProfilingQueries.RrfDepth))
      val want = ra.map(v => 1.0 / (v + ProfilingQueries.RrfK)).getOrElse(0.0) +
        rb.map(v => 1.0 / (v + ProfilingQueries.RrfK)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-8)
    }
    // descending by fused score
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q146 containment bounds: threshold holds and containment >= jaccard on shared pairs") {
    val cont = run("q146_containment").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(cont.nonEmpty)
    cont.values.foreach(c => assert(c >= 0.8 - 1e-9 && c <= 1.0 + 1e-9))
    // containment uses min-size denominator, jaccard the union: C >= J always
    val jac = run("q52_minhash_verified").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    jac.foreach { case (k, j) =>
      cont.get(k).foreach(c => assert(c >= j - 1e-9, s"pair $k")) }
  }

  test("q147 n-gram diversity grows with n and stays in (0, 1]") {
    val d = run("q147_ngram_diversity").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(d.keySet == Set(1L, 2L, 3L))
    d.values.foreach(v => assert(v > 0.0 && v <= 1.0))
    assert(d(1L) <= d(3L)) // longer grams repeat less
  }

  test("q148 Gini matches a driver-side recomputation from raw counts") {
    val counts = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = counts.length.toLong
    val ct = counts.sum
    val sic = counts.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val gini = (2.0 * sic - (n + 1) * ct) / (n.toDouble * ct)
    val hhi = counts.map(c => { val p = c.toDouble / ct; p * p }).sum
    val got = run("q148_source_gini").head
    assert(got.getLong(0) == n && got.getLong(1) == ct)
    assert(math.abs(got.getDouble(2) - gini) < 1e-6)
    assert(math.abs(got.getDouble(3) - hhi) < 1e-6)
  }

  test("q149 trimmed mean sits within the kept band") {
    val rows = run("q149_trimmed_quality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nk, tm, lo, hi) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nk > 0 && lo <= hi)
      assert(tm >= lo - 1e-9 && tm <= hi + 1e-9)
    }
  }

  test("q151 containment estimate: bounds and error consistency hold; estimate RANKS pairs correctly") {
    val rows = run("q151_containment_est").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (da, db, est, exact, err) =>
      assert(exact >= 0.0 && exact <= 1.0 + 1e-9, s"($da,$db) exact $exact")
      assert(est >= 0.0 && est <= 1.0 + 1e-9, s"($da,$db) est $est")
      assert(math.abs(err - math.abs(est - exact)) < 2e-6, s"($da,$db)")
    }
    // the 8-hash sketch is COARSE in absolute terms (that is the table's
    // finding — do not skip verification on it) but must rank correctly:
    // confidently-high estimates correspond to genuinely higher exact
    // containment than confidently-low ones
    val hi = rows.filter(_._3 >= 0.999).map(_._4)
    val lo = rows.filter(_._3 < 0.5).map(_._4)
    if (hi.nonEmpty && lo.nonEmpty)
      assert(hi.sum / hi.length > lo.sum / lo.length,
        s"high-estimate pairs should contain more: ${hi.sum / hi.length} vs ${lo.sum / lo.length}")
  }

  test("q144 k-core peel: monotone shrink and every survivor met the bar in the prior round") {
    val rows = run("q144_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) =>
      b._2 <= a._2 && b._3 <= a._3
    case _ => true })
    // brute-force one peel on the collected edge list
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_suppkey").cast("long"),
        (col("l_partkey") + graft.queries.ScaleQueries.PrPartOffset))
      .distinct().as[(Long, Long)].collect()
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val alive = deg.filter(_._2 >= ProfilingQueries.CoreK).keySet
    val e1 = edges.filter(e => alive(e._1) && alive(e._2))
    assert(rows(1)._3 == e1.length.toLong)
    assert(rows(1)._2 == e1.flatMap(e => Seq(e._1, e._2)).distinct.length.toLong)
  }
}
