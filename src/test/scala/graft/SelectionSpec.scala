package graft

import org.apache.spark.sql.functions._
import graft.queries.SelectionQueries

/** Semantic invariants for the round-6 selection/compression operators
  * (q111–q118 + q112 in CurationQueries). Exact value equality is the
  * driver's DuckDB-oracle gate; each test here cross-checks an operator
  * against an independent brute-force reimplementation on collected
  * sf0.001 data, or asserts the property the operator exists to provide. */
class SelectionSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def tokensOf(text: String): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq

  private def foldHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  private def rnd9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("q111 DSIR weights match a naive reimplementation") {
    val B = SelectionQueries.DsirBuckets
    val toks = docs.flatMap { case (id, lang, text) =>
      tokensOf(text).map(t => (id, lang, foldHash(t) % B))
    }
    val cq = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tq = toks.size.toLong
    val tt = toks.count(_._2 == "en").toLong
    val lr: Map[Long, BigDecimal] = cq.keys.map { b =>
      val a = rnd9(math.log((ct.getOrElse(b, 0L) + 1).toDouble / (tt + B)))
      val c = rnd9(math.log((cq(b) + 1).toDouble / (tq + B)))
      b -> BigDecimal(a - c).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val expect = toks.groupBy(_._1).map { case (id, ts) =>
      id -> ts.map(t => lr(t._3)).sum
    }
    val top = expect.toSeq.sortBy { case (id, w) => (-w, id) }.take(100)
    val rows = run("q111_dsir").collect()
    assert(rows.map(_.getLong(0)).toSeq == top.map(_._1))
    for (r <- rows)
      assert(math.abs(r.getDouble(3) - expect(r.getLong(0)).toDouble) < 1e-5,
        s"weight doc ${r.getLong(0)}")
  }

  test("q112 apply is consistent with the q65 cluster table") {
    val clusters = run("q65_dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val removed = clusters.count { case (doc, cid) => doc != cid }
    val rows = run("q112_dedup_apply").collect()
    assert(rows.map(_.getLong(1)).sum == docs.size, "n_before covers the corpus")
    for (r <- rows)
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3), s"before-after ${r.getString(0)}")
    assert(rows.map(_.getLong(3)).sum == removed,
      "total removed == non-representative cluster members")
  }

  test("q113 KL divergences are non-negative and cover every source") {
    val rows = run("q113_kl_divergence").collect()
    val expect = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == expect)
    // KL >= 0 up to the 9-dp per-term rounding (256 terms → |error| < 2e-7)
    for (r <- rows) assert(r.getDouble(2) >= -1e-6, s"KL(${r.getString(0)})")
  }

  test("q114 PQ encoding matches a brute-force argmin") {
    import SelectionQueries.{PqM, PqSubDim, PqK}
    val cb: Array[Array[Array[Double]]] = Array.tabulate(PqM) { m =>
      (0L until PqK).map(i => vecs(i).slice(m * PqSubDim, (m + 1) * PqSubDim)).toArray
    }
    def enc(v: Array[Double], m: Int): (Int, Double) = {
      val sub = v.slice(m * PqSubDim, (m + 1) * PqSubDim)
      var bi = 0; var bd = 1e300
      for (k <- 0 until PqK) {
        var dd = 0.0
        for (j <- sub.indices) { val t = sub(j) - cb(m)(k)(j); dd += t * t }
        if (dd < bd) { bd = dd; bi = k + 1 }
      }
      (bi, bd)
    }
    val expect = collection.mutable.Map[(Int, Int), (Long, BigDecimal)]()
      .withDefaultValue((0L, BigDecimal(0)))
    for ((_, v) <- vecs.toSeq; m <- 0 until PqM) {
      val (code, err) = enc(v, m)
      val (n, e) = expect((m, code))
      expect((m, code)) =
        (n + 1, e + BigDecimal(err).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    }
    val rows = run("q114_pq_encode").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == expect.filter(_._2._1 > 0).keySet)
    for ((k, (n, e)) <- expect if n > 0) {
      assert(rows(k)._1 == n, s"count $k")
      assert(math.abs(rows(k)._2 - e.toDouble) < 1e-5, s"err_sum $k")
    }
  }

  test("q115 SemDeDup drop counts are bounded and cells cover all vectors") {
    val rows = run("q115_semdedup").collect()
    assert(rows.map(_.getLong(1)).sum == vecs.size, "cells partition the table")
    for (r <- rows) {
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1),
        s"cell ${r.getInt(0)}: at least one representative survives")
    }
  }

  test("q116 bigram LM matches a naive reimplementation") {
    import SelectionQueries.LmLambda
    val allToks = docs.map { case (id, _, text) => id -> tokensOf(text) }
    val bigrams = allToks.flatMap { case (_, tk) => tk.zip(tk.drop(1)) }
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cp = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val unis = allToks.flatMap(_._2)
    val cu = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tu = unis.size.toLong; val v = cu.size.toLong
    val rows = run("q116_bigram_lm").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expectIds = allToks.filter(_._2.size >= 2).map(_._1).toSet
    assert(rows.keySet == expectIds)
    for ((id, tk) <- allToks if tk.size >= 2) {
      val lps = tk.zip(tk.drop(1)).map { case (t1, t2) =>
        val p = LmLambda * (cb((t1, t2)).toDouble / cp(t1).toDouble) +
          (1.0 - LmLambda) * ((cu(t2) + 1).toDouble / (tu + v).toDouble)
        BigDecimal(rnd9(math.log(p))).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(rows(id)._1 == tk.size - 1, s"n_bigrams doc $id")
      assert(math.abs(rows(id)._2 - lps.sum.toDouble / (tk.size - 1)) < 1e-5,
        s"avg_logprob doc $id")
    }
  }

  test("q117 confusion counts are consistent and monotone in the threshold") {
    val gold = docs.count(_._2 == "en").toLong
    val rows = run("q117_filter_eval").collect().sortBy(_.getDouble(0))
    for (r <- rows)
      assert(r.getLong(1) + r.getLong(3) == gold, s"tp+fn at ${r.getDouble(0)}")
    val tps = rows.map(_.getLong(1))
    assert(tps.zip(tps.drop(1)).forall { case (a, b) => a >= b },
      "tp non-increasing as the threshold rises")
  }

  test("q118 shards partition the corpus into contiguous key ranges") {
    val rows = run("q118_range_shards").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum == docs.size)
    val ranges = rows.map(r => (r.getLong(3), r.getLong(4)))
    for (((_, hi), (lo2, _)) <- ranges.zip(ranges.drop(1)))
      assert(hi <= lo2, "shard key ranges are ordered and disjoint")
    // octile balance: no shard holds more than 2x its fair share
    val fair = docs.size.toDouble / SelectionQueries.NumShards
    for (r <- rows) assert(r.getLong(1) <= math.ceil(2 * fair),
      s"shard ${r.getLong(0)} balanced")
  }

  test("q246 tercile cutoffs match a brute-force ntile-with-ties-together split") {
    // independent replay: sort per-doc LM scores (6 dp keys) descending,
    // take ntile-style rank budgets k1/k2, then push boundary-straddling
    // score ties into the better bucket — the cutoff semantics the
    // percentile plan implements. Per-(bucket, lang) doc counts must match.
    val scored = run("q116_bigram_lm")
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("avg_logprob")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 1e6)))
    val n = scored.length
    assert(n >= 3, "needs a non-degenerate corpus")
    val q3 = n / 3; val r3 = n % 3
    val k1 = q3 + (if (r3 >= 1) 1 else 0)
    val k2 = k1 + q3 + (if (r3 >= 2) 1 else 0)
    val desc = scored.sortBy(-_._3)
    // ties-together: rows with k equal to the boundary value stay low
    def bucketOf(k: Long): Int =
      if (k >= desc(k1 - 1)._3) 1 else if (k >= desc(k2 - 1)._3) 2 else 3
    val expect = scored.groupBy(t => (bucketOf(t._3).toLong, t._2))
      .view.mapValues(_.length.toLong).toMap
    val got = run("q246_ccnet_buckets").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"got $got\nexpect $expect")
  }
}
