package graft

import org.apache.spark.sql.functions._
import graft.queries.RetrievalQueries._

/** Semantic invariants for the round-6 retrieval/structure operators
  * (q126–q131): brute-force reimplementations on collected sf0.001 data
  * — exact equality where the operator is exact (set-sim join, SCD2,
  * triangles, postings, BM25 — all integer or same-JVM double math) —
  * plus the containment/ordering properties each operator exists to
  * provide. */
class RetrievalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def foldHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  /** Distinct 2-token shingle-hash sets per doc — the shared base's
    * definition, reimplemented independently. */
  private def shingleSets: Map[Long, Set[Long]] =
    Tables.documents(spark, sf).select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      if (toks.length < 2) None
      else {
        val th = toks.map(foldHash)
        val sh = th.sliding(2).map { case Array(a, b) =>
          (a * 8191L + b) % 1000003L
        }.toSet
        Some(r.getLong(0) -> sh)
      }
    }.toMap

  test("q126 equals the brute-force all-pairs exact-Jaccard relation") {
    val sets = shingleSets
    val ids = sets.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size.toLong
      union = a.size + b.size - inter
      if inter * TauDen >= union * TauNum
    } yield (ids(i), ids(j), inter, union)).toSet
    val got = run("q126_setsim_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("q126 contains every MinHash-verified pair (q52 has no pairs q126 lacks)") {
    val exact = run("q126_setsim_join").select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("q52_minhash_verified").select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"q52 pairs missing from q126: ${(lsh -- exact).take(3)}")
  }

  test("q127 SCD2 intervals match a sequential changelog replay") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val brute = evs.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val changes = ordered.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, _, et, us)) =>
          if (acc.nonEmpty && acc.last._1 == et) acc else acc :+ (et, us)
      }
      changes.zipWithIndex.map { case ((et, us), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
        (uid, (i + 1).toLong, et, us, to, to.isEmpty)
      }
    }.toSet
    val got = run("q127_scd2").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))
    }.toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(2)} extra=${(got -- brute).take(2)}")
  }

  test("q127 intervals per user are contiguous, non-overlapping, one current") {
    val rows = run("q127_scd2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    for ((_, perUser) <- rows.groupBy(_._1)) {
      val byV = perUser.sortBy(_._2)
      assert(byV.map(_._2).toSeq == (1L to byV.length).toSeq)
      for (Array(a, b) <- byV.sliding(2).map(_.toArray).toSeq if byV.length > 1)
        assert(a._4.contains(b._3), s"interval gap between v${a._2} and v${b._2}")
      assert(byV.count(_._4.isEmpty) == 1)
    }
  }

  test("q128 triangle count matches brute-force triple enumeration") {
    val items = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    for (u <- nodes; v <- adj(u) if v > u; w <- adj(u) & adj(v) if w > v)
      tri += 1
    val row = run("q128_triangles").collect().head
    assert(row.getLong(0) == nodes.length, "n_nodes")
    assert(row.getLong(1) == edges.size, "n_edges")
    assert(row.getLong(2) ==
      adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum, "n_wedges")
    assert(row.getLong(3) == tri, s"n_triangles got ${row.getLong(3)} want $tri")
  }

  test("q129 posting heads are the df-top tokens with sorted bounded doc lists") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).map(foldHash).distinct
          .map(h => (h, r.getLong(0)))
      }
    val byTok = docs.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong,
        rs.map(_._2).sorted.take(PostingHead).mkString(","))).toMap
    val expect = byTok.toSeq
      .sortBy { case (h, (df, _)) => (-df, h) }.take(PostingTop)
      .map { case (h, (df, head)) => (h, df, head) }.toSet
    val got = run("q129_postings").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expect)
  }

  test("q130 BM25 matches a same-JVM scalar reimplementation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).map(foldHash)))
    val nd = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nd.toDouble
    val dfm = docs.flatMap { case (_, th) => th.distinct }.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val qsel = docs.find(_._1 == 0L).get._2.distinct
      .map(h => (h, dfm(h))).sortBy { case (h, df) => (-df, h) }
      .take(Bm25QueryTerms)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val brute = docs.filter(_._1 != 0L).flatMap { case (id, th) =>
      val terms = qsel.flatMap { case (h, df) =>
        val tf = th.count(_ == h).toLong
        if (tf == 0) None
        else {
          val idf = r9(math.log((nd.toDouble - df.toDouble + 0.5) /
            (df.toDouble + 0.5) + 1.0)).toDouble
          val tfp = (tf.toDouble * (Bm25K1 + 1.0)) /
            (tf.toDouble + Bm25K1 * ((1.0 - Bm25B) + Bm25B * th.length.toDouble / avgdl))
          Some(r9(idf * tfp))
        }
      }
      if (terms.isEmpty) None
      else Some((id, terms.length.toLong,
        BigDecimal(terms.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(Bm25Top).toSet
    val got = run("q130_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("q135 incremental dedup matches a banded-index replay (best match per new doc)") {
    import graft.functions.Portable.{MinhashPermsExt, MinhashP}
    // raw (non-distinct) shingle-hash LISTS — signatures hash the list
    val lists = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        if (toks.length < 2) None
        else Some(r.getLong(0) -> toks.map(foldHash).sliding(2).map {
          case Array(a, b) => (a * 8191L + b) % 1000003L
        }.toVector)
      }.toMap
    def mh(hh: Vector[Long], j: Int): Long = {
      val (a, b) = MinhashPermsExt(j)
      hh.map(h => (a * h + b) % MinhashP).min
    }
    val bands = lists.map { case (id, hh) =>
      id -> (0 until 4).map(bd => (bd, mh(hh, 2 * bd), mh(hh, 2 * bd + 1))).toSet
    }
    val (newIds, baseIds) = lists.keys.toSeq.sorted.partition(_ % 5 == 4)
    val brute = newIds.flatMap { nid =>
      val cands = baseIds.filter(bid => (bands(nid) & bands(bid)).nonEmpty)
      val verified = cands.flatMap { bid =>
        val (sa, sb) = (lists(nid).toSet, lists(bid).toSet)
        val inter = (sa & sb).size.toLong
        val union = sa.size + sb.size - inter
        val j = inter.toDouble / union
        if (j >= 0.5) Some((bid, inter, union, j)) else None
      }
      if (verified.isEmpty) None
      else {
        val best = verified.minBy { case (bid, _, _, j) => (-j, bid) }
        Some((nid, best._1, best._2, best._3, best._4))
      }
    }.toSet
    val got = run("q135_incremental_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(2)} extra=${(got -- brute).take(2)}")
  }

  test("q131 truncated-cosine recalls are the brute-force set overlaps") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val qe = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double], k: Int) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until k) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def top(k: Int) = vecs.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(e, qe, k)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val full = top(qe.length)
    val row = run("q131_matryoshka").collect().head
    for ((k, i) <- MatDims.zipWithIndex) {
      val want = (top(k) & full).size.toLong
      assert(row.getLong(2 * i) == want, s"n_common_$k")
      assert(row.getDouble(2 * i + 1) == want.toDouble / 10.0, s"recall_$k")
    }
  }
}
