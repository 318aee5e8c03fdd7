package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Golden-value specs for the portable primitives and LLM-data operators.
  * The charFold golden value was computed independently in DuckDB
  * (list_reduce over regexp_split_to_array) — cross-engine agreement is
  * the whole point of these primitives. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  test("charFold matches the independently computed DuckDB value") {
    val got = Seq("spark").toDF("s")
      .select(Portable.charFold(col("s")).as("h")).head.getLong(0)
    assert(got == 638038L) // duckdb: list_reduce(ascii chars, (a,b)->(a*31+b)%1000003)
  }

  test("codegen charFold equals the HOF chain on varied strings") {
    val samples = Seq("", "a", "spark", "the quick brown fox", "Hello, World!",
      "punct!@# $%^", "1234567890", "mixedCASE text", "  spaces  ")
    val df = samples.toDF("s")
    val rows = df.select(
      Portable.charFold(col("s")).as("fast"),
      Portable.charFoldHof(col("s")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"diverged: $r"))
  }

  test("charFold of empty string is the fold seed (0)") {
    val got = Seq("").toDF("s")
      .select(Portable.charFold(col("s")).as("h")).head.getLong(0)
    assert(got == 0L)
  }

  test("dotFold is an exact sequential fold") {
    val got = Seq((Seq(1.5, 2.5), Seq(3.25, 4.5))).toDF("a", "b")
      .select(Portable.dotFold(col("a"), col("b")).as("d")).head.getDouble(0)
    assert(got == 16.125)
  }

  test("codegen dotFold equals the HOF chain bit-for-bit, incl. null cases") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (Seq.fill(17)(rnd.nextDouble() * 2 - 1), Seq.fill(17)(rnd.nextDouble() * 2 - 1))
    } :+ ((Seq(1.0, 2.0), Seq(3.0)))  // length mismatch → NULL both paths
    val df = rows.toDF("a", "b")
    val out = df.select(
      Portable.dotFold(col("a"), col("b")).as("fast"),
      Portable.dotFoldHof(col("a"), col("b")).as("ref")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
               java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bits differ: $r")
    }
  }

  test("cosine of a vector with itself is exactly 1.0") {
    val got = Seq((Seq(0.1, -0.2, 0.3), Seq(0.1, -0.2, 0.3))).toDF("a", "b")
      .select(Portable.cosine(col("a"), col("b")).as("c")).head.getDouble(0)
    assert(got == 1.0)
  }

  test("2-shingles of 'a b c' are ['a b', 'b c']") {
    val got = Seq("a b c").toDF("text")
      .select(Dedup.shingles2(Portable.tokens(col("text"))).as("sh"))
      .head.getSeq[String](0)
    assert(got == Seq("a b", "b c"))
  }

  test("minhash signature is permutation-deterministic and order-insensitive on duplicate docs") {
    val sig = Dedup.minhashSignatures(
      Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"))
        .toDF("doc_id", "text"))
    val rows = sig.orderBy("doc_id").collect()
    assert(rows.length == 2)
    (1 to 4).foreach(i => assert(rows(0).getLong(i) == rows(1).getLong(i)))
  }

  test("simhash16 is within 16 bits and identical for identical docs") {
    val df = Seq((1L, "spark scala data"), (2L, "spark scala data")).toDF("doc_id", "text")
      .select(Dedup.simhash16(Portable.tokens(col("text"))).as("sh"))
    val vs = df.collect().map(_.getLong(0))
    assert(vs(0) == vs(1) && vs(0) >= 0 && vs(0) < 65536)
  }

  test("langPick prefers earlier profile on tie and returns und on no hits") {
    val toks = Portable.tokens(col("text"))
    val out = Seq("the der zzz", "zzz qqq").toDF("text")
      .select(TextAnalysis.langPick(TextAnalysis.langScores(toks)).as("p"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "und")) // 'the'(en) ties 'der'(de) → en wins
  }

  test("lshBucket is stable and within 8 bits") {
    val emb = Seq((0L, Seq(0.5, -0.25, 0.125)), (1L, Seq(0.5, -0.25, 0.125)))
      .toDF("vec_id", "e")
    val bs = emb.select(Similarity.lshBucket(col("e")).as("b"))
      .collect().map(_.getLong(0))
    assert(bs(0) == bs(1) && bs(0) >= 0 && bs(0) < 256)
  }

  test("banded LSH (b=4,r=2) candidates are a superset of the single-band join, recall >= it") {
    val toks = Portable.tokens(col("text"))
    val base = Tables.documents(spark, sf).filter(size(toks) >= 2)
      .select(col("doc_id"), transform(toks, t => Portable.charFold(t)).as("th"))
      .select(col("doc_id"), Dedup.combineAdjacent(col("th")).as("hh"))
      .localCheckpoint()
    // ground truth: all pairs with exact 2-shingle Jaccard >= 0.5
    val docs = base.select(col("doc_id"), array_distinct(col("hh")).as("sh"))
    val truth = docs.select(col("doc_id").as("da"), col("sh").as("sha"))
      .crossJoin(docs.select(col("doc_id").as("db"), col("sh").as("shb")))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("sha"), col("shb"))).cast("double").as("ni"),
        (size(col("sha")) + size(col("shb"))).cast("double").as("ss"))
      .filter(col("ni") / (col("ss") - col("ni")) >= 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // single-band (q31 shape): all 4 signature minhashes equal
    val sig4 = base.select((col("doc_id") +: (0 until 4).map(j =>
      Dedup.minhash(col("hh"), j).as(s"mh$j"))): _*)
    val single = sig4.select(col("doc_id").as("da"), col("mh0"), col("mh1"), col("mh2"), col("mh3"))
      .join(sig4.select(col("doc_id").as("db"), col("mh0").as("n0"), col("mh1").as("n1"),
                        col("mh2").as("n2"), col("mh3").as("n3")),
        col("mh0") === col("n0") && col("mh1") === col("n1") &&
        col("mh2") === col("n2") && col("mh3") === col("n3") && col("da") < col("db"))
      .select("da", "db").as[(Long, Long)].collect().toSet
    // banded: any of the 4 (r=2) bands agrees
    val sig8 = base.select((col("doc_id") +: (0 until 8).map(j =>
      Dedup.minhashExt(col("hh"), j).as(s"mh$j"))): _*)
    val bandArr = array((0 until 4).map(bd =>
      struct(lit(bd).as("band"), col(s"mh${2 * bd}").as("h1"),
             col(s"mh${2 * bd + 1}").as("h2"))): _*)
    val bands = sig8.select(col("doc_id"), explode(bandArr).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.h1").as("h1"), col("bk.h2").as("h2"))
    val banded = bands.select(col("doc_id").as("da"), col("band"), col("h1"), col("h2"))
      .join(bands.select(col("doc_id").as("db"), col("band").as("bandb"),
                         col("h1").as("j1"), col("h2").as("j2")),
        col("band") === col("bandb") && col("h1") === col("j1") &&
        col("h2") === col("j2") && col("da") < col("db"))
      .select("da", "db").distinct().as[(Long, Long)].collect().toSet
    assert(single.subsetOf(banded))          // OR-construction only admits more
    assert(truth.nonEmpty)
    val recallSingle = (truth & single).size.toDouble / truth.size
    val recallBanded = (truth & banded).size.toDouble / truth.size
    assert(recallBanded >= recallSingle)
  }
}
