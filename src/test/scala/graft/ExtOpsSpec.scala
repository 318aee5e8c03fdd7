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
}
