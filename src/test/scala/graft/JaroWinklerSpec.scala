package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable.jaroWinkler
import graft.functions.JaroWinklerExpr
import org.apache.spark.unsafe.types.UTF8String

/** [[JaroWinklerExpr]] kernel contract. Golden values were produced by
  * the ORACLE engine itself (`jaro_winkler_similarity`, probed while
  * fixing the semantics), so these pins hold the cross-engine agreement
  * the q176/q177 hash-match rests on: byte-based comparison, integer
  * floor on the transposition count, and the 0.7 bonus gate. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match the oracle engine") {
    val golden = Seq(
      ("martha", "marhta", 0.9611111111111111),   // classic, 1 transposition
      ("dixon", "dicksonx", 0.8133333333333332),  // prefix bonus of 2
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
      ("dwayne", "duane", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),     // jaro > 0.7 but prefix 0
      ("arnab", "aranb", 0.9466666666666665),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("abc", "", 0.0), ("", "", 0.0),
      ("ab", "ba", 0.0),                          // window 0: no matches
      ("aX", "aY", 0.6666666666666666),           // jaro < 0.7: no bonus
      ("abcXY", "abcZWV", 0.79),                  // jaro = 0.7 edge: bonus applies
      // floor-transposition cases where classic half-transposition differs
      ("cacabca", "abccbcbc", 0.7130952380952381),
      ("ddcbb", "dbdacddd", 0.6833333333333332),
      ("cdcdb", "ccbdcb", 0.765), // jaro 0.73889 + prefix-1 bonus
      // bytes, not code points: 'é' is two UTF-8 bytes
      ("éclair", "eclair", 0.8492063492063492))
    for ((a, b, want) <- golden)
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b): ${jw(a, b)} != $want")
  }

  test("symmetric, bounded, and exact on equality") {
    val words = Seq("", "a", "ab", "abc", "abcd", "dcba", "aabbcc",
      "small ring", "small rng", "red widget", "red widgett")
    for (a <- words; b <- words) {
      val f = jw(a, b); val r = jw(b, a)
      assert(f == r, s"asymmetric on ($a, $b): $f vs $r")
      assert(f >= 0.0 && f <= 1.0)
      if (a == b && a.nonEmpty) assert(f == 1.0)
    }
  }

  test("codegen and interpreted paths agree through the Column API") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("cacabca", "abccbcbc"), ("", ""), ("x", "x"))
      .toDF("a", "b")
      .select(col("a"), col("b"), jaroWinkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    // SQL face registered by GraftExtensions
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").head.getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
  }
}
