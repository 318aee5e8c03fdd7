package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic primitives.
  *
  * Every helper has a Column form (the Spark plan) and a `...Sql` form (the
  * DuckDB oracle dialect) generated from the same constants, so the Verify
  * oracle cannot drift from the Spark implementation.
  *
  * Determinism rules (BASELINE hash-match):
  *  - integer arithmetic only inside hashes (exact, order-fixed);
  *  - double folds are sequential left folds with an explicit 0 seed on BOTH
  *    engines (Spark `aggregate` HOF ≡ DuckDB `list_reduce(list_prepend(0,…))`)
  *    so float summation order is identical bit-for-bit;
  *  - no engine-native hash functions (Spark murmur3 ≠ DuckDB hash).
  *
  * All helpers are built-in higher-order functions — no UDFs, no
  * serialization boundary; Catalyst sees the whole expression tree
  * (SURVEY.md §7 "custom work deliberately minimal").
  */
object Portable {

  /** Modulus for the character fold: a prime comfortably below 2^31 so
    * `acc*31 + c` never overflows a long. */
  val FoldMod = 1000003L

  /** MinHash permutation constants (a_j, b_j) and the Mersenne prime modulus:
    * h_j(x) = (a_j * x + b_j) mod P. Public textbook construction
    * (Broder's minwise hashing). */
  val MinhashPerms: Seq[(Long, Long)] = Seq(
    (1299709L, 104729L), (1299721L, 104743L),
    (1299743L, 104759L), (1299763L, 104773L))
  /** Extended permutation set for banded LSH (b bands × r rows needs b·r
    * independent permutations; q55 uses b=4, r=2 → 8). The first 4 are the
    * signature-table perms so the two constructions share hashes. */
  val MinhashPermsExt: Seq[(Long, Long)] = MinhashPerms ++ Seq(
    (1299791L, 104779L), (1299811L, 104789L),
    (1299817L, 104801L), (1299821L, 104803L))
  val MinhashP = 2147483647L

  // ---- tokenization -------------------------------------------------------

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"

  // ---- portable string hash ----------------------------------------------

  /** Deterministic polynomial rolling hash over characters:
    * h = fold(0, (acc, c) => (acc*31 + ascii(c)) % FoldMod).
    * Engine-portable replacement for murmur3 in dedup/minhash pipelines.
    * Runs as the codegen'd CharFoldExpr; [[charFoldHof]] is the built-in
    * HOF chain kept for cross-checking the two implementations. */
  def charFold(s: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      CharFoldExpr(org.apache.spark.sql.graftbridge.Bridge.toExpression(s)))

  /** Reference HOF implementation of [[charFold]] (interpreted lambdas —
    * value-identical, slower; the cross-check target). */
  def charFoldHof(s: Column): Column =
    aggregate(
      transform(filter(split(s, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % FoldMod)
  def charFoldSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(regexp_split_to_array($e, ''), c -> ascii(c)::BIGINT)), " +
      s"(a, b) -> (a*31 + b) % $FoldMod)"

  // ---- sequential double folds -------------------------------------------

  /** Dot product of two ARRAY<DOUBLE> columns as a sequential left fold —
    * bit-identical across engines (same products, same summation order).
    * Runs as the codegen'd DotFoldExpr (one JIT'd loop per pair);
    * [[dotFoldHof]] is the built-in HOF chain kept for cross-checking. */
  def dotFold(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      DotFoldExpr(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(a),
        org.apache.spark.sql.graftbridge.Bridge.toExpression(b)))

  /** Reference HOF implementation of [[dotFold]] (interpreted lambdas —
    * value-identical, slower; the cross-check target). */
  def dotFoldHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, p) => s + p)
  def dotFoldSql(a: String, b: String): String =
    // NB: unique lambda variable names — generated SQL can nest inside
    // outer lambdas (e.g. a fold over centroids), and DuckDB resolves a
    // shadowed `i` to the INNER binding, silently breaking the outer index.
    s"list_reduce(list_prepend(0::DOUBLE, " +
      s"list_transform($a, (dfx, dfi) -> dfx * ($b)[dfi])), (dfp, dfq) -> dfp + dfq)"

  /** Sum of an ARRAY<BIGINT> column, sequential with 0 seed. */
  def sumFold(a: Column): Column =
    aggregate(a, lit(0L), (s, x) => s + x)
  def sumFoldSql(a: String): String =
    s"list_reduce(list_prepend(0::BIGINT, $a), (p, q) -> p + q)"

  /** Cosine similarity over ARRAY<DOUBLE>: dot / (sqrt(|a|²) * sqrt(|b|²)).
    * sqrt is IEEE-exact, so this inherits dotFold's bit-stability.
    * Zero-norm (or empty) vectors → NULL via nullif — Spark 4's default
    * ANSI mode would otherwise raise DIVIDE_BY_ZERO while DuckDB returns
    * NaN; NULL is the one value both engines agree on. */
  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / nullif(sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)), lit(0.0))
  def cosineSql(a: String, b: String): String =
    s"${dotFoldSql(a, b)} / nullif(sqrt(${dotFoldSql(a, a)}) * sqrt(${dotFoldSql(b, b)}), 0.0)"

  /** float32 embedding column → ARRAY<DOUBLE> (exact widening on both
    * engines). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))
  def asDoubleSql(e: String): String = s"($e)::DOUBLE[]"

  /** |A ∩ B| of two SORTED, duplicate-free ARRAY<BIGINT> columns — the
    * codegen'd merge-pass [[SortedIntersectCountExpr]] (no per-pair hash
    * set or output array, unlike `size(array_intersect(a, b))`). The SQL
    * twin is plain `len(list_intersect(...))`: sortedness doesn't change
    * the VALUE, only the Spark-side cost. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      SortedIntersectCountExpr(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(a),
        org.apache.spark.sql.graftbridge.Bridge.toExpression(b)))
  def sortedIntersectCountSql(a: String, b: String): String =
    s"len(list_intersect($a, $b))::BIGINT"

  /** Threshold-bounded edit distance ([[EditWithinExpr]]): the exact
    * Levenshtein distance when lev·den ≤ num·max(len), else -1. The SQL
    * twin computes the full distance and lets the caller's threshold
    * filter discard what the Spark side never computed — same accepted
    * relation, since distances ≤ threshold are exact. */
  def editWithin(a: Column, b: Column, num: Long, den: Long): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      EditWithinExpr(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(a),
        org.apache.spark.sql.graftbridge.Bridge.toExpression(b),
        num, den))

  /** Jaro-Winkler similarity ([[JaroWinklerExpr]]), semantics fuzzed to
    * 1e-12 against the SQL twin `jaro_winkler_similarity` — byte-based,
    * floor-transposition, 0.7 bonus threshold. Callers round the score
    * before hashing (float-division result; op order may differ). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.toColumn(
      JaroWinklerExpr(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(a),
        org.apache.spark.sql.graftbridge.Bridge.toExpression(b)))
  def jaroWinklerSql(a: String, b: String): String =
    s"jaro_winkler_similarity($a, $b)"
}
