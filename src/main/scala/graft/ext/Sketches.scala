package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Cross-engine deterministic sketches (Flajolet et al. '07 HyperLogLog,
  * public construction). Unlike engine-native approx_count_distinct
  * (whose hash and merge order differ per engine), every step here is
  * generated from shared constants on BOTH the Spark and DuckDB sides —
  * the ESTIMATE itself is oracle-checkable, not just the exact count.
  *
  * Scale design: the register table is a single hash-aggregate (bucket →
  * max rho) — the sketch merge is a 64-row reduction regardless of input
  * size, the same shape a 100 TB partial-sketch merge has.
  */
object Sketches {

  /** Register count m = 2^6. */
  val HllBuckets = 64
  /** Max rho: the combined hash has < 40 meaningful bits (two charFolds
    * in base FoldMod), so trailing-zero runs beyond 35 cannot occur. */
  val HllMaxRho = 35

  /** ~40-bit portable hash: two independent char folds combined in base
    * FoldMod. The suffix salt decorrelates the second fold. */
  def hllHash(s: Column): Column =
    charFold(s) * lit(FoldMod) + charFold(concat(s, lit("#")))
  def hllHashSql(e: String): String =
    s"${charFoldSql(e)} * $FoldMod + ${charFoldSql(s"($e || '#')")}"

  /** LCG scrambling step mod the Mersenne prime — the polynomial fold's
    * trailing bits are NOT uniform (rho would read runs of structure, not
    * randomness; measured 0.88 relative error unmixed vs 0.02–0.17
    * mixed). Products stay < 2^62: no overflow divergence between
    * engines (DuckDB errors on BIGINT overflow, Spark wraps). */
  val HllP = 2147483647L
  val HllA = 1103515245L
  val HllB = 12345L
  def hllMix(h: Column): Column = ((h % HllP) * HllA + HllB) % HllP
  def hllMixSql(h: String): String = s"((($h) % $HllP) * $HllA + $HllB) % $HllP"

  /** rho(w): 1-based position of the least-significant set bit of w,
    * HllMaxRho when w = 0 — a generated CASE chain (identical integer
    * math on both engines; no engine bit intrinsics). */
  def hllRho(w: Column): Column =
    (1 to HllMaxRho).foldRight(lit(HllMaxRho): Column) { (j, els) =>
      when((w.divide(lit(1L << (j - 1)))).cast("long") % 2 === 1, lit(j))
        .otherwise(els)
    }
  def hllRhoSql(w: String): String = {
    val cases = (1 to HllMaxRho).map { j =>
      s"WHEN (($w) // ${1L << (j - 1)}) % 2 = 1 THEN $j"
    }
    s"CASE ${cases.mkString(" ")} ELSE $HllMaxRho END"
  }

  /** The (bucket → max rho) register table for a key column — the one
    * hash-aggregate every HLL consumer (q82 estimate, q86 merge, the
    * streaming maintainer) derives from. Layered selects: each hash
    * column materialized once. */
  def hllRegisters(src: DataFrame, key: Column): DataFrame =
    src.select(key.cast("string").as("k"))
      .select(hllHash(col("k")).as("h0"))
      .select(hllMix(col("h0")).as("h1"))
      .select((col("h1") % HllBuckets).as("bucket"), hllMix(col("h1")).as("w"))
      .select(col("bucket"), hllRho(col("w")).as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).cast("long").as("mx"))

  /** Driver-side estimate from a register map (the registers ARE
    * driver-size — 64 entries no matter the input): harmonic mean with
    * the standard small-range linear-counting correction, mirroring the
    * q82 column expression. */
  def estimateFromRegisters(regs: Map[Long, Long]): Double = {
    val m = HllBuckets
    val nEmpty = m - regs.size
    val harmonic = regs.values.foldLeft(0.0)((a, mx) => a + 1.0 / (1L << mx)) +
      nEmpty.toDouble
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * (m * m)
    val eraw = alphaM2 / harmonic
    if (eraw <= 2.5 * m && nEmpty > 0) m.toDouble * math.log(m.toDouble / nEmpty)
    else eraw
  }

  /** Driver-side estimate from a dense BYTE register array of any
    * width (the manifest-index form [[graft.sink.VersionedTable
    * .mergedHllRegisters]] hands over) — the same harmonic-mean +
    * small-range-correction math as [[estimateFromRegisters]],
    * generalized over m so the two estimators cannot drift. */
  def estimateFromByteRegisters(u: Array[Byte]): Double = {
    val m = u.length.toDouble
    val alpha =
      if (u.length <= 16) 0.673
      else if (u.length <= 32) 0.697
      else if (u.length <= 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val harmonic = u.foldLeft(0.0)((a, r) => a + 1.0 / (1L << (r & 0xff)))
    val eraw = alpha * m * m / harmonic
    val zeros = u.count(_ == 0)
    if (eraw <= 2.5 * m && zeros > 0) m * math.log(m / zeros)
    else eraw
  }

  /** alpha_m * m^2 for m = 64, computed (not hard-coded) so both engines
    * evaluate the same expression tree. */
  def hllAlphaM2: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllBuckets.toDouble)) *
      lit((HllBuckets * HllBuckets).toDouble)
  def hllAlphaM2Sql: String =
    s"0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / $HllBuckets.0) * ${HllBuckets * HllBuckets}.0"
}
