package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Similarity-search operators over the `embeddings` table: brute-force
  * cosine top-k (the correctness baseline) and a random-hyperplane LSH
  * bucketed variant (the scale path — Charikar '02, public construction).
  *
  * Scale design: brute-force is a broadcast of the (tiny) query side
  * against a full scan — at 100 TB the LSH variant prunes candidates to
  * one bucket per probe before the exact re-rank; buckets are a plain
  * equi-join key so Spark shuffles once and AQE handles skew.
  */
object Similarity {

  /** Number of hyperplanes (bucket bits) for LSH. */
  val LshPlanes = 8

  /** Deterministic pseudo-random hyperplane weight for plane j, component i
    * (0-based): w = ((j*64 + i) * 2654435761) mod 2001 - 1000.
    * Integer-valued doubles → products are rounded identically on both
    * engines; the Knuth multiplicative constant gives a good spread. */
  def planeWeight(j: Int, i: Column): Column =
    (((lit(j * 64L) + i) * lit(2654435761L)) % lit(2001L) - lit(1000L)).cast("double")

  /** Signed projection of an ARRAY<DOUBLE> embedding onto plane j —
    * sequential fold, bit-identical cross-engine. */
  def planeDot(e: Column, j: Int): Column =
    aggregate(
      transform(e, (x, i) => x * planeWeight(j, i.cast("long"))),
      lit(0.0), (s, p) => s + p)
  def planeDotSql(e: String, j: Int): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform($e, " +
      s"(x, i) -> x * (((${j * 64} + (i - 1)) * 2654435761 % 2001) - 1000)::DOUBLE)), " +
      s"(p, q) -> p + q)"

  /** LSH bucket id: Σ_j 2^j · [dot_j >= 0]. */
  def lshBucket(e: Column): Column =
    (0 until LshPlanes).map { j =>
      when(planeDot(e, j) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  def lshBucketSql(e: String): String =
    (0 until LshPlanes).map { j =>
      s"(CASE WHEN ${planeDotSql(e, j)} >= 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END)"
    }.mkString("(", " + ", ")")

  /** IVF coarse quantization (the other ANN scale path): the first K
    * vectors serve as deterministic coarse centroids (a real deployment
    * trains k-means; fixed seeds keep the oracle reproducible). Returns
    * the 1-based index of the nearest centroid by cosine, ties broken by
    * centroid order. `centroids` is ARRAY<ARRAY<DOUBLE>>.
    *
    * The query vector's own norm is argmax-invariant (a positive constant
    * scale), so the score is dot/‖c_j‖ — no redundant ‖e‖ fold per
    * centroid. Zero-norm centroids → NULL score → never selected. */
  def ivfCell(e: Column, centroids: Column): Column = {
    import graft.functions.Portable.dotFold
    aggregate(
      sequence(lit(1), size(centroids)),
      struct(lit(0).cast("int").as("bi"), lit(Double.MinValue).as("bs")),
      (acc, i) => {
        val c = element_at(centroids, i)
        val sim = dotFold(e, c) / nullif(sqrt(dotFold(c, c)), lit(0.0))
        when(sim > acc("bs"), struct(i.cast("int").as("bi"), sim.as("bs")))
          .otherwise(acc)
      },
      acc => acc("bi"))
  }
  def ivfCellSql(e: String, centroids: String): String = {
    import graft.functions.Portable.dotFoldSql
    def score(c: String) =
      s"${dotFoldSql(e, c)} / nullif(sqrt(${dotFoldSql(c, c)}), 0.0)"
    s"""list_reduce(list_prepend({'bi': 0, 'bs': ${Double.MinValue}},
          list_transform(range(1, len($centroids) + 1),
            i -> {'bi': i::INT, 'bs': ${score(s"($centroids)[i]")}})),
          (acc, x) -> CASE WHEN x.bs > acc.bs THEN x ELSE acc END).bi"""
  }

  /** Brute-force cosine top-k of `queryVec` (a 1-row DataFrame with column
    * `qe`) against embeddings (column `e`), excluding `excludeId`. */
  def cosineTopK(emb: DataFrame, queryVec: DataFrame, k: Int,
                 excludeId: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sims = emb
      .join(broadcast(queryVec))  // 1-row broadcast: no shuffle of emb
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), cosine(col("e"), col("qe")).as("sim"))
    // global top-k: TakeOrderedAndProject (per-partition top-k + merge)
    sims.orderBy(col("sim").desc, col("vec_id")).limit(k)
  }
}
