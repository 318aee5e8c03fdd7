package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Deduplication operators for the LLM-data pipeline surface: exact
  * (hash-groupBy), MinHash signatures + banded candidate generation, and
  * SimHash (BASELINE.json north star; public constructions — Broder '97
  * minwise hashing, Charikar '02 simhash).
  *
  * Scale design: signatures are per-row expression chains (no shuffle);
  * candidate generation shuffles once on the band key — the standard
  * LSH band-bucket join. Bucket skew at 100 TB is handled by banding
  * (more, narrower bands) + AQE skew-join; exact dedup is a single
  * hash-aggregate on the content hash.
  */
object Dedup {

  /** Adjacent-token 2-shingles. Caller must ensure >= 2 tokens
    * (sequence(1, n-1) with n < 2 would produce a descending sequence in
    * Spark while DuckDB range(1, n) yields empty — semantics diverge). */
  def shingles2(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
  def shingles2Sql(toks: String): String =
    s"list_transform(range(1, len($toks)), i -> ($toks)[i] || ' ' || ($toks)[i+1])"

  /** Combiner for adjacent-token-hash 2-shingles: one charFold per TOKEN
    * (not per shingle string), then h_i*8191 + h_{i+1} mod FoldMod — ~4×
    * less fold work than hashing the concatenated shingle text, same
    * dedup semantics (a pairwise shingle hash). 8191 = 2^13-1, coprime
    * with FoldMod; products stay < 2^63. */
  val ShingleMix = 8191L

  /** Pairwise combine of an already-materialized token-hash array `th` —
    * THE shingle-hash formula; minhashSignatures and the generated oracle
    * both call this so the two sides cannot drift. Guarded: < 2 hashes →
    * empty (sequence(1, 0) would go DESCENDING through index 0 and throw
    * INVALID_INDEX_OF_ZERO under Spark 4's default ANSI mode). */
  def combineAdjacent(th: Column): Column =
    when(size(th) >= 2,
      transform(sequence(lit(1), size(th) - 1),
        i => (element_at(th, i) * ShingleMix + element_at(th, i + 1)) % FoldMod))
      .otherwise(array().cast("array<bigint>"))
  def combineAdjacentSql(th: String): String =
    s"list_transform(range(1, len($th)), i -> (($th)[i] * $ShingleMix + ($th)[i+1]) % $FoldMod)"

  /** Shingle hashes from raw tokens. SINGLE-SHOT convenience form — do
    * NOT use in hot paths: combineAdjacent's element_at over the inner
    * unmaterialized transform re-evaluates the whole token-hash array per
    * shingle (O(n²) folds). Hot paths materialize `th` in a layered select
    * first (see minhashSignatures, q52). */
  def shingleHashes(toks: Column): Column =
    combineAdjacent(transform(toks, t => charFold(t)))
  def shingleHashesSql(toks: String): String =
    combineAdjacentSql(s"list_transform($toks, t -> ${charFoldSql("t")})")

  /** j-th MinHash of a hash array: min over (a_j*h + b_j) mod P. */
  def minhash(hashes: Column, j: Int): Column = {
    val (a, b) = MinhashPerms(j)
    array_min(transform(hashes, h => (lit(a) * h + lit(b)) % lit(MinhashP)))
  }
  def minhashSql(hashes: String, j: Int): String = {
    val (a, b) = MinhashPerms(j)
    s"list_min(list_transform($hashes, h -> ($a*h + $b) % $MinhashP))"
  }

  /** j-th MinHash from the EXTENDED permutation set (banded LSH, q55). */
  def minhashExt(hashes: Column, j: Int): Column = {
    val (a, b) = MinhashPermsExt(j)
    array_min(transform(hashes, h => (lit(a) * h + lit(b)) % lit(MinhashP)))
  }
  def minhashExtSql(hashes: String, j: Int): String = {
    val (a, b) = MinhashPermsExt(j)
    s"list_min(list_transform($hashes, h -> ($a*h + $b) % $MinhashP))"
  }

  /** Truncated token hashes for SimHash (16-bit space). */
  def simhashTokenHashes(toks: Column): Column =
    transform(toks, t => charFold(t) % lit(65536L))
  def simhashTokenHashesSql(toks: String): String =
    s"list_transform($toks, t -> ${charFoldSql("t")} % 65536)"

  /** 16-bit SimHash from an already-MATERIALIZED hash array (pass a plain
    * column reference, not the hash expression — the 16 bit-sums each
    * reference it, and HOFs see no common-subexpression elimination):
    * bit_j = sign of Σ_t (±1 by bit j of hash(t)); assembled LSB-first.
    * Integer arithmetic only — exact. */
  def simhash16FromHashes(hs: Column): Column =
    (0 until 16).map { j =>
      val w = 1L << j
      val sj = aggregate(hs, lit(0L),
        (acc, h) => acc + (((h / lit(w)).cast("long") % 2) * 2 - 1))
      when(sj >= 0, lit(w)).otherwise(lit(0L))
    }.reduce(_ + _)
  def simhash16FromHashesSql(hs: String): String =
    (0 until 16).map { j =>
      val w = 1L << j
      val sj = s"list_reduce(list_prepend(0::BIGINT, " +
        s"list_transform($hs, h -> ((h // $w) % 2) * 2 - 1)), (a, b) -> a + b)"
      s"(CASE WHEN $sj >= 0 THEN ${w}::BIGINT ELSE 0::BIGINT END)"
    }.mkString("(", " + ", ")")

  /** Convenience single-expression form (recomputes the token hashes per
    * bit — use the FromHashes form with a layered select in hot paths). */
  def simhash16(toks: Column): Column =
    simhash16FromHashes(simhashTokenHashes(toks))

  /** The shared shingle-hash base table (doc_id, hh): tokenize + charFold
    * + adjacent-combine, docs with < 2 tokens dropped, repartitioned off
    * the single input split and MATERIALIZED (localCheckpoint) once per
    * (session, sfDir). Five operators (signatures, banded LSH, verified
    * dedup, contamination scan, duplicate clustering) derive from this
    * one table — the "write the hash table once, run N jobs against it"
    * shape an interactive 100 TB dedup session uses (cf. incremental
    * top-k reuse, EDBT '20 — PAPERS.md).
    *
    * Lifetime note: entries are evicted when the owning SparkContext ends
    * and `invalidate(session)` exists for tests that regenerate fixture
    * parquet under an unchanged path (graft.SessionCache). localCheckpoint
    * is still not fault-tolerant — right for this harness's single-JVM
    * sessions; a long-lived multi-tenant service would swap in reliable
    * checkpoints. */
  private val baseCache = new graft.SessionCache

  /** Drop this session's cached bases (fixture-rewriting tests). */
  def invalidate(s: org.apache.spark.sql.SparkSession): Unit = {
    baseCache.invalidate(s)
    candCache.invalidate(s)
  }

  def shingleBase(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    baseCache.getOrElseUpdate(s, d) {
      val toks = tokens(col("text"))
      // cpuDense (r18): the checkpointed RDD's partition count is what
      // every derived map stage (signature build, banded explode+shuffle
      // write, verify probes) inherits — under the default AQE floor the
      // repartition coalesced to 1-2 partitions (bytes-small, CPU-dense
      // shingle arrays), serializing all downstream map sides. The
      // scoped floor materializes the base at ~bytes/128k partitions.
      graft.Tables.cpuDense(s,
        graft.Tables.documents(s, d).filter(size(toks) >= 2)
          .repartition(col("doc_id"))
          .select(col("doc_id"), transform(toks, t => charFold(t)).as("th"))
          .select(col("doc_id"), combineAdjacent(col("th")).as("hh")))
        .localCheckpoint()
    }

  /** The complete verified-LSH near-dup pipeline off the shared base:
    * signatures → full-signature candidate pairs (da < db) → exact
    * 2-shingle-hash Jaccard >= 0.5. Returns (da, db, n_inter, n_union,
    * jaccard). q52 IS this table; the q65/q71 clustering derives its edge
    * list from it — one definition, no drift. Three-job shape at 100 TB:
    * write signatures, candidate join, verification join. */
  private val candCache = new graft.SessionCache

  /** The full-signature candidate-pair stage alone (da < db): the input
    * to ANY verification metric — exact Jaccard (verifiedPairs), edit
    * distance (q139), containment (q146). One join on the materialized
    * signature table; the RESULT is session-cached too, so the three
    * verifying consumers share a single candidate materialization. */
  def signatureCandidates(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    candCache.getOrElseUpdate(s, d) {
      val sig = signaturesFromBase(shingleBase(s, d)).localCheckpoint()
      val a = sig.select(col("doc_id").as("da"), col("mh0"), col("mh1"),
                         col("mh2"), col("mh3"))
      val b = sig.select(col("doc_id").as("db"), col("mh0").as("nh0"),
                         col("mh1").as("nh1"), col("mh2").as("nh2"),
                         col("mh3").as("nh3"))
      // cpuDense: the 4-key signature self-join is a compact CPU-dense
      // stage (r18; see Tables.cpuDense) — the eager checkpoint below
      // runs under the scoped lower AQE coalescing floor
      graft.Tables.cpuDense(s, a.join(b,
          col("mh0") === col("nh0") && col("mh1") === col("nh1") &&
          col("mh2") === col("nh2") && col("mh3") === col("nh3") &&
          col("da") < col("db"))
        .select(col("da"), col("db")))
        .localCheckpoint()
    }

  /** Banded b=4 × r=2 signature rows (doc_id, band, h1, h2) from a
    * (doc_id, hh) shingle-hash frame — q55's construction, shared by the
    * batch (q135) and streaming (q150) incremental dedup so the two
    * cannot drift. */
  def bandedSignature(hh: DataFrame): DataFrame = {
    val sig = hh.select((col("doc_id") +: MinhashPermsExt.indices.map(j =>
      minhashExt(col("hh"), j).as(s"mh$j"))): _*)
    val bandArr = array((0 until 4).map(bd =>
      struct(lit(bd).as("band"), col(s"mh${2 * bd}").as("h1"),
        col(s"mh${2 * bd + 1}").as("h2"))): _*)
    sig.select(col("doc_id"), explode(bandArr).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.h1").as("h1"), col("bk.h2").as("h2"))
  }

  /** Incremental-dedup verify: probe the base band INDEX with the new
    * docs' bands, exact-verify candidates at τ = 1/2, and keep each new
    * doc's best base match (ties by lowest base_id). `newBands`/`idx`
    * carry (doc_id|base_id, band, h1, h2); the set frames carry
    * (doc_id, sh) with sh sorted distinct. Shared by q135 (batch) and
    * q150 (per micro-batch). */
  def bestBaseMatches(newBands: DataFrame, newSets: DataFrame,
                      idx: DataFrame, baseSets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probe = newBands.select(col("doc_id").as("new_id"),
      col("band").as("bandn"), col("h1").as("j1"), col("h2").as("j2"))
    val cand = probe.join(idx,
        col("band") === col("bandn") && col("h1") === col("j1") &&
          col("h2") === col("j2"))
      .select(col("new_id"), col("base_id")).distinct()
    cand
      .join(newSets.select(col("doc_id").as("new_id"), col("sh").as("sha")), "new_id")
      .join(baseSets.select(col("doc_id").as("base_id"), col("sh").as("shb")), "base_id")
      .select(col("new_id"), col("base_id"),
        graft.functions.Portable.sortedIntersectCount(col("sha"), col("shb")).as("n_inter"),
        (size(col("sha")) + size(col("shb"))).cast("long").as("ss"))
      .select(col("new_id"), col("base_id"), col("n_inter"),
        (col("ss") - col("n_inter")).as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= 0.5)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("new_id"))
          .orderBy(col("jaccard").desc, col("base_id"))))
      .filter(col("rn") === 1).drop("rn")
  }

  def verifiedPairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val base = shingleBase(s, d)
    val cands = signatureCandidates(s, d)
    // verification compares BIGINT shingle-HASH sets (~8 B/element vs a
    // boxed string); sets sorted ONCE so n_inter is the codegen'd
    // allocation-free merge (SortedIntersectCountExpr), computed ONCE in
    // a layered select
    val docs = base.select(col("doc_id"),
      sort_array(array_distinct(col("hh"))).as("sh"))
    cands
      .join(docs.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
      .join(docs.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
      .select(col("da"), col("db"),
        graft.functions.Portable.sortedIntersectCount(col("sha"), col("shb")).as("n_inter"),
        (size(col("sha")) + size(col("shb"))).cast("long").as("sz_sum"))
      .select(col("da"), col("db"), col("n_inter"),
        (col("sz_sum") - col("n_inter")).as("n_union"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= 0.5)
  }

  /** DuckDB twin of [[verifiedPairs]] as a CTE chain ending in `edges`
    * (da, db, n_inter, n_union, jaccard) — shared by the q52 and q65/q71
    * oracles so the SQL cannot drift from itself either. */
  def verifiedPairsSqlCtes: String = {
    val T = tokensSql("text")
    val sigSql =
      s"""SELECT doc_id,
            ${minhashSql("hh", 0)} AS mh0,
            ${minhashSql("hh", 1)} AS mh1,
            ${minhashSql("hh", 2)} AS mh2,
            ${minhashSql("hh", 3)} AS mh3
          FROM hh_base"""
    s"""hh_base AS (
          SELECT doc_id, ${combineAdjacentSql("th")} AS hh
          FROM (SELECT doc_id,
                  list_transform(tk, t -> ${charFoldSql("t")}) AS th
                FROM (SELECT doc_id, $T AS tk FROM documents)
                WHERE len(tk) >= 2)),
        sig AS ($sigSql),
        cands AS (
          SELECT a.doc_id AS da, b.doc_id AS db
          FROM sig a JOIN sig b
            ON a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2
           AND a.mh3 = b.mh3 AND a.doc_id < b.doc_id),
        dsets AS (SELECT doc_id, list_distinct(hh) AS sh FROM hh_base),
        edges AS (
          SELECT da, db, n_inter, (sz_sum - n_inter) AS n_union,
                 CAST(n_inter AS DOUBLE) / (sz_sum - n_inter) AS jaccard
          FROM (
            SELECT da, db,
                   len(list_intersect(x.sh, y.sh))::BIGINT AS n_inter,
                   (len(x.sh) + len(y.sh))::BIGINT AS sz_sum
            FROM cands
            JOIN dsets x ON cands.da = x.doc_id
            JOIN dsets y ON cands.db = y.doc_id)
          WHERE CAST(n_inter AS DOUBLE) / (sz_sum - n_inter) >= 0.5)"""
  }

  /** MinHash signature table for a documents DataFrame:
    * (doc_id, mh0..mh3). Rows with < 2 tokens are dropped (no shingles).
    * Layered selects keep each hash array materialized once per row
    * (CollapseProject declines to inline multiply-referenced non-cheap
    * expressions, so token hashes are not recomputed per shingle). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val withTokenHashes = docs
      .filter(size(toks) >= 2)
      .select(col("doc_id"), transform(toks, t => charFold(t)).as("th"))
    val withShingles = withTokenHashes.select(
      col("doc_id"), combineAdjacent(col("th")).as("hh"))
    signaturesFromBase(withShingles)
  }

  /** Signature projection over an already-built (doc_id, hh) base —
    * lets queries reuse the session-cached [[shingleBase]]. */
  def signaturesFromBase(base: DataFrame): DataFrame =
    base.select(
      (col("doc_id") +: MinhashPerms.indices.map(j =>
        minhash(col("hh"), j).as(s"mh$j"))): _*)
}
