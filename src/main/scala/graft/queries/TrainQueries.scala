package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Sketches, TextAnalysis}

/** Round-4 training-data pipeline operators: frequency sketching,
  * corpus mixing, passage chunking, event-gap analysis, embedding
  * compression, and bloom-filter join pruning. Every query follows the
  * shared-constants pattern (functions/Portable.scala): the Spark Column
  * chain and the DuckDB oracle SQL are generated from the same Scala
  * constants, so the correctness gate checks the ACTUAL sketch/selection
  * values cross-engine, not just row counts.
  *
  * Scale notes per operator are on each entry; the common theme is that
  * every sketch/selection is a single hash-aggregate or a per-row scalar
  * chain — nothing quadratic, nothing driver-side.
  */
object TrainQueries {

  /** Count-min sketch geometry: depth 3 (reuses the first three MinHash
    * permutations as the row hash family), width 256. */
  private val CmsDepth = 3
  private val CmsWidth = 256L
  private def cmsBucket(h: Column, j: Int): Column = {
    val (a, b) = MinhashPerms(j)
    ((h * a + b) % MinhashP) % CmsWidth
  }
  private def cmsBucketSql(h: String, j: Int): String = {
    val (a, b) = MinhashPerms(j)
    s"((($h) * $a + $b) % $MinhashP) % $CmsWidth"
  }

  /** Random-projection sign bits (embedding SimHash): 16 pseudo-random
    * 64-dim direction vectors with components in [-1, 1], generated from
    * the shared LCG so both engines hold the same literals. Components
    * are emitted as INTEGER thousandths and divided by 1000.0 in-engine —
    * no decimal-literal formatting drift between Scala and SQL. */
  private val RpBits = 16
  private val RpDim = 64
  private[queries] val rpInts: IndexedSeq[IndexedSeq[Long]] =
    (0 until RpBits).map { j =>
      (0 until RpDim).map { i =>
        ((i * RpBits + j).toLong * Sketches.HllA + Sketches.HllB) % Sketches.HllP % 2001L - 1000L
      }
    }

  /** Mixture weights in thousandths (en-heavy mix, sums to 700 — a 30%
    * global downsample while rebalancing strata). */
  private val MixWeights = Seq("en" -> 300L, "de" -> 100L, "es" -> 100L,
    "fr" -> 100L, "zh" -> 100L)

  /** Bloom geometry: 65536 bits, 3 hashes (first three MinHash perms). */
  private val BloomBits = 65536L
  private val BloomCut = 480000.0
  private def bloomPos(k: Column, j: Int): Column = {
    val (a, b) = MinhashPerms(j)
    ((k * a + b) % MinhashP) % BloomBits
  }
  private def bloomPosSql(k: String, j: Int): String = {
    val (a, b) = MinhashPerms(j)
    s"((($k) * $a + $b) % $MinhashP) % $BloomBits"
  }

  /** Chunking geometry: 32-token windows, stride 24 (8-token overlap). */
  private val ChunkSize = 32L
  private val ChunkStride = 24L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Count-min sketch over the corpus term stream + point-query accuracy
    // check on the top-20 exact terms (Cormode & Muthukrishnan '05). The
    // register table is ONE hash-aggregate of (row, bucket) — 768 cells
    // regardless of corpus size, the mergeable-partial shape a 100 TB
    // frequency sketch has. The top-20 probe selects via TakeOrdered, so
    // the vocabulary-sized term table never funnels into one partition.
    "q87_cms_topk" -> ((s, d) => {
      val hashed = documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .select(col("term"), charFold(col("term")).as("h"))
      val regs = hashed
        .select(posexplode(array((0 until CmsDepth).map(j => cmsBucket(col("h"), j)): _*))
          .as(Seq("r", "bkt")))
        .groupBy("r", "bkt").agg(count(lit(1)).as("cnt"))
      // top-20 via TakeOrdered (per-partition heads + driver merge) — no
      // single-partition window over the vocabulary-sized term table
      val probes = hashed.groupBy("term")
        .agg(count(lit(1)).as("exact_n"), min(col("h")).as("h"))
        .orderBy(col("exact_n").desc, col("term")).limit(20)
      val est = (0 until CmsDepth).foldLeft(probes) { (df, j) =>
        df.join(
          broadcast(regs.filter(col("r") === j)
            .select(col("bkt").as(s"b$j"), col("cnt").as(s"c$j"))),
          cmsBucket(col("h"), j) === col(s"b$j"))
      }
      est.select(col("term"), col("exact_n"),
        least((0 until CmsDepth).map(j => col(s"c$j")): _*).as("est_n"))
    }),

    // Deterministic mixture sampling: rank documents inside each language
    // stratum by content hash and keep rank <= quota, where quota =
    // weight_l * |corpus| / 1000. The standard "hit a target language mix"
    // selection for a training corpus — reproducible (hash order, not
    // random), and one shuffle (the per-stratum window). At 100 TB the
    // lang partition is coarse; the same rank key supports sub-bucketing
    // (lang, hash div 2^k) when a stratum outgrows one task.
    "q88_mixture_sample" -> ((s, d) => {
      val wm = MixWeights.tail.foldLeft(
        when(col("lang") === MixWeights.head._1, lit(MixWeights.head._2))) {
        case (c, (l, w)) => c.when(col("lang") === l, lit(w))
      }.otherwise(lit(0L))
      val n = documents(s, d).groupBy().agg(count(lit(1)).as("ntot"))
      documents(s, d)
        .select(col("doc_id"), col("lang"), charFold(col("text")).as("hk"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))).cast("long"))
        .crossJoin(broadcast(n))
        .withColumn("wm", wm)
        .filter(col("rk") <= expr("(ntot * wm) div 1000"))
        .select(col("doc_id"), col("lang"), col("rk"))
    }),

    // Passage chunking: split each document into 32-token windows with
    // stride 24 (8-token overlap) and fingerprint each chunk — the
    // context-window packing step of a pretraining pipeline. Pure per-row
    // generate + project (explode of a computed range): no shuffle, no
    // state; chunk count is derived with integer arithmetic only so both
    // engines agree exactly.
    "q89_doc_chunks" -> ((s, d) => {
      val toks = tokens(col("text"))
      documents(s, d)
        .select(col("doc_id"), transform(toks, t => charFold(t)).as("th"))
        .select(col("doc_id"), col("th"), size(col("th")).cast("long").as("n"))
        .select(col("doc_id"), col("th"), col("n"),
          explode(sequence(lit(0L),
            when(col("n") <= ChunkSize, lit(0L))
              .otherwise(expr(s"(n - ${ChunkSize - ChunkStride + 1}) div $ChunkStride")))).as("ci"))
        .select(col("doc_id"), col("ci").as("chunk_id"),
          (col("ci") * ChunkStride).as("start_tok"),
          least(lit(ChunkSize), col("n") - col("ci") * ChunkStride).as("n_tok"),
          aggregate(
            slice(col("th"), (col("ci") * ChunkStride + 1).cast("int"), lit(ChunkSize.toInt)),
            lit(0L), (a, x) => (a * 31 + x) % FoldMod).as("chash"))
    }),

    // Inter-event gap profile per user: lead() over (user, ts, event_id),
    // gaps aggregated to count/sum/max milliseconds. Session-analysis
    // primitive (complement of q63's gap-threshold sessionize). One
    // shuffle on user_id shared by the window and the aggregate. Integer
    // MICROS end-to-end (eventsMicros' tus) — micro precision is what
    // DuckDB surfaces from the same file in either testdata generation.
    "q90_event_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      graft.Tables.eventsMicros(s, d) // integer path: no timestamp object
        .select(col("user_id"), col("event_id"), col("tus"))
        .withColumn("nxt", lead(col("tus"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("user_id"), expr("(nxt - tus) div 1000").as("gap_ms"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap_ms")).as("sum_gap_ms"),
          max(col("gap_ms")).as("max_gap_ms"))
    }),

    // Embedding SimHash: 16 sign bits of deterministic random projections
    // packed into a BIGINT — the LSH key family for Hamming-space near-dup
    // (Charikar '02), computed as a per-row scalar chain (zero shuffle).
    // The bucketed-join consumer shape is q36; this is the signature
    // builder at its most scale-friendly: scan → project.
    "q91_embed_signs" -> ((s, d) => {
      def dotJ(j: Int): Column = aggregate(
        zip_with(col("e"), typedLit(rpInts(j)), (x, r) => x * (r / lit(1000.0))),
        lit(0.0), (acc, p) => acc + p)
      embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .select(col("vec_id"),
          (0 until RpBits).map(j => when(dotJ(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("sig"))
    }),

    // Scalar int8 quantization with a global per-dimension codebook:
    // pass 1 aggregates min/max per dimension (64 rows), pass 2 broadcasts
    // the codebook back and quantizes — the classic two-job shape of
    // corpus-level embedding compression (the 100 TB variant writes the
    // codebook table once and quantizes in one map pass).
    "q92_quantize_int8" -> ((s, d) => {
      val ex = embeddings(s, d)
        .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("i", "v")))
      val stats = ex.groupBy("i").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      ex.join(broadcast(stats), "i")
        .select(col("vec_id"),
          (coalesce(floor((col("v") - col("mn")) / nullif(col("mx") - col("mn"), lit(0.0)) * 254 + 0.5)
            .cast("long"), lit(0L)) - 127).as("q"))
        .groupBy("vec_id")
        .agg(sum(col("q")).as("qsum"), min(col("q")).as("qmn"), max(col("q")).as("qmx"))
    }),

    // Quality-weighted downsampling: keep a document with probability
    // proportional to a length-derived quality proxy, decided by a
    // deterministic hash threshold (reproducible Bernoulli — same corpus
    // in, same sample out, no RNG state). Per-row scalar chain, zero
    // shuffle; composes with q60 (stratified) and q88 (mixture).
    "q93_quality_resample" -> ((s, d) => {
      val pMilli = least(greatest(expr("(n_chars * 1000) div 600"), lit(100L)), lit(900L))
      documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"), pMilli.as("p_milli"))
        .filter(Sketches.hllMix(charFold(col("text"))) % 1000 < col("p_milli"))
        .select(col("doc_id"), col("lang"), col("p_milli"))
    }),

    // Bloom-filter membership pruning: build a 65536-bit / 3-hash bloom
    // from high-value order custkeys, probe every customer, and report
    // survivors with their true-membership flag (false positives are part
    // of the CONTRACT and deterministic cross-engine). This is the runtime
    // join-pruning pattern: at 100 TB the bit positions (not the keys)
    // broadcast to the fact scan and drop non-joining rows before the
    // shuffle.
    "q94_bloom_join" -> ((s, d) => {
      val buildKeys = orders(s, d).filter(col("o_totalprice") > BloomCut)
        .select(col("o_custkey").as("k")).distinct()
      // one scan: explode the 3 positions per key, then dedup — the union-
      // of-3-selects formulation reads the build table once per hash
      val buildPos = buildKeys
        .select(explode(array((0 until 3).map(j => bloomPos(col("k"), j)): _*)).as("p"))
        .distinct()
      val probePos = customer(s, d)
        .select(col("c_custkey"),
          posexplode(array((0 until 3).map(j => bloomPos(col("c_custkey"), j)): _*))
            .as(Seq("j", "p")))
      probePos.join(broadcast(buildPos), "p")
        .groupBy("c_custkey").agg(count(lit(1)).as("nhit"))
        .filter(col("nhit") === 3)
        .join(buildKeys, col("c_custkey") === col("k"), "left")
        .select(col("c_custkey"), col("k").isNotNull.cast("long").as("is_member"))
    }),

    // Mergeable 256-bin histogram sketch + quantile estimates (p50/p90/p99
    // of document length): the registers are ONE hash-aggregate (<=256
    // rows regardless of input size — union+sum merges partials, the same
    // tree-reduction as the HLL registers), and the estimate is the
    // smallest bin whose cumulative count reaches ceil(p*N). The mergeable
    // complement of q54's exact percentiles. Cumulative window is fenced
    // to the 256-row register table.
    "q95_hist_quantile" -> ((s, d) => {
      val regs = documents(s, d)
        .select(least(expr("(n_chars * 256) div 600"), lit(255L)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
      // fenced: ≤256 rows (fixed-width register table)
      val cum = regs.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val n = documents(s, d).groupBy().agg(count(lit(1)).as("ntot"))
      val probes = cum.crossJoin(broadcast(n))
        .select(col("bin"), col("cum"),
          explode(typedLit(Seq(500L, 900L, 990L))).as("p_milli"),
          col("ntot"))
        .filter(col("cum") >= expr("(ntot * p_milli + 999) div 1000"))
        .groupBy("p_milli").agg(min(col("bin")).as("bin"))
      probes.join(broadcast(cum), "bin")
        .select(col("p_milli"), col("bin"), col("cum"))
    }),

    // Ranking-function family (row_number / ntile / percent_rank /
    // cume_dist) per order priority — the §2.8 window surface beyond
    // plain top-k. Deterministic: the order key ends in the unique
    // o_orderkey, so rank == row_number and the rational rank statistics
    // are exact. One exchange on the partition key.
    "q96_window_family" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority").as("pri"),
        row_number().over(w).cast("long").as("rk"),
        ntile(4).over(w).cast("long").as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // CDC changelog apply: fold an ordered upsert/delete stream (derived
    // from orders: one op per order, delete every 97th key) into the
    // customer base table — last writer wins per key, deletes drop the
    // row, untouched base rows pass through. The foreachBatch merge
    // sink's semantics as a pure query: window picks the final op per
    // key (one shuffle), then one outer join against the base.
    "q97_cdc_apply" -> ((s, d) => {
      val chg = orders(s, d).select(
        col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 97 === 0, "D").otherwise("U").as("op"),
        col("o_totalprice").as("val"))
      val last = chg.withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("seq").desc)))
        .filter(col("rn") === 1).drop("rn")
      customer(s, d).join(last, col("c_custkey") === col("k"), "left")
        .filter(col("op").isNull || col("op") === "U")
        .select(col("c_custkey"),
          when(col("op") === "U", col("val")).otherwise(col("c_acctbal")).as("bal"),
          when(col("op").isNull, "base").otherwise("cdc").as("src"))
    }),

    // Salt-and-replicate skew rewrite, proven result-identical: the fact
    // side funnels a third of all events onto one hot key; the dim side
    // is replicated across 8 salts and the join runs on (key, salt) so
    // the hot key spreads over 8 tasks. The oracle is the PLAIN join —
    // the rewrite must not change the answer. Forced to sort-merge (the
    // topology where salting matters; broadcast would hide the skew).
    "q98_salted_join" -> ((s, d) => {
      val salts = 8L
      val fact = events(s, d).select(
        when(col("event_id") % 3 === 0, 0L).otherwise(col("user_id") % 25).as("sk"),
        (col("event_id") % salts).as("salt"),
        col("value"))
      val dimS = nation(s, d)
        .select(col("n_nationkey").cast("long").as("sk"), col("n_name"))
        .select(col("sk"), col("n_name"), explode(sequence(lit(0L), lit(salts - 1))).as("salt"))
      fact.join(dimS.hint("merge"), Seq("sk", "salt"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // Unigram language-model scoring: corpus term frequencies → add-one
    // smoothed per-token log-probabilities → per-doc average. The
    // model-based quality signal (complement of q26's rule-based score) a
    // perplexity filter uses. Per-token logprobs are rounded to 9 dp and
    // summed as DECIMAL so the per-doc sum is exact and order-independent
    // (a raw double SUM would drift with partitioning). Two aggregates +
    // one term join; the vocabulary joins back by term key (vocabulary-
    // sized — no broadcast hint, AQE picks).
    "q99_unigram_logprob" -> ((s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      val totals = vocab.agg(sum(col("tf")).as("tt"),
        count(lit(1)).as("v")).select(col("tt"), col("v"))
      val lp = round(log((col("tf") + 1).cast("double") /
        (col("tt") + col("v")).cast("double")), 9).cast("decimal(18,9)")
      toks.join(vocab, "term")
        .crossJoin(broadcast(totals))
        .select(col("doc_id"), lp.as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          round((sum(col("lp")) / count(lit(1))).cast("double"), 6).as("avg_lp"))
    }),

    // Content-defined chunking: a boundary falls after any token whose
    // hash ≡ 0 (mod 16) — the rolling-hash cut rule dedup systems use so
    // chunk boundaries survive insertions (unlike q89's fixed stride,
    // where one inserted token shifts every later chunk). Pure per-row
    // fold over the token-hash array: zero shuffle, integer-only.
    "q100_cdc_chunks" -> ((s, d) => {
      val toks = tokens(col("text"))
      documents(s, d)
        .select(col("doc_id"), transform(toks, t => charFold(t)).as("th"))
        .filter(size(col("th")) >= 1)
        .select(col("doc_id"),
          aggregate(col("th"),
            struct(lit(0L).as("cur"), lit(0L).as("mx"), lit(0L).as("n")),
            (a, h) =>
              struct(
                when(h % 16 === 0, lit(0L)).otherwise(a("cur") + 1).as("cur"),
                greatest(a("mx"), a("cur") + 1).as("mx"),
                (a("n") + (h % 16 === 0).cast("long")).as("n")),
            a => struct(
              (a("n") + (a("cur") > 0).cast("long")).as("n"),
              a("mx").as("mx")))
            .as("acc"))
        .select(col("doc_id"), col("acc.n").as("n_chunks"),
          col("acc.mx").as("max_len"))
    }),

    // Join-size estimation from count-min sketches (the AGMS/CMS inner
    // product, Alon-Matias-Szegedy '99 / Cormode-Muthukrishnan '05): the
    // self-join size Σ_k c(k)² of the events user_id key — what the
    // optimizer wants to know BEFORE committing a 100 TB join to a
    // strategy — estimated as min_j Σ_bkt w_j[bkt]², always ≥ exact
    // (collisions only add mass). The sketch is depth × 256 counters
    // regardless of input size; at scale the exact audit column drops
    // and only the register table is kept/merged. Integer-only, so the
    // estimate hash-matches the oracle exactly.
    "q172_join_size_est" -> ((s, d) => {
      val freq = events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
      val regs = freq
        .select(col("c"), posexplode(array(
          (0 until CmsDepth).map(j => cmsBucket(col("user_id"), j)): _*))
          .as(Seq("r", "bkt")))
        .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("w"))
      val est = regs.groupBy(col("r"))
        .agg(sum(col("w") * col("w")).as("e"))
        .agg(min(col("e")).as("est_pairs"))
      val exact = freq.agg(count(lit(1)).as("n_keys"),
        sum(col("c") * col("c")).as("exact_pairs"))
      exact.crossJoin(broadcast(est)) // [bounded: 1 row]
        .select(col("n_keys"), col("exact_pairs"), col("est_pairs"),
          expr("(est_pairs * 1000) div exact_pairs").as("ratio_milli"))
    }),

    // BPE TRAINING, not just pair counting (q68 ranks one round's pairs;
    // this runs the actual merge loop, Sennrich et al. '16): 3 rounds of
    // [count adjacent pairs → pick the most frequent (ties: lexicographic)
    // → greedily merge left-to-right]. The corpus is carried as a
    // paren-delimited token string "(a)(b)(c)" so the greedy merge IS the
    // engine's native non-overlapping left-to-right replace — both
    // engines share one exactly-specified semantics, parens cannot occur
    // inside (alnum) tokens, and [a,a,a,a] correctly becomes [aa][aa]
    // (each match consumes its own parens only). Per round: one pair
    // aggregate + one 1-row driver collect (the q70 k-means pattern —
    // the merge DECISION is driver-sized, the merge APPLY is
    // distributed); lineage truncated per round. At 100 TB each round is
    // one scan + one vocabulary-sized aggregate — the textbook
    // distributed BPE trainer profile.
    // Supervised quality-classifier TRAINING (the CCNet/fastText shape
    // for the corpus quality filter): logistic-style regression of
    // "is this document English" on quality signals, trained by batch
    // gradient descent where each iteration is ONE distributed
    // aggregate over the corpus + 4 broadcast weight scalars — the
    // 100 TB-trainable shape (T passes, no per-row state, no driver
    // data). Cross-engine EXACTNESS by construction: features quantize
    // to integer grids (×1000), the per-row link output quantizes to
    // ×1e6 (the sigmoid is the rational 0.5 + 0.5·z/(1+|z|) — algebraic
    // IEEE ops only, so Spark and DuckDB bit-match where libm exp()
    // would not), gradients are exact integer DECIMAL(38,0) sums that
    // stay below 2^53 (exact as doubles), and the weight update is a
    // fixed IEEE expression — so the whole weight TRAJECTORY bit-matches
    // the oracle's closed-form replay. Feeds the existing evaluation
    // chain (q117 P/R, q138 AUC, q170 calibration).
    "q242_quality_train" -> ((s, d) => {
      import s.implicits._
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val base = documents(s, d).select(
        (col("lang") === "en").cast("long").as("y"),
        lit(1000L).as("x0"),
        floor((lit(1000.0) * nTok) / (nTok + lit(50L))).cast("long").as("x1"),
        when(nTok > lit(0L),
          floor((lit(1000.0) * stopN) / nTok)).otherwise(lit(0L))
          .cast("long").as("x2"),
        floor((lit(1000.0) * col("n_chars")) / (col("n_chars") + lit(500L)))
          .cast("long").as("x3"))
        .localCheckpoint() // tokenize ONCE; iterations re-aggregate only
      val w = Array(0.0, 0.0, 0.0, 0.0)
      val hist = scala.collection.mutable.ArrayBuffer[(Long, Double, Double, Double, Double)]()
      for (t <- 1L to 4L) {
        val z = ((((lit(w(0)) * col("x0")) + (lit(w(1)) * col("x1"))) +
          (lit(w(2)) * col("x2"))) + (lit(w(3)) * col("x3"))) / lit(1000.0)
        val p = lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))
        val rq = floor(p * lit(1000000.0)).cast("long") -
          col("y") * lit(1000000L)
        val row = base.agg(
          sum((rq * col("x0")).cast("decimal(38,0)")).as("g0"),
          sum((rq * col("x1")).cast("decimal(38,0)")).as("g1"),
          sum((rq * col("x2")).cast("decimal(38,0)")).as("g2"),
          sum((rq * col("x3")).cast("decimal(38,0)")).as("g3"),
          count(lit(1)).as("n")).head()
        val n = row.getLong(4).toDouble
        for (j <- 0 until 4)
          w(j) = w(j) - 0.5 * (row.getDecimal(j).doubleValue / (n * 1.0e9))
        hist += ((t, w(0), w(1), w(2), w(3)))
      }
      hist.toSeq.toDF("iter", "w0", "w1", "w2", "w3")
    }),

    // HASHED-FEATURE quality classifier (the fastText bag-of-words
    // shape proper, q242's dense-signal sibling): each document's
    // features are PRESENCE bits over 16 hash buckets of its tokens
    // (portable charFold % 16 — the dimensionality-fixed trick that
    // makes vocabulary size irrelevant at 100 TB) plus a bias; 3
    // gradient-descent iterations, each ONE distributed aggregate of
    // 17 integer gradient sums + broadcast weights. Same cross-engine
    // exactness discipline as q242 (quantized features, rational
    // sigmoid, floor-quantized link, DECIMAL(38,0) integer sums below
    // 2^53, fixed IEEE update): the per-bucket weight TRAJECTORY
    // bit-matches the oracle's closed-form replay.
    "q244_hashed_train" -> ((s, d) => {
      import s.implicits._
      val toks = tokens(col("text"))
      val names = "bias" +: (0 until 16).map(b => s"x$b")
      val feats = lit(1000L).as("bias") +: (0 until 16).map(b =>
        when(exists(toks, t => charFold(t) % lit(16L) === lit(b.toLong)),
          lit(1000L)).otherwise(lit(0L)).as(s"x$b"))
      val base = documents(s, d).select(
        ((col("lang") === "en").cast("long").as("y") +: feats): _*)
        .localCheckpoint() // hash ONCE; iterations re-aggregate only
      val w = Array.fill(17)(0.0)
      val hist = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
      for (t <- 1L to 3L) {
        val z = names.zipWithIndex.map { case (nm, i) => lit(w(i)) * col(nm) }
          .reduceLeft(_ + _) / lit(1000.0)
        val p = lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))
        val rq = floor(p * lit(1000000.0)).cast("long") -
          col("y") * lit(1000000L)
        val aggs = names.map(nm =>
          sum((rq * col(nm)).cast("decimal(38,0)")).as(s"g_$nm")) :+
          count(lit(1)).as("n")
        val row = base.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(17).toDouble
        for (i <- 0 until 17)
          w(i) = w(i) - 0.5 * (row.getDecimal(i).doubleValue / (n * 1.0e9))
        names.zipWithIndex.foreach { case (nm, i) => hist += ((t, nm, w(i))) }
      }
      hist.toSeq.toDF("iter", "feat", "w")
    }),

    // TEMPERATURE-BASED domain reweighting (the multilingual-sampling /
    // DoReMi-lite mixing step, q88's principled sibling): per-source
    // sampling weights w_s ∝ n_s^τ with τ = 0.5 — upweights small
    // domains, tempers the head. τ = 0.5 makes the power a SQRT, which
    // IEEE-754 requires correctly rounded — so unlike exp/pow the
    // weights are bit-identical cross-engine; the normalizer is a
    // DECIMAL(18,9) exact sum of the rounded weights (order-free), and
    // the output is each source's share + its target document count
    // for a 10k-doc training budget.
    "q247_temperature_mix" -> ((s, d) => {
      val counts = documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val w = counts.withColumn("w",
        round(sqrt(col("n_docs").cast("double")), 9).cast("decimal(18,9)"))
      val tot = w.agg(sum(col("w")).as("tw"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          round(col("w").cast("double") / col("tw").cast("double"), 9)
            .as("share"),
          floor(lit(10000.0) *
            (col("w").cast("double") / col("tw").cast("double")))
            .cast("long").as("target_10k"))
    }),

    // BPE APPLY — the ENCODE half of q173's trainer: re-derive the 3
    // merges (same argmax loop) and apply them to the whole corpus,
    // reporting per-document token counts before and after (the
    // compression a tokenizer buys — the number every training-cost
    // estimate starts from). Token count = '(' group count on the
    // paren encoding, so the encode itself is pure string arithmetic
    // the oracle replays exactly; merges are non-overlapping
    // left-to-right replaces in both engines.
    "q245_bpe_apply" -> ((s, d) => {
      val nOf = "length(s) - length(replace(s, '(', ''))"
      // coalesce the text on BOTH sides: Spark's concat_ws collapses a
      // null token array to "" while DuckDB's array_to_string stays
      // NULL — a null document would silently diverge per-row
      var cur = documents(s, d).select(col("doc_id"),
        concat_ws("", transform(tokens(coalesce(col("text"), lit(""))),
          t => concat(lit("("), t, lit(")")))).as("s"))
        .withColumn("n_before", expr(nOf).cast("long"))
        .localCheckpoint()
      for (_ <- 1 to 3) {
        val toks = split(expr("substring(s, 2, length(s) - 2)"), "\\)\\(")
        val pairs = cur.filter(length(col("s")) > 0)
          .select(explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
          .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
          .agg(count(lit(1)).as("cnt"))
        val best = pairs.orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(1).collect()(0) // ONE row per round (argmax decision)
        val (bl, br) = (best.getString(0), best.getString(1))
        // Column-arg replace, NOT an expr() interpolation: a merge
        // token containing a quote would break the generated SQL, and
        // a backslash would be escape-interpreted by Spark's literal
        // parser but taken raw by the oracle's concatenation
        cur = cur.withColumn("s", replace(col("s"),
          lit(s"($bl)($br)"), lit(s"($bl $br)"))).localCheckpoint()
      }
      cur.select(col("doc_id"), col("n_before"),
        expr(nOf).cast("long").as("n_after"))
    }),

    "q173_bpe_train" -> ((s, d) => {
      import s.implicits._
      var cur = documents(s, d).select(col("doc_id"),
        concat_ws("", transform(tokens(col("text")),
          t => concat(lit("("), t, lit(")")))).as("s"))
        .localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      for (round <- 1L to 3L) {
        val toks = split(expr("substring(s, 2, length(s) - 2)"), "\\)\\(")
        val pairs = cur.filter(length(col("s")) > 0)
          .select(explode(zip_with(
            slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
          .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
          .agg(count(lit(1)).as("cnt"))
        // per-round DRIVER action: ONE row (the argmax merge decision via
        // TakeOrdered — never a sorted collect); BPE training is
        // inherently sequential in its merge choices, so this is the
        // minimum possible driver traffic: 3 rounds × 1 row
        val best = pairs.orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(1).collect()(0)
        val (bl, br, bc) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((round, bl, br, bc))
        // Column-arg replace (see q245): quote/backslash-safe for
        // arbitrary merge tokens
        cur = cur.withColumn("s", replace(col("s"),
          lit(s"($bl)($br)"), lit(s"($bl $br)"))).localCheckpoint()
      }
      merges.toSeq.toDF("round", "lhs", "rhs", "cnt")
    }),
  )

  val oracle: Map[String, String] = {
    val tokSql = tokensSql("text")
    Map(
      "q87_cms_topk" -> {
        val regSelects = (0 until CmsDepth).map { j =>
          s"SELECT $j AS r, ${cmsBucketSql("h", j)} AS bkt, count(*) AS cnt FROM hashed GROUP BY 2"
        }.mkString(" UNION ALL ")
        val joins = (0 until CmsDepth).map { j =>
          s"JOIN (SELECT bkt, cnt AS c$j FROM regs WHERE r = $j) r$j ON ${cmsBucketSql("top.h", j)} = r$j.bkt"
        }.mkString(" ")
        s"""WITH toks AS (SELECT unnest($tokSql) AS term FROM documents),
            hashed AS (SELECT term, ${charFoldSql("term")} AS h FROM toks),
            regs AS ($regSelects),
            probes AS (SELECT term, count(*)::BIGINT AS exact_n, min(h) AS h
                       FROM hashed GROUP BY 1),
            top AS (SELECT term, exact_n, h FROM (
                      SELECT *, row_number() OVER (ORDER BY exact_n DESC, term) AS rk
                      FROM probes) WHERE rk <= 20)
            SELECT term, exact_n, least(c0, c1, c2)::BIGINT AS est_n
            FROM top $joins"""
      },
      "q88_mixture_sample" -> {
        val wCase = MixWeights.map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
          .mkString("CASE ", " ", " ELSE 0 END")
        s"""SELECT doc_id, lang, rk FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY ${charFoldSql("text")}, doc_id)::BIGINT AS rk,
                     ($wCase) AS wm
              FROM documents) r,
            (SELECT count(*) AS ntot FROM documents) n
            WHERE rk <= (n.ntot * r.wm) // 1000"""
      },
      "q89_doc_chunks" ->
        s"""WITH base AS (
              SELECT doc_id, list_transform($tokSql, t -> ${charFoldSql("t")}) AS th
              FROM documents),
            b2 AS (SELECT doc_id, th, len(th)::BIGINT AS n FROM base),
            ch AS (SELECT doc_id, th, n,
                     unnest(range(0, CASE WHEN n <= $ChunkSize THEN 1
                       ELSE (n - ${ChunkSize - ChunkStride + 1}) // $ChunkStride + 1 END)) AS ci
                   FROM b2)
            SELECT doc_id, ci::BIGINT AS chunk_id,
                   (ci * $ChunkStride)::BIGINT AS start_tok,
                   least($ChunkSize, n - ci * $ChunkStride)::BIGINT AS n_tok,
                   list_reduce(list_prepend(0::BIGINT,
                     list_slice(th, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize)),
                     (qa, qx) -> (qa * 31 + qx) % $FoldMod) AS chash
            FROM ch""",
      "q90_event_gaps" ->
        s"""SELECT user_id, count(*)::BIGINT AS n_gaps,
                   sum(gap_ms)::BIGINT AS sum_gap_ms,
                   max(gap_ms)::BIGINT AS max_gap_ms
            FROM (SELECT user_id,
                    (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) - epoch_us(ts)) // 1000 AS gap_ms
                  FROM events)
            WHERE gap_ms IS NOT NULL
            GROUP BY 1""",
      "q91_embed_signs" -> {
        val dots = (0 until RpBits).map { j =>
          val lits = rpInts(j).mkString("[", ", ", "]")
          s"list_reduce(list_prepend(0::DOUBLE, list_transform(e, (qx, qi) -> " +
            s"qx * ($lits[qi] / 1000.0))), (qa, qb) -> qa + qb) AS d$j"
        }.mkString(", ")
        val sig = (0 until RpBits)
          .map(j => s"(CASE WHEN d$j >= 0 THEN ${1L << j} ELSE 0 END)")
          .mkString("(", " + ", ")::BIGINT")
        s"""WITH base AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
            dots AS (SELECT vec_id, $dots FROM base)
            SELECT vec_id, $sig AS sig FROM dots"""
      },
      "q92_quantize_int8" ->
        s"""WITH ex AS (
              SELECT vec_id, i, (embedding::DOUBLE[])[i] AS v
              FROM embeddings, range(1, ${RpDim + 1}) t(i)),
            stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1),
            q AS (SELECT vec_id,
                    coalesce(floor((v - mn) / nullif(mx - mn, 0.0) * 254 + 0.5)::BIGINT, 0) - 127 AS q
                  FROM ex JOIN stats USING (i))
            SELECT vec_id, sum(q)::BIGINT AS qsum, min(q)::BIGINT AS qmn,
                   max(q)::BIGINT AS qmx
            FROM q GROUP BY 1""",
      "q93_quality_resample" ->
        s"""SELECT doc_id, lang, p_milli FROM (
              SELECT doc_id, lang, text,
                     least(greatest((n_chars * 1000) // 600, 100), 900)::BIGINT AS p_milli
              FROM documents)
            WHERE ${Sketches.hllMixSql(charFoldSql("text"))} % 1000 < p_milli""",
      "q94_bloom_join" -> {
        val probeList = (0 until 3).map(j => bloomPosSql("c_custkey", j)).mkString("[", ", ", "]")
        val buildSelects = (0 until 3)
          .map(j => s"SELECT ${bloomPosSql("k", j)} AS p FROM bk").mkString(" UNION ")
        s"""WITH bk AS (SELECT DISTINCT o_custkey AS k FROM orders
                        WHERE o_totalprice > $BloomCut),
            bp AS ($buildSelects),
            pp AS (SELECT c_custkey, unnest($probeList) AS p FROM customer),
            pass AS (SELECT c_custkey FROM pp JOIN bp USING (p)
                     GROUP BY 1 HAVING count(*) = 3)
            SELECT c_custkey,
                   (CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS is_member
            FROM pass LEFT JOIN bk ON c_custkey = k"""
      },
      "q95_hist_quantile" ->
        s"""WITH regs AS (
              SELECT least((n_chars * 256) // 600, 255)::BIGINT AS bin,
                     count(*)::BIGINT AS cnt
              FROM documents GROUP BY 1),
            cum AS (SELECT bin, cnt,
                      sum(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
                    FROM regs),
            n AS (SELECT count(*)::BIGINT AS ntot FROM documents),
            probes AS (
              SELECT p_milli, min(bin) AS bin
              FROM cum, n, unnest([500, 900, 990]) AS t(p_milli)
              WHERE cum >= (ntot * p_milli + 999) // 1000
              GROUP BY 1)
            SELECT p_milli::BIGINT AS p_milli, probes.bin, cum.cum
            FROM probes JOIN cum ON probes.bin = cum.bin""",
      "q96_window_family" ->
        s"""SELECT o_orderkey, o_orderpriority AS pri,
                   row_number() OVER w::BIGINT AS rk,
                   ntile(4) OVER w::BIGINT AS nt,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey)""",
      "q97_cdc_apply" ->
        s"""WITH chg AS (
              SELECT o_custkey AS k, o_orderkey AS seq,
                     CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
                     o_totalprice AS val
              FROM orders),
            last AS (SELECT k, op, val FROM (
                       SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
                       FROM chg) WHERE rn = 1)
            SELECT c_custkey,
                   CASE WHEN op = 'U' THEN val ELSE c_acctbal END AS bal,
                   CASE WHEN op IS NULL THEN 'base' ELSE 'cdc' END AS src
            FROM customer LEFT JOIN last ON c_custkey = k
            WHERE op IS NULL OR op = 'U'""",
      "q98_salted_join" ->
        s"""SELECT n_name, count(*)::BIGINT AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM (SELECT CASE WHEN event_id % 3 = 0 THEN 0
                              ELSE user_id % 25 END AS sk, value
                  FROM events) f
            JOIN nation ON f.sk = n_nationkey
            GROUP BY 1""",
      "q99_unigram_logprob" ->
        s"""WITH toks AS (
              SELECT doc_id, unnest($tokSql) AS term FROM documents),
            vocab AS (SELECT term, count(*)::BIGINT AS tf FROM toks GROUP BY 1),
            totals AS (SELECT sum(tf)::BIGINT AS tt, count(*)::BIGINT AS v FROM vocab)
            SELECT doc_id, count(*)::BIGINT AS n_toks,
                   round(CAST(sum(CAST(round(ln((tf + 1)::DOUBLE / (tt + v)::DOUBLE), 9)
                     AS DECIMAL(18,9))) / count(*) AS DOUBLE), 6) AS avg_lp
            FROM toks JOIN vocab USING (term), totals
            GROUP BY 1""",
      "q100_cdc_chunks" -> {
        // DuckDB list_reduce pitfall: a STRUCT accumulator resolves
        // earlier fields' names in later field expressions (qa.cur in the
        // 'mx' slot sees the NEW cur), so the three counters are packed
        // into one BIGINT instead: acc = cur + mx*2^20 + n*2^40 (each
        // counter < 2^20 — docs are < 600 chars).
        val B = 1L << 20
        val cur = s"(qa % $B)"
        val mx = s"((qa // $B) % $B)"
        val n = s"(qa // ${B * B})"
        val cut = s"(qe % 16 = 0)"
        s"""SELECT doc_id,
                   (acc // ${B * B} +
                    CASE WHEN acc % $B > 0 THEN 1 ELSE 0 END)::BIGINT AS n_chunks,
                   ((acc // $B) % $B)::BIGINT AS max_len
            FROM (
              SELECT doc_id,
                list_reduce(list_prepend(0::BIGINT, th), (qa, qe) ->
                  (CASE WHEN $cut THEN 0::BIGINT ELSE $cur + 1 END)
                  + greatest($mx, $cur + 1) * $B
                  + ($n + CASE WHEN $cut THEN 1::BIGINT ELSE 0::BIGINT END) * ${B * B}
                ) AS acc
              FROM (
                SELECT doc_id, list_transform($tokSql, t -> ${charFoldSql("t")}) AS th
                FROM documents)
              WHERE len(th) >= 1)"""
      },
      "q172_join_size_est" -> {
        val regSelects = (0 until CmsDepth).map { j =>
          s"SELECT $j AS r, ${cmsBucketSql("h", j)} AS bkt, c FROM freq"
        }.mkString(" UNION ALL ")
        s"""WITH freq AS (
              SELECT user_id AS h, count(*)::BIGINT AS c
              FROM events GROUP BY 1),
            regs AS (
              SELECT r, bkt, sum(c)::BIGINT AS w
              FROM ($regSelects) GROUP BY 1, 2),
            est AS (
              SELECT min(e)::BIGINT AS est_pairs FROM (
                SELECT r, sum(w * w)::BIGINT AS e FROM regs GROUP BY 1)),
            ex AS (
              SELECT count(*)::BIGINT AS n_keys,
                     sum(c * c)::BIGINT AS exact_pairs FROM freq)
            SELECT n_keys, exact_pairs, est_pairs,
                   CAST((est_pairs * 1000) // exact_pairs AS BIGINT)
                     AS ratio_milli
            FROM ex, est"""
      },
      "q242_quality_train" -> {
        // The closed-form replay of the 4 gradient-descent iterations:
        // wt{t} carries the weight 4-vector entering iteration t+1;
        // every arithmetic step is the EXACT IEEE expression the Spark
        // side runs (quantized features, rational sigmoid, integer
        // gradient sums), so the weight trajectory bit-matches.
        val stopEn = TextAnalysis.LangProfiles.head._2
        val iters = (1 to 4).map { t =>
          s"""g$t AS (
                SELECT sum(CAST(rq * x0 AS DECIMAL(38,0))) AS g0,
                       sum(CAST(rq * x1 AS DECIMAL(38,0))) AS g1,
                       sum(CAST(rq * x2 AS DECIMAL(38,0))) AS g2,
                       sum(CAST(rq * x3 AS DECIMAL(38,0))) AS g3,
                       count(*)::BIGINT AS n
                FROM (SELECT y, x0, x1, x2, x3,
                             CAST(floor(p * 1000000.0) AS BIGINT)
                               - y * 1000000 AS rq
                      FROM (SELECT *,
                              0.5 + (0.5 * z) / (1.0 + abs(z)) AS p
                            FROM (SELECT f.*,
                                    ((((w.c0 * x0) + (w.c1 * x1))
                                      + (w.c2 * x2)) + (w.c3 * x3))
                                      / 1000.0 AS z
                                  FROM feat f CROSS JOIN wt${t - 1} w)))),
              wt$t AS (
                SELECT w.c0 - 0.5 * (CAST(g.g0 AS DOUBLE)
                         / (CAST(g.n AS DOUBLE) * 1.0e9)) AS c0,
                       w.c1 - 0.5 * (CAST(g.g1 AS DOUBLE)
                         / (CAST(g.n AS DOUBLE) * 1.0e9)) AS c1,
                       w.c2 - 0.5 * (CAST(g.g2 AS DOUBLE)
                         / (CAST(g.n AS DOUBLE) * 1.0e9)) AS c2,
                       w.c3 - 0.5 * (CAST(g.g3 AS DOUBLE)
                         / (CAST(g.n AS DOUBLE) * 1.0e9)) AS c3
                FROM g$t g CROSS JOIN wt${t - 1} w)"""
        }.mkString(",\n")
        val outs = (1 to 4).map(t =>
          s"SELECT $t::BIGINT AS iter, c0 AS w0, c1 AS w1, c2 AS w2, c3 AS w3 FROM wt$t")
          .mkString(" UNION ALL ")
        s"""WITH feat AS (
              SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
                     1000::BIGINT AS x0,
                     CAST(floor((1000.0 * n_tok) / (n_tok + 50)) AS BIGINT) AS x1,
                     CASE WHEN n_tok > 0
                       THEN CAST(floor((1000.0 * stop_n) / n_tok) AS BIGINT)
                       ELSE 0 END AS x2,
                     CAST(floor((1000.0 * n_chars) / (n_chars + 500)) AS BIGINT) AS x3
              FROM (SELECT lang, n_chars, len(tk)::BIGINT AS n_tok,
                           ${TextAnalysis.countInSql("tk", stopEn)} AS stop_n
                    FROM (SELECT lang, n_chars, ${tokensSql("text")} AS tk
                          FROM documents))),
            wt0 AS (SELECT 0.0 AS c0, 0.0 AS c1, 0.0 AS c2, 0.0 AS c3),
            $iters
            $outs"""
      },

      "q244_hashed_train" -> {
        // Presence bits via unnest + per-doc MAX (no nested lambdas —
        // the outer-capture form DuckDB's lambda support is shaky on);
        // then the same closed-form iteration unroll as q242 with 17
        // weight columns. Every arithmetic step is the exact IEEE
        // expression the Spark side runs.
        val names = "bias" +: (0 until 16).map(b => s"x$b")
        val presCols = (0 until 16).map(b =>
          s"max(CASE WHEN tb.b = $b THEN 1000 ELSE 0 END)::BIGINT AS x$b")
          .mkString(",\n                       ")
        val zExpr = names.map(nm => s"(w.c_$nm * $nm)")
          .reduceLeft((a, b) => s"($a + $b)") + " / 1000.0"
        val gCols = names.map(nm =>
          s"sum(CAST(rq * $nm AS DECIMAL(38,0))) AS g_$nm")
          .mkString(",\n                       ")
        val featPass = names.map(nm => s"f.$nm").mkString(", ")
        val iters = (1 to 3).map { t =>
          s"""g$t AS (
                SELECT $gCols,
                       count(*)::BIGINT AS n
                FROM (SELECT y, $featPass,
                             CAST(floor(p * 1000000.0) AS BIGINT)
                               - y * 1000000 AS rq
                      FROM (SELECT f.*,
                              0.5 + (0.5 * z) / (1.0 + abs(z)) AS p
                            FROM (SELECT f.*, $zExpr AS z
                                  FROM feat f CROSS JOIN wt${t - 1} w) f) f)),
              wt$t AS (
                SELECT ${names.map(nm =>
                  s"w.c_$nm - 0.5 * (CAST(g.g_$nm AS DOUBLE) / " +
                    s"(CAST(g.n AS DOUBLE) * 1.0e9)) AS c_$nm")
                  .mkString(",\n                       ")}
                FROM g$t g CROSS JOIN wt${t - 1} w)"""
        }.mkString(",\n")
        val outs = (1 to 3).flatMap(t => names.map(nm =>
          s"SELECT $t::BIGINT AS iter, '$nm' AS feat, c_$nm AS w FROM wt$t"))
          .mkString(" UNION ALL ")
        s"""WITH docs AS (
              SELECT doc_id,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
                     $tokSql AS tk
              FROM documents),
            tokbkt AS (
              SELECT doc_id, (${charFoldSql("tok")}) % 16 AS b
              FROM (SELECT doc_id, unnest(tk) AS tok FROM docs)),
            feat AS (
              SELECT d.doc_id, d.y, 1000::BIGINT AS bias,
                     $presCols
              FROM docs d LEFT JOIN tokbkt tb ON d.doc_id = tb.doc_id
              GROUP BY d.doc_id, d.y),
            wt0 AS (SELECT ${names.map(nm => s"0.0 AS c_$nm")
              .mkString(", ")}),
            $iters
            $outs"""
      },

      "q247_temperature_mix" ->
        """WITH c AS (
              SELECT source, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1),
            w AS (SELECT source, n_docs,
                    CAST(round(sqrt(n_docs::DOUBLE), 9)
                      AS DECIMAL(18,9)) AS w
                  FROM c),
            t AS (SELECT sum(w) AS tw FROM w)
         SELECT source, n_docs,
                round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 9) AS share,
                CAST(floor(10000.0 * (CAST(w AS DOUBLE)
                  / CAST(tw AS DOUBLE))) AS BIGINT) AS target_10k
         FROM w, t""",

      "q245_bpe_apply" -> {
        // q173's CTE chain with doc_id + the before-count carried
        // through every round; the output is the per-doc encode
        // arithmetic on the final corpus strings.
        val nOf = (s: String) =>
          s"(length($s) - length(replace($s, '(', '')))::BIGINT"
        val rounds = (1 to 3).map { r =>
          s"""tk$r AS (SELECT string_split(s[2:length(s)-1], ')(') AS tk
                       FROM t$r WHERE length(s) > 0),
              p$r AS (SELECT tk[i] AS lhs, tk[i+1] AS rhs,
                             count(*)::BIGINT AS cnt
                      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                            FROM tk$r)
                      GROUP BY 1, 2),
              b$r AS (SELECT lhs, rhs, cnt FROM p$r
                      ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t${r + 1} AS (SELECT doc_id, n_before, replace(s,
                              '(' || b.lhs || ')(' || b.rhs || ')',
                              '(' || b.lhs || ' ' || b.rhs || ')') AS s
                            FROM t$r, b$r b)"""
        }.mkString(",\n")
        s"""WITH t1 AS (
              SELECT doc_id, ${nOf("s")} AS n_before, s
              FROM (SELECT doc_id, array_to_string(
                      list_transform(${tokensSql("coalesce(text, '')")},
                        t -> '(' || t || ')'), '') AS s
                    FROM documents)),
            $rounds
            SELECT doc_id, n_before, ${nOf("s")} AS n_after FROM t4"""
      },

      "q173_bpe_train" -> {
        // Same 3 rounds as CTE chain: tN holds the corpus strings entering
        // round N; bN the round's winning merge; replace() shares Spark's
        // non-overlapping left-to-right semantics on the paren encoding.
        val rounds = (1 to 3).map { r =>
          s"""tk$r AS (SELECT string_split(s[2:length(s)-1], ')(') AS tk
                       FROM t$r WHERE length(s) > 0),
              p$r AS (SELECT tk[i] AS lhs, tk[i+1] AS rhs,
                             count(*)::BIGINT AS cnt
                      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                            FROM tk$r)
                      GROUP BY 1, 2),
              b$r AS (SELECT lhs, rhs, cnt FROM p$r
                      ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t${r + 1} AS (SELECT replace(s,
                              '(' || b.lhs || ')(' || b.rhs || ')',
                              '(' || b.lhs || ' ' || b.rhs || ')') AS s
                            FROM t$r, b$r b)"""
        }.mkString(",\n")
        val outs = (1 to 3).map(r =>
          s"SELECT $r::BIGINT AS round, lhs, rhs, cnt FROM b$r")
          .mkString(" UNION ALL ")
        s"""WITH t1 AS (
              SELECT array_to_string(
                list_transform(${tokensSql("text")}, t -> '(' || t || ')'),
                '') AS s
              FROM documents),
            $rounds
            $outs"""
      },
    )
  }
}
