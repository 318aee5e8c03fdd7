package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable._
import graft.ext.TextAnalysis

/** Round-6 data-selection and embedding-compression operators: DSIR-style
  * importance weighting (Xie et al. '23, hashed n-gram features), corpus
  * drift measurement (per-source KL divergence over hashed unigram
  * distributions), product quantization (Jégou et al. '11), SemDeDup-style
  * embedding-cell semantic dedup (Abbas et al. '23), interpolated bigram
  * LM scoring (the CCNet/KenLM perplexity-filter shape), quality-filter
  * threshold evaluation, and a range-shard planner (the step that sizes a
  * 100 TB global sort).
  *
  * Same shared-constants discipline as every earlier family: the Spark
  * plan and the DuckDB oracle are generated from the same Scala constants
  * (functions/Portable.scala), so the correctness gate checks values.
  *
  * Determinism: every libm call (ln) is rounded to 9 dp before use; all
  * per-group sums of doubles go through DECIMAL(18,9) so they are exact
  * and partition-order-independent; divisions of exact integers are
  * single IEEE ops.
  */
object SelectionQueries {

  /** DSIR hashed-feature buckets (importance-weight feature space). */
  val DsirBuckets = 64L
  /** KL-divergence hashed-unigram buckets. */
  val KlBuckets = 256L
  /** Product quantization geometry: 64-dim embeddings → M subspaces of
    * SubDim, K codes per subspace (codewords = the first K vectors'
    * subvectors — a real deployment trains k-means; fixed seeds keep the
    * oracle reproducible, the q49/q70 convention). */
  val PqM = 4
  val PqSubDim = 16
  val PqK = 8
  /** IVF-PQ search geometry: probe the NProbe best coarse cells, PQ-score
    * their members, exact-re-rank the RerankR-deep shortlist. */
  val NProbe = 2
  val RerankR = 20
  /** SemDeDup cosine threshold (within-cell pairs above it are near-dups;
    * the synthetic embeddings are near-orthogonal, so the threshold sits
    * where within-cell positive correlation puts real mass). */
  val SemThreshold = 0.3
  /** Bigram-LM interpolation weight λ: p = λ·p_bigram + (1−λ)·p_unigram. */
  val LmLambda = 0.7
  /** Quality-filter evaluation threshold grid. */
  val EvalThresholds = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
  /** Range-shard count (boundaries = the 7 interior octile percentiles). */
  val NumShards = 8

  // ---- shared expression generators ---------------------------------------

  /** ln rounded to 9 dp — the libm-determinism rule. */
  private def ln9(x: Column): Column = round(log(x), 9)
  private def ln9Sql(x: String): String = s"round(ln($x), 9)"

  /** Per-document interpolated-bigram-LM score (doc_id, n_bigrams,
    * avg_logprob) — q116's chain, shared with the CCNet bucket split
    * (q246) so the two can never drift on the LM arithmetic. */
  private def bigramLmScores(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"), size(col("tk")).as("n"))
    val big = base
      .select(col("doc_id"), col("tk"), explode(sequence(lit(1), col("n") - 1)).as("i"))
      .select(col("doc_id"), element_at(col("tk"), col("i")).as("t1"),
        element_at(col("tk"), col("i") + 1).as("t2"))
    val bc = big.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cb"))
    val pfx = big.groupBy(col("t1")).agg(count(lit(1)).as("cp"))
    val uni = documents(s, d)
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cu"))
    val tv = uni.agg(sum(col("cu")).as("tu"), count(lit(1)).as("v"))
    val p = lit(LmLambda) * (col("cb").cast("double") / col("cp").cast("double")) +
      lit(1.0 - LmLambda) *
        ((col("cu") + 1).cast("double") / (col("tu") + col("v")).cast("double"))
    big.join(bc, Seq("t1", "t2"))
      .join(pfx, Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("cu")), Seq("t2"))
      .crossJoin(broadcast(tv))
      .select(col("doc_id"), ln9(p).cast("decimal(18,9)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(sum(col("lp")).cast("double") /
             count(lit(1)).cast("double"), 6).as("avg_logprob"))
  }

  /** Squared-L2 distance between two ARRAY<DOUBLE>, sequential fold
    * (bit-identical cross-engine: same squares, same summation order). */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, p) => s + p)
  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_prepend(0::DOUBLE, list_transform($a, " +
      s"(qx, qj) -> (qx - ($b)[qj]) * (qx - ($b)[qj]))), (qp, qq) -> qp + qq)"

  /** Nearest codeword in `cb` (ARRAY<ARRAY<DOUBLE>>) by squared L2:
    * returns struct(bi = 1-based code, bd = distance). Strict `<` keeps
    * the LOWEST code on ties on both engines. */
  private def pqNearest(sub: Column, cb: Column): Column =
    aggregate(
      sequence(lit(1), size(cb)),
      struct(lit(0).cast("int").as("bi"), lit(1e300).as("bd")),
      (acc, i) => {
        val dd = l2(sub, element_at(cb, i))
        when(dd < acc("bd"), struct(i.cast("int").as("bi"), dd.as("bd")))
          .otherwise(acc)
      })
  private def pqNearestSql(sub: String, cb: String): String =
    s"""list_reduce(list_prepend({'bi': 0, 'bd': 1e300},
          list_transform(range(1, len($cb) + 1),
            qi -> {'bi': qi::INT, 'bd': ${l2Sql(sub, s"($cb)[qi]")}})),
          (qacc, qel) -> CASE WHEN qel.bd < qacc.bd THEN qel ELSE qacc END)"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR-style data selection: hashed-unigram importance weights
    // w(doc) = Σ_t ln p_target(bucket(t)) − ln p_raw(bucket(t)) with
    // Laplace-smoothed bucket distributions (target = the 'en' slice, raw
    // = the whole corpus), top-100 docs by weight. Two scans: one builds
    // the 64-row bucket-weight table (a hash-aggregate whose size is the
    // FEATURE space, not the corpus), one scores — the weight table joins
    // back broadcast, so at 100 TB the scoring pass is a per-row chain
    // inside the scan and the selection is TakeOrderedAndProject.
    // Per-token weights are 9 dp DECIMALs; the per-doc sum is exact, so
    // ORDER BY (sum, doc_id) picks the same 100 rows on both engines.
    "q111_dsir" -> ((s, d) => {
      val B = DsirBuckets
      val tok = documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("lang"), (charFold(col("t")) % B).as("bucket"))
      val counts = tok.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cq"),
             sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val totals = counts.agg(sum(col("cq")).as("tq"), sum(col("ct")).as("tt"))
      val wtab = counts.crossJoin(broadcast(totals))
        .select(col("bucket"),
          (ln9((col("ct") + 1).cast("double") / (col("tt") + B).cast("double")) -
           ln9((col("cq") + 1).cast("double") / (col("tq") + B).cast("double")))
            .cast("decimal(18,9)").as("lr"))
      tok.join(broadcast(wtab), "bucket")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"), sum(col("lr")).as("ws"))
        .orderBy(col("ws").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("lang"), col("n_toks"),
          round(col("ws").cast("double"), 6).as("weight"))
    }),

    // Corpus drift: KL(P_source ‖ P_corpus) over Laplace-smoothed hashed
    // unigram distributions (256 buckets) — the domain-shift number a
    // mixture-weights decision reads. The (source × bucket) grid is
    // generated (sources × 256 rows) so empty buckets contribute their
    // smoothed mass; both distributions come from ONE token scan and the
    // 256-row corpus table broadcasts. Per-bucket terms are 9 dp DECIMALs
    // summed exactly.
    "q113_kl_divergence" -> ((s, d) => {
      val B = KlBuckets
      val tok = documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .select(col("source"), (charFold(col("t")) % B).as("bucket"))
      val sc = tok.groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("cs"))
      val cc = tok.groupBy(col("bucket")).agg(count(lit(1)).as("cb"))
      val st = tok.groupBy(col("source")).agg(count(lit(1)).as("ts"))
      val tot = tok.agg(count(lit(1)).as("tc"))
      val grid = st.select(col("source"), col("ts"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("ts"), col("tc"),
          explode(sequence(lit(0L), lit(B - 1))).as("bucket"))
      val ps = (coalesce(col("cs"), lit(0L)) + 1).cast("double") /
        (col("ts") + B).cast("double")
      val pc = (coalesce(col("cb"), lit(0L)) + 1).cast("double") /
        (col("tc") + B).cast("double")
      grid
        .join(sc, Seq("source", "bucket"), "left")
        .join(broadcast(cc), Seq("bucket"), "left")
        .select(col("source"), col("ts"),
          round(ps * (ln9(ps) - ln9(pc)), 9).cast("decimal(18,9)").as("term"))
        .groupBy(col("source"))
        .agg(max(col("ts")).as("n_toks"),
             round(sum(col("term")).cast("double"), 6).as("kl"))
    }),

    // Product quantization: split each 64-dim embedding into 4 16-dim
    // subvectors, encode each against an 8-codeword codebook (nearest by
    // squared L2), and report per-(subspace, code) occupancy and summed
    // quantization error — the compressed-vector path an ANN index at
    // 100 TB stores (4 bytes/vector here vs 256 uncompressed). Codebooks
    // broadcast; encoding is a per-row chain inside the scan; the rollup
    // is one 32-group aggregate.
    "q114_pq_encode" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val subs = emb.select(
        col("vec_id") +: (0 until PqM).map(m =>
          slice(col("e"), m * PqSubDim + 1, PqSubDim).as(s"s$m")): _*)
      val cbCols = (0 until PqM).map(m =>
        transform(sort_array(collect_list(struct(col("vec_id"), col(s"s$m")))),
          x => x(s"s$m")).as(s"cb$m"))
      val cb = subs.filter(col("vec_id") < PqK).agg(cbCols.head, cbCols.tail: _*)
      val enc = subs.join(broadcast(cb))
        .select(col("vec_id") +: (0 until PqM).map(m =>
          pqNearest(col(s"s$m"), col(s"cb$m")).as(s"n$m")): _*)
      enc
        .select(col("vec_id"), explode(array((0 until PqM).map(m =>
          struct(lit(m).cast("int").as("sub"), col(s"n$m.bi").as("code"),
            col(s"n$m.bd").as("err"))): _*)).as("x"))
        .groupBy(col("x.sub").as("sub"), col("x.code").as("code"))
        .agg(count(lit(1)).as("n"),
             round(sum(round(col("x.err"), 9).cast("decimal(18,9)")).cast("double"), 6)
               .as("err_sum"))
    }),

    // SemDeDup: assign embeddings to IVF cells (q49's coarse quantizer),
    // compare pairs WITHIN each cell, and drop the higher vec_id of any
    // pair with cosine above the threshold — semantic dedup whose
    // candidate set is one cell, never all-pairs. The cell table is
    // checkpointed once and reused by both sides of the self-join and the
    // member counts; at 100 TB the self-join shuffles on cell and AQE
    // handles the skewed cells.
    "q115_semdedup" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val cents = emb.filter(col("vec_id") < 8)
        .agg(transform(sort_array(collect_list(struct(col("vec_id"), col("e")))),
          x => x("e")).as("cents"))
      val cells = emb.join(broadcast(cents))
        .select(col("vec_id"), col("e"),
          graft.ext.Similarity.ivfCell(col("e"), col("cents")).as("cell"))
        .localCheckpoint()
      val drops = cells.select(col("cell"), col("vec_id").as("va"), col("e").as("ea"))
        .join(cells.select(col("cell"), col("vec_id").as("vb"), col("e").as("eb")),
          Seq("cell"))
        .filter(col("va") < col("vb"))
        .filter(cosine(col("ea"), col("eb")) > SemThreshold)
        .select(col("cell"), col("vb")).distinct()
        .groupBy(col("cell")).agg(count(lit(1)).as("nd"))
      cells.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
        .join(drops, Seq("cell"), "left")
        .select(col("cell"), col("n_members"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"))
    }),

    // Interpolated bigram LM scoring (the CCNet/KenLM-style perplexity
    // filter): p(t₂|t₁) = λ·c(t₁t₂)/c(t₁·) + (1−λ)·(c(t₂)+1)/(T+V),
    // per-doc mean log-prob over its bigrams. The LM tables come from one
    // corpus pass and join back by term key — vocabulary-sized, so no
    // broadcast hints (AQE picks); the bigram join is an equi-join on the
    // pair key (at 100 TB every LM join hash-partitions on its key).
    // Per-position log-probs are 9 dp DECIMALs; the mean is one exact sum
    // and one IEEE division.
    "q116_bigram_lm" -> ((s, d) => bigramLmScores(s, d)),

    // CCNet's head/middle/tail split: score every document with the LM
    // (q116's interpolated bigram model — shared helper, so the
    // arithmetic cannot drift) and cut the corpus into perplexity
    // TERCILES; report per (bucket, lang) how many documents land
    // there and their mean score — the table that decides which third
    // of a crawl a training run keeps. The 100 TB shape: NO global-sort
    // window — ONE exact `percentile` aggregate over a scaled-integer
    // order key mints the two tercile cutoffs, and bucketing is a
    // per-row comparison against the broadcast 1-row cutoff table.
    //
    // Engine-portability of the cutoffs: the key k = cast(avg_logprob
    // as DECIMAL(16,6)) * 1e6 is an exact integer on both engines
    // (avg_logprob is already round(·,6), so the decimal cast is
    // lossless), and |k| < 2^53 so it survives the double math inside
    // percentile. Cutoff positions sit at HALF ranks, (k1−0.5)/(N−1),
    // so the interpolated cutoff lands strictly BETWEEN two adjacent
    // integer keys (or exactly ON a tied key) — every per-row `>`
    // comparison is then identical across engines no matter how each
    // one rounds the interpolation, and the oracle can use a plain
    // midpoint. Rank budget k1/k2 follows ntile-style sizes
    // (first N mod 3 buckets get one extra row); score ties that
    // straddle a boundary stay together in the better bucket — the
    // deterministic tie rule a cutoff-based split implies (CCNet's own
    // semantics: equal perplexity ⇒ same bucket).
    "q246_ccnet_buckets" -> ((s, d) => {
      val scored = bigramLmScores(s, d)
        .join(documents(s, d).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .withColumn("k",
          (col("avg_logprob").cast("decimal(16,6)") * lit(1000000))
            .cast("long"))
        .localCheckpoint()
      val n = scored.count()
      val grouped =
        if (n < 3) scored.withColumn("bucket", lit(1L)) // degenerate corpus
        else {
          val q3 = n / 3; val r3 = n % 3
          val k1 = q3 + (if (r3 >= 1) 1L else 0L)
          val k2 = k1 + q3 + (if (r3 >= 2) 1L else 0L)
          val p1 = (k1 - 0.5) / (n - 1).toDouble
          val p2 = (k2 - 0.5) / (n - 1).toDouble
          // neg key: ascending = best score first, matching desc rank.
          val cuts = scored
            .agg(percentile(-col("k"), array(lit(p1), lit(p2))).as("cs"))
          val negk = -col("k").cast("double")
          scored.join(broadcast(cuts))
            .withColumn("bucket",
              (lit(1) + when(negk > col("cs").getItem(0), 1).otherwise(0)
                      + when(negk > col("cs").getItem(1), 1).otherwise(0))
                .cast("long"))
        }
      grouped
        .groupBy(col("bucket"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          round(sum(col("avg_logprob").cast("decimal(18,6)"))
            .cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_logprob"))
    }),

    // Quality-filter evaluation: sweep the q26 quality score against a
    // gold label (lang = 'en' — the slice the stopword profile targets)
    // over a fixed threshold grid and report the confusion counts +
    // precision/recall/F1 per threshold. One scan fanned out ×5 by a
    // literal threshold array, one 5-group aggregate — the calibration
    // table that decides a filter's operating point before a 100 TB run.
    "q117_filter_eval" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val scored = documents(s, d).select(
        TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("score"),
        (col("lang") === "en").as("gold"))
      val thr = explode(array(EvalThresholds.map(t => lit(t)): _*)).as("thr")
      val p = col("tp").cast("double") / nullif(col("tp") + col("fp"), lit(0L)).cast("double")
      val r = col("tp").cast("double") / nullif(col("tp") + col("fn"), lit(0L)).cast("double")
      scored.select(col("score"), col("gold"), thr)
        .groupBy(col("thr"))
        .agg(sum(when(col("score") >= col("thr") && col("gold"), 1L).otherwise(0L)).as("tp"),
             sum(when(col("score") >= col("thr") && !col("gold"), 1L).otherwise(0L)).as("fp"),
             sum(when(col("score") < col("thr") && col("gold"), 1L).otherwise(0L)).as("fn"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"),
          p.as("precision"), r.as("recall"),
          (lit(2.0) * p * r / nullif(p + r, lit(0.0))).as("f1"))
    }),

    // Range-shard planner: exact interpolated octile boundaries over the
    // content-hash key, then assign every document to its shard and
    // report per-shard occupancy/weight — the boundary table a 100 TB
    // global sort (or a range-bucketed layout) is planned from. One
    // percentile aggregate (7-row result, broadcast back), one per-row
    // fold for assignment, one 8-group rollup. The boundaries are exact
    // doubles (integer keys, eighth-fractions), so both engines agree
    // bit-for-bit.
    "q118_range_shards" -> ((s, d) => {
      val ps = (1 until NumShards).map(i => i.toDouble / NumShards)
      val keyed = documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          TextAnalysis.fingerprint(col("text")).as("k"))
      val bnds = keyed.agg(
        expr(s"percentile(k, array(${ps.mkString(", ")}))").as("bnds"))
      keyed.join(broadcast(bnds))
        .select(col("n_chars"), col("k"),
          aggregate(col("bnds"), lit(0L),
            (acc, b) => acc + when(b <= col("k").cast("double"), 1L).otherwise(0L))
            .as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
             min(col("k")).as("k_min"), max(col("k")).as("k_max"))
    }),

    // IVF-PQ with exact re-rank — the production 100 TB ANN composition of
    // q49 (coarse cells), q114 (PQ codebooks) and q119's probe idea:
    // (1) probe the query's NProbe best coarse cells by centroid score,
    // (2) PQ asymmetric-distance-score ONLY the probed cells' vectors
    // (codes via pqNearest, distance query-subvector -> codeword),
    // (3) exact cosine re-rank of the RerankR-deep shortlist, top-10.
    // Reported as recall@10 vs the brute-force relation (q53's metric) so
    // the approximation is measured, not asserted. Plan shape (asserted in
    // PlanShapeSpec): centroids + codebooks + query + probe list are all
    // 1-to-NProbe-row broadcast frames, the corpus scan never shuffles,
    // and both top-k's are TakeOrderedAndProject over candidate-bounded
    // inputs — no global sort, no all-pairs.
    "q152_ivfpq" -> ((s, d) => {
      import graft.ext.Similarity
      val emb = embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .localCheckpoint() // consumers: registers, cell scan, brute force
      val cents = emb.filter(col("vec_id") < 8)
        .agg(transform(sort_array(collect_list(struct(col("vec_id"), col("e")))),
          x => x("e")).as("cents"))
      val subs = emb.select(
        col("vec_id") +: (0 until PqM).map(m =>
          slice(col("e"), m * PqSubDim + 1, PqSubDim).as(s"s$m")): _*)
      val cbCols = (0 until PqM).map(m =>
        transform(sort_array(collect_list(struct(col("vec_id"), col(s"s$m")))),
          x => x(s"s$m")).as(s"cb$m"))
      val cb = subs.filter(col("vec_id") < PqK).agg(cbCols.head, cbCols.tail: _*)
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      // (1) coarse probe: score each centroid with ivfCell's exact scoring
      // rule (dot/‖c‖ — argmax-invariant in the query norm), keep NProbe
      val cscore = {
        val c = element_at(col("cents"), col("ci"))
        dotFold(col("qe"), c) / nullif(sqrt(dotFold(c, c)), lit(0.0))
      }
      val probes = q.crossJoin(broadcast(cents))
        .select(col("qe"), col("cents"),
          explode(sequence(lit(1), size(col("cents")))).as("ci"))
        .select(col("ci").cast("int").as("pcell"), cscore.as("cs"))
        .orderBy(col("cs").desc, col("pcell")).limit(NProbe)
        .select(col("pcell"))
      // (2) cell-assign the corpus (per-row chain), keep probed cells only,
      // PQ-ADC score them: distance(query subvector, assigned codeword)
      val cand = emb.filter(col("vec_id") =!= 0)
        .join(broadcast(cents))
        .select(col("vec_id"), col("e"),
          Similarity.ivfCell(col("e"), col("cents")).as("cell"))
        .join(broadcast(probes), col("cell") === col("pcell"))
      val adist = (0 until PqM).map { m =>
        val sub = slice(col("e"), m * PqSubDim + 1, PqSubDim)
        val qsub = slice(col("qe"), m * PqSubDim + 1, PqSubDim)
        l2(qsub, element_at(col(s"cb$m"), pqNearest(sub, col(s"cb$m"))("bi")))
      }.reduce(_ + _)
      val scored = cand.join(broadcast(cb)).join(broadcast(q))
        .select(col("vec_id"), col("e"), col("qe"), adist.as("adist"))
        .localCheckpoint() // candidate count + shortlist share one pass
      // (3) shortlist by approximate distance, exact re-rank on it only.
      // Both stages keep the Limit(Project(Sort)) shape with PRUNING-only
      // projections (a computed projection between the limits gets pushed
      // around by the optimizer and demotes the pattern to a global
      // sort+limit); the exact cosine lives INSIDE the re-rank's SortOrder,
      // so it is evaluated only while top-10-scanning the RerankR rows
      val short = scored.orderBy(col("adist").asc, col("vec_id"))
        .select(col("vec_id"), col("e"), col("qe"))
        .limit(RerankR)
      val rer = short
        .orderBy(cosine(col("e"), col("qe")).desc, col("vec_id"))
        .select(col("vec_id"))
        .limit(10)
      val brute = emb.join(broadcast(q)).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosine(col("e"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .select(col("vec_id"))
      val common = rer.join(brute, "vec_id")
      scored.agg(count(lit(1)).as("n_cand"))
        .crossJoin(short.agg(count(lit(1)).as("n_short")))
        .crossJoin(common.agg(count(lit(1)).as("n_common")))
        .select(col("n_cand"), col("n_short"), col("n_common"),
          (col("n_common").cast("double") / lit(10.0)).as("recall"))
    }),
  )

  val oracle: Map[String, String] = {
    val tokSql = tokensSql("text")
    // q116's per-doc LM score — also the CTE inside q246's bucket split
    val bigramLmSql = {
      val lam = LmLambda
      s"""WITH base AS (
            SELECT doc_id, tk, len(tk)::BIGINT AS n FROM (
              SELECT doc_id, $tokSql AS tk FROM documents)
            WHERE len(tk) >= 2),
          big AS (SELECT doc_id, tk[i] AS t1, tk[i + 1] AS t2 FROM (
                    SELECT doc_id, tk, unnest(range(1, n)) AS i FROM base)),
          bc AS (SELECT t1, t2, count(*)::BIGINT AS cb FROM big GROUP BY 1, 2),
          pfx AS (SELECT t1, count(*)::BIGINT AS cp FROM big GROUP BY 1),
          uni AS (SELECT t AS t2, count(*)::BIGINT AS cu FROM (
                    SELECT unnest($tokSql) AS t FROM documents) GROUP BY 1),
          tv AS (SELECT sum(cu)::BIGINT AS tu, count(*)::BIGINT AS v FROM uni),
          terms AS (
            SELECT doc_id,
                   CAST(${ln9Sql(
                     s"$lam * (cb::DOUBLE / cp::DOUBLE) + ${1.0 - lam} * " +
                     s"((cu + 1)::DOUBLE / (tu + v)::DOUBLE)")}
                     AS DECIMAL(18,9)) AS lp
            FROM big JOIN bc USING (t1, t2) JOIN pfx USING (t1)
              JOIN uni USING (t2), tv)
          SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                 round(CAST(sum(lp) AS DOUBLE) / count(*)::DOUBLE, 6) AS avg_logprob
          FROM terms GROUP BY 1"""
    }
    Map(
      "q111_dsir" -> {
        val B = DsirBuckets
        s"""WITH tok AS (
              SELECT doc_id, lang, ${charFoldSql("t")} % $B AS bucket
              FROM (SELECT doc_id, lang, unnest($tokSql) AS t FROM documents)),
            counts AS (
              SELECT bucket, count(*)::BIGINT AS cq,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
              FROM tok GROUP BY 1),
            totals AS (SELECT sum(cq)::BIGINT AS tq, sum(ct)::BIGINT AS tt FROM counts),
            wtab AS (
              SELECT bucket,
                     CAST(${ln9Sql(s"(ct + 1)::DOUBLE / (tt + $B)::DOUBLE")} -
                          ${ln9Sql(s"(cq + 1)::DOUBLE / (tq + $B)::DOUBLE")}
                       AS DECIMAL(18,9)) AS lr
              FROM counts, totals),
            perdoc AS (
              SELECT doc_id, lang, count(*)::BIGINT AS n_toks, sum(lr) AS ws
              FROM tok JOIN wtab USING (bucket)
              GROUP BY 1, 2)
            SELECT doc_id, lang, n_toks, round(ws::DOUBLE, 6) AS weight
            FROM perdoc
            ORDER BY ws DESC, doc_id LIMIT 100"""
      },
      "q113_kl_divergence" -> {
        val B = KlBuckets
        s"""WITH tok AS (
              SELECT source, ${charFoldSql("t")} % $B AS bucket
              FROM (SELECT source, unnest($tokSql) AS t FROM documents)),
            sc AS (SELECT source, bucket, count(*)::BIGINT AS cs
                   FROM tok GROUP BY 1, 2),
            cc AS (SELECT bucket, count(*)::BIGINT AS cb FROM tok GROUP BY 1),
            st AS (SELECT source, count(*)::BIGINT AS ts FROM tok GROUP BY 1),
            tot AS (SELECT count(*)::BIGINT AS tc FROM tok),
            grid AS (SELECT source, ts, tc, r.range AS bucket
                     FROM st, tot, range(0, $B) r),
            terms AS (
              SELECT source, ts,
                     CAST(round(
                       ((coalesce(cs, 0) + 1)::DOUBLE / (ts + $B)::DOUBLE) *
                       (${ln9Sql(s"(coalesce(cs, 0) + 1)::DOUBLE / (ts + $B)::DOUBLE")} -
                        ${ln9Sql(s"(coalesce(cb, 0) + 1)::DOUBLE / (tc + $B)::DOUBLE")}),
                       9) AS DECIMAL(18,9)) AS term
              FROM grid
              LEFT JOIN sc USING (source, bucket)
              LEFT JOIN cc USING (bucket))
            SELECT source, max(ts)::BIGINT AS n_toks,
                   round(CAST(sum(term) AS DOUBLE), 6) AS kl
            FROM terms GROUP BY 1"""
      },
      "q114_pq_encode" -> {
        val slices = (0 until PqM).map { m =>
          s"v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS s$m"
        }.mkString(", ")
        val cbs = (0 until PqM).map { m =>
          s"list(s$m ORDER BY vec_id) AS cb$m"
        }.mkString(", ")
        val encs = (0 until PqM).map { m =>
          s"${pqNearestSql(s"s$m", s"cb$m")} AS n$m"
        }.mkString(", ")
        val unions = (0 until PqM).map { m =>
          s"SELECT vec_id, $m::INT AS sub, n$m.bi AS code, n$m.bd AS err FROM enc"
        }.mkString(" UNION ALL ")
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS v FROM embeddings),
            subs AS (SELECT vec_id, $slices FROM e),
            cb AS (SELECT $cbs FROM subs WHERE vec_id < $PqK),
            enc AS (SELECT vec_id, $encs FROM subs, cb),
            flat AS ($unions)
            SELECT sub, code, count(*)::BIGINT AS n,
                   round(CAST(sum(CAST(round(err, 9) AS DECIMAL(18,9))) AS DOUBLE), 6)
                     AS err_sum
            FROM flat GROUP BY 1, 2"""
      },
      "q115_semdedup" -> {
        import graft.ext.Similarity
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS v FROM embeddings),
            c AS (SELECT list(v ORDER BY vec_id) AS cents FROM e WHERE vec_id < 8),
            cells AS (SELECT vec_id, v,
                        ${Similarity.ivfCellSql("e.v", "c.cents")} AS cell
                      FROM e, c),
            drops AS (
              SELECT cell, count(DISTINCT vb)::BIGINT AS nd FROM (
                SELECT a.cell AS cell, b.vec_id AS vb
                FROM cells a JOIN cells b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                WHERE ${cosineSql("a.v", "b.v")} > $SemThreshold)
              GROUP BY 1)
            SELECT m.cell, m.n_members, coalesce(drops.nd, 0)::BIGINT AS n_dropped
            FROM (SELECT cell, count(*)::BIGINT AS n_members
                  FROM cells GROUP BY 1) m
            LEFT JOIN drops USING (cell)"""
      },
      "q116_bigram_lm" -> bigramLmSql,

      // Cutoff equivalence with the Spark plan: Spark's exact percentile
      // at half-rank positions yields a value strictly between the two
      // adjacent integer keys (or exactly the tied key); the oracle's
      // plain midpoint of the same two rank values lies in the same open
      // interval, so every integer-key comparison agrees bit-for-bit.
      "q246_ccnet_buckets" ->
        s"""WITH scored0 AS ($bigramLmSql),
              scored AS (
                SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logprob,
                       CAST(CAST(s.avg_logprob AS DECIMAL(16,6)) * 1000000
                         AS BIGINT) AS k
                FROM scored0 s JOIN documents d ON s.doc_id = d.doc_id),
              ks AS (
                SELECT n, n // 3 + CASE WHEN n % 3 >= 1 THEN 1 ELSE 0 END AS k1,
                       2 * (n // 3) + CASE WHEN n % 3 >= 1 THEN 1 ELSE 0 END
                                    + CASE WHEN n % 3 >= 2 THEN 1 ELSE 0 END AS k2
                FROM (SELECT count(*)::BIGINT AS n FROM scored)),
              ranked AS (
                SELECT k, row_number() OVER (ORDER BY k DESC) AS rk FROM scored),
              cuts AS (
                SELECT
                  -(((SELECT k FROM ranked WHERE rk = ks.k1)::DOUBLE
                   + (SELECT k FROM ranked WHERE rk = ks.k1 + 1)::DOUBLE) / 2.0)
                    AS c1,
                  -(((SELECT k FROM ranked WHERE rk = ks.k2)::DOUBLE
                   + (SELECT k FROM ranked WHERE rk = ks.k2 + 1)::DOUBLE) / 2.0)
                    AS c2
                FROM ks),
              bucketed AS (
                -- n < 3 mirrors the Spark degenerate branch: all rows in
                -- bucket 1 (otherwise the NULL rank-(k2+1) subquery would
                -- leave only one binding cutoff and split 2 rows across
                -- buckets 1 and 2 — r17 ADVICE)
                SELECT (CASE WHEN ks.n < 3 THEN 1
                        ELSE 1 + CASE WHEN -(k::DOUBLE) > c1 THEN 1 ELSE 0 END
                             + CASE WHEN -(k::DOUBLE) > c2 THEN 1 ELSE 0 END
                        END)::BIGINT AS bucket,
                       lang, n_bigrams, avg_logprob
                FROM scored, cuts, ks)
           SELECT bucket, lang, count(*)::BIGINT AS n_docs,
                  sum(n_bigrams)::BIGINT AS n_bigrams,
                  round(CAST(sum(CAST(avg_logprob AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*)::DOUBLE, 6) AS mean_logprob
           FROM bucketed GROUP BY 1, 2""",
      "q117_filter_eval" -> {
        import graft.ext.TextAnalysis
        val nTok = s"len($tokSql)::BIGINT"
        val stopN = TextAnalysis.countInSql(tokSql, TextAnalysis.LangProfiles.head._2)
        val score = TextAnalysis.qualityScoreSql(nTok, stopN, "length(text)")
        val grid = EvalThresholds.map(t => s"($t::DOUBLE)").mkString(", ")
        s"""WITH scored AS (
              SELECT $score AS score, (lang = 'en') AS gold FROM documents),
            fan AS (SELECT score, gold, t.thr FROM scored,
                      (SELECT unnest([$grid]) AS thr) t),
            agg AS (
              SELECT thr,
                     sum(CASE WHEN score >= thr AND gold THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN score >= thr AND NOT gold THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN score < thr AND gold THEN 1 ELSE 0 END)::BIGINT AS fn
              FROM fan GROUP BY 1)
            SELECT thr, tp, fp, fn,
                   tp::DOUBLE / nullif(tp + fp, 0)::DOUBLE AS precision,
                   tp::DOUBLE / nullif(tp + fn, 0)::DOUBLE AS recall,
                   2.0 * (tp::DOUBLE / nullif(tp + fp, 0)::DOUBLE) *
                     (tp::DOUBLE / nullif(tp + fn, 0)::DOUBLE) /
                     nullif(tp::DOUBLE / nullif(tp + fp, 0)::DOUBLE +
                            tp::DOUBLE / nullif(tp + fn, 0)::DOUBLE, 0.0) AS f1
            FROM agg"""
      },
      "q118_range_shards" -> {
        val ps = (1 until NumShards).map(i => i.toDouble / NumShards)
        s"""WITH keyed AS (
              SELECT doc_id, n_chars, ${charFoldSql("text")} AS k FROM documents),
            b AS (SELECT quantile_cont(k, [${ps.mkString(", ")}]) AS bnds FROM keyed),
            assigned AS (
              SELECT n_chars, k,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(b.bnds,
                         qb -> CASE WHEN qb <= k::DOUBLE THEN 1::BIGINT
                                    ELSE 0::BIGINT END)),
                       (qp, qq) -> qp + qq) AS shard
              FROM keyed, b)
            SELECT shard, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars,
                   min(k)::BIGINT AS k_min, max(k)::BIGINT AS k_max
            FROM assigned GROUP BY 1"""
      },
      "q152_ivfpq" -> {
        import graft.ext.Similarity
        val slices = (0 until PqM).map { m =>
          s"v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS s$m"
        }.mkString(", ")
        val cbs = (0 until PqM).map { m =>
          s"list(s$m ORDER BY vec_id) AS cb$m"
        }.mkString(", ")
        def score(c: String) =
          s"${dotFoldSql("qv", c)} / nullif(sqrt(${dotFoldSql(c, c)}), 0.0)"
        val adist = (0 until PqM).map { m =>
          val qsub = s"q.qv[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}]"
          val sub = s"cand.v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}]"
          l2Sql(qsub, s"(cb.cb$m)[(${pqNearestSql(sub, s"cb.cb$m")}).bi]")
        }.mkString("(", " + ", ")")
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS v FROM embeddings),
            c AS (SELECT list(v ORDER BY vec_id) AS cents FROM e WHERE vec_id < 8),
            subs AS (SELECT vec_id, $slices FROM e),
            cb AS (SELECT $cbs FROM subs WHERE vec_id < $PqK),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            probes AS (
              SELECT pcell FROM (
                SELECT ci AS pcell, ${score("(cents)[ci]")} AS cs
                FROM (SELECT unnest(range(1, len(c.cents) + 1)) AS ci,
                             c.cents AS cents, q.qv AS qv
                      FROM c, q))
              ORDER BY cs DESC, pcell LIMIT $NProbe),
            cand AS (
              SELECT vec_id, v FROM (
                SELECT vec_id, v, ${Similarity.ivfCellSql("e.v", "c.cents")} AS cell
                FROM e, c WHERE vec_id <> 0) cells
              JOIN probes ON cells.cell = probes.pcell),
            scored AS (SELECT vec_id, v, $adist AS adist FROM cand, cb, q),
            short AS (
              SELECT vec_id, ${cosineSql("scored.v", "q.qv")} AS sim
              FROM scored, q ORDER BY adist ASC, vec_id LIMIT $RerankR),
            rer AS (SELECT vec_id FROM short ORDER BY sim DESC, vec_id LIMIT 10),
            brute AS (
              SELECT vec_id FROM (
                SELECT vec_id, ${cosineSql("e.v", "q.qv")} AS sim
                FROM e, q WHERE vec_id <> 0
                ORDER BY sim DESC, vec_id LIMIT 10))
            SELECT (SELECT count(*) FROM scored)::BIGINT AS n_cand,
                   (SELECT count(*) FROM short)::BIGINT AS n_short,
                   (SELECT count(*) FROM rer JOIN brute USING (vec_id))::BIGINT
                     AS n_common,
                   (SELECT count(*) FROM rer JOIN brute USING (vec_id))::DOUBLE
                     / 10.0 AS recall"""
      },
    )
  }
}
