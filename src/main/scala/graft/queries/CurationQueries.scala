package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Dedup, TextAnalysis}

/** Corpus-curation operators — the training-data pipeline stages that sit
  * between raw crawl and tokenizer: deterministic stratified sampling,
  * passage-level duplication scoring, URL canonicalization, sessionization,
  * quantile-based quality filtering, duplicate-cluster resolution
  * (connected components), and TF-IDF keyword extraction.
  *
  * Scale notes per operator are inline; the shared design rule is the same
  * as LlmQueries: per-row work stays in codegen'd scalar chains, every
  * shuffle is on an explicit key, and iterative algorithms (q65) converge
  * in O(diameter) distributed rounds with a driver-side loop only for the
  * fixpoint test.
  */
object CurationQueries {

  /** Per-language keep-rate (percent) for deterministic stratified
    * sampling: downsample the dominant language, keep the tail.
    * Shared by the Spark plan and the generated oracle SQL. */
  val SampleRates: Seq[(String, Int)] = Seq(
    "en" -> 25, "de" -> 75, "es" -> 75, "fr" -> 75, "zh" -> 75)
  val SampleRateDefault = 50

  /** Passage chunk size (tokens) for passage-level duplication scoring. */
  val ChunkLen = 3

  /** Session gap: a new session starts after > 4 h of user inactivity. */
  val SessionGapMicros: Long = 4L * 3600 * 1000000

  private def rateFor(lang: Column): Column =
    SampleRates.foldRight(lit(SampleRateDefault): Column) {
      case ((l, r), els) => when(lang === l, lit(r)).otherwise(els)
    }
  private def rateForSql(lang: String): String =
    SampleRates.map { case (l, r) => s"WHEN $lang = '$l' THEN $r" }
      .mkString("CASE ", " ", s" ELSE $SampleRateDefault END")

  /** Fold a chunk of ChunkLen token hashes into one passage hash — the
    * same polynomial mix combineAdjacent uses for 2-shingles. */
  private def passageHashes(th: Column): Column = {
    val nc = floor(size(th) / lit(ChunkLen)).cast("int")
    transform(sequence(lit(0), nc - 1), k =>
      aggregate(slice(th, k * ChunkLen + 1, lit(ChunkLen)), lit(0L),
        (a, x) => (a * Dedup.ShingleMix + x) % FoldMod))
  }
  private def passageHashesSql(th: String): String =
    s"list_transform(range(0, len($th) // $ChunkLen), pk -> " +
      s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_slice($th, pk*$ChunkLen + 1, pk*$ChunkLen + $ChunkLen)), " +
      s"(pa, pb) -> (pa * ${Dedup.ShingleMix} + pb) % $FoldMod))"

  /** Synthetic raw URL per event (the corpus has no URL column; the
    * canonicalization machinery is the operator — mixed-case scheme/host,
    * `www.` prefix, trailing slash, tracking params, all to be stripped). */
  private def rawUrl: Column =
    concat(lit("HTTPS://WWW.Shop"), (col("user_id") % 20).cast("string"),
      lit(".Example.COM/Item/"), (col("event_id") % 500).cast("string"),
      lit("/?Utm_Source=Feed&Ref="), col("event_type"))
  private val rawUrlSql =
    "'HTTPS://WWW.Shop' || CAST(user_id % 20 AS VARCHAR) || " +
      "'.Example.COM/Item/' || CAST(event_id % 500 AS VARCHAR) || " +
      "'/?Utm_Source=Feed&Ref=' || event_type"

  /** Near-dup edge list (da < db, exact Jaccard >= 0.5): exactly q52's
    * verified-LSH table (Dedup.verifiedPairs — one definition, no drift),
    * projected to the pair columns. */
  private def nearDupEdges(s: SparkSession, d: String): DataFrame =
    Dedup.verifiedPairs(s, d).select(col("da"), col("db"))

  /** Connected-component labels (node → min-doc_id label) over the
    * verified near-dup graph; shared by q65 and q71. Iterative min-label
    * propagation — one distributed join+aggregate per round, driver loop
    * only for the fixpoint test.
    *
    * The label frame is CACHED per (session, sfDir): it is already a
    * localCheckpoint (materialized), and both consumers reuse the same
    * lineage — the "write the intermediate once, run N jobs against it"
    * shape a 100 TB dedup pipeline uses between its cluster and winner
    * stages. */
  private val ccCache = new graft.SessionCache

  private def ccLabels(s: SparkSession, d: String): DataFrame =
    ccCache.getOrElseUpdate(s, d) { ccLabelsUncached(s, d) }

  private def ccLabelsUncached(s: SparkSession, d: String): DataFrame = {
    val edges = nearDupEdges(s, d).localCheckpoint()
    val bidir = edges.select(col("da").as("src"), col("db").as("dst"))
      .union(edges.select(col("db").as("src"), col("da").as("dst")))
      .localCheckpoint()
    var lbl = bidir.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    val maxIter = 20
    while (changed > 0 && it < maxIter) {
      val nbMin = bidir
        .join(lbl.select(col("node").as("nb"), col("lbl").as("nlbl")),
              col("dst") === col("nb"))
        .groupBy(col("src"))
        .agg(min(col("nlbl")).as("nmin"))
      // carry the previous label through the propagation join so the
      // fixpoint test is a filter+count over the SAME materialized frame
      // (one distributed round per iteration, not two)
      val next = lbl
        .join(nbMin, col("node") === col("src"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      // per-round DRIVER action: ONE scalar count over the already-
      // materialized round frame (the fixpoint test label propagation
      // inherently needs); ≤ maxIter rounds, never row-sized traffic
      changed = next.filter(col("lbl") =!= col("old")).count()
      lbl = next.select(col("node"), col("lbl"))
      it += 1
    }
    // fail LOUDLY on non-convergence: returning (and caching) partial
    // labels would silently split one real component into several
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds " +
        s"($changed labels still changing) — component diameter exceeds the cap")
    lbl
  }

  /** Per-document quality scores (q26's formula), reused by q71. */
  private def qualityScored(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
    documents(s, d).select(col("doc_id"),
      TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("quality"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic stratified sampling: keep a document iff its CONTENT
    // hash falls under the language's keep-rate. Reproducible (re-runs and
    // re-partitions keep the same rows — no rand()), stratified (per-lang
    // rates rebalance the corpus). Per-row scalar chain, zero shuffle; at
    // 100 TB this pipelines inside the scan.
    "q60_stratified_sample" -> ((s, d) => {
      val bucket = TextAnalysis.fingerprint(col("text")) % 100
      documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), bucket.as("bucket"))
        .filter(col("bucket") < rateFor(col("lang")))
    }),

    // Passage-level duplication scoring: split each document into
    // ChunkLen-token passages, hash each, count cross-document passage
    // occurrences, and score each document by the fraction of its passages
    // that also appear in ANOTHER document. The per-doc dup_ratio is the
    // standard "duplicated passage fraction" filter signal. Two shuffles:
    // passage-hash aggregate, then per-doc rollup — both on explicit keys.
    "q61_passage_dedup" -> ((s, d) => {
      val toks = tokens(col("text"))
      val chunks = documents(s, d).filter(size(toks) >= ChunkLen)
        .select(col("doc_id"), transform(toks, t => charFold(t)).as("th"))
        .select(col("doc_id"), explode(passageHashes(col("th"))).as("ph"))
      val freq = chunks.groupBy("ph")
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(freq, "ph")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"))
    }),

    // URL canonicalization + rollup: lowercase, strip scheme and `www.`,
    // drop the query string (tracking params), strip the trailing slash,
    // then aggregate per (domain, url_norm). The canonical web-crawl dedup
    // key. Scalar regex chain + one hash-aggregate shuffle.
    "q62_url_normalize" -> ((s, d) => {
      // layered selects: the lowered URL and the extracted domain are each
      // referenced more than once downstream — materializing them per layer
      // keeps the regex work at one evaluation per row (CollapseProject
      // declines to inline multiply-referenced non-cheap expressions)
      events(s, d)
        .select(lower(rawUrl).as("l"), col("user_id"))
        .select(
          regexp_replace(
            regexp_extract(col("l"), "https://([^/]+)/", 1), "^www\\.", "").as("domain"),
          regexp_replace(
            regexp_extract(col("l"), "https://[^/]+([^?]*)", 1), "/$", "").as("path"),
          col("user_id"))
        .select(col("domain"), concat(col("domain"), col("path")).as("url_norm"),
                col("user_id"))
        .groupBy(col("domain"), col("url_norm"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
    }),

    // Sessionization (gaps-and-islands): a session = consecutive events of
    // one user with gaps <= 4 h. lag + running sum over one (user_id)
    // window — a single shuffle on user_id; state is per-user and bounded.
    "q63_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(gap.isNull || gap > SessionGapMicros, 1L).otherwise(0L).as("is_new"))
        .select(col("user_id"), col("ts"),
          sum(col("is_new")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("session_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             min(unix_seconds(col("ts"))).as("start_s"),
             max(unix_seconds(col("ts"))).as("end_s"))
    }),

    // Quantile-threshold quality filter: per-language exact p25 of the
    // composite quality score; report the threshold and how much of the
    // stratum survives. Quality is a per-row scalar; the filter re-scans
    // with a broadcast threshold join. NOTE exact percentile() buffers a
    // group's values in the aggregation state — fine at oracle scale, but
    // at 100 TB the swap is approx_percentile (t-digest, bounded state)
    // with the same two-scan broadcast-threshold topology.
    "q64_quality_quantile" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val scored = documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("quality"))
      val thr = scored.groupBy(col("lang"))
        .agg(round(expr("percentile(quality, 0.25)"), 9).as("thr"))
      scored.join(broadcast(thr), "lang")
        .groupBy(col("lang"))
        .agg(min(col("thr")).as("p25"),
             count(lit(1)).as("n_total"),
             sum(when(col("quality") >= col("thr"), 1L).otherwise(0L)).as("n_kept"))
    }),

    // Duplicate-cluster resolution: connected components over the verified
    // near-dup pair graph (LSH edges, Jaccard >= 0.5), labels = min doc_id
    // per component. Iterative min-label propagation: each round is one
    // distributed join+aggregate (the large-star/small-star pattern); the
    // driver loop only tests the fixpoint. Rounds ~ O(component diameter)
    // — near-dup clusters are shallow, so this converges in a handful of
    // rounds even at 100 TB.
    "q65_dedup_clusters" -> ((s, d) => {
      val lbl = ccLabels(s, d)
      val sizes = lbl.groupBy(col("lbl").as("cid"))
        .agg(count(lit(1)).as("cluster_size"))
      lbl.join(sizes, col("lbl") === col("cid"))
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
                col("cluster_size"))
    }),

    // Cluster SIZE distribution — the shape diagnostic a dedup run logs:
    // how many near-dup components exist at each size, and how many
    // documents they absorb. A heavy tail here means template families
    // (one giant component), not pairwise dupes — different remediation.
    // Two aggregates over the shared cached label frame.
    "q141_cluster_sizes" -> ((s, d) =>
      ccLabels(s, d)
        .groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("cluster_size") * col("n_clusters"))),

    // Cluster winner selection — the step after duplicate clustering:
    // keep the highest-quality document per near-dup cluster (the
    // "canonical representative" a dedup pipeline retains). One window
    // over the (tiny) clustered subset.
    "q71_cluster_winners" -> ((s, d) => {
      val lbl = ccLabels(s, d)
      val w = Window.partitionBy(col("lbl"))
        .orderBy(col("quality").desc, col("doc_id"))
      lbl.join(qualityScored(s, d), col("node") === col("doc_id"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
             max(when(col("rk") === 1, col("doc_id"))).as("winner_doc"),
             max(when(col("rk") === 1, col("quality"))).as("winner_quality"))
    }),

    // Dedup APPLIED end-to-end: the keep-list = every document outside the
    // near-dup graph plus one representative per connected component (the
    // component label IS its min doc_id, so the representative is the doc
    // whose id equals its label — no extra ranking pass). Reported as the
    // per-language before/after corpus counts a curation run logs. The
    // label table is the same cached frame q65/q71 consume; the apply step
    // is one left join on doc_id over the corpus scan — the label table
    // is dup-population-sized (worst case O(corpus) on a duplicate-heavy
    // crawl), so no broadcast hint: AQE picks from its measured size.
    "q112_dedup_apply" -> ((s, d) => {
      val lbl = ccLabels(s, d)
      documents(s, d)
        .join(lbl, col("doc_id") === col("node"), "left")
        .select(col("lang"),
          (col("lbl").isNull || col("lbl") === col("doc_id")).as("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_before"),
             sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
             sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"))
    }),

    // One k-means (Lloyd) refinement step over the IVF coarse cells:
    // assign every vector to its nearest centroid (q49's quantizer), then
    // recompute each cell's centroid as the mean of its members. The mean
    // is a SORTED sequential fold (vec_id order) so the doubles are
    // bit-identical cross-engine; at 100 TB the oracle-parity fold gives
    // way to a tree aggregation per cell, same assignment topology
    // (broadcast centroids, one shuffle on cell).
    "q70_kmeans_step" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val cents = emb.filter(col("vec_id") < 8)
        .agg(transform(sort_array(collect_list(struct(col("vec_id"), col("e")))),
          x => x("e")).as("cents"))
      val assigned = emb.join(broadcast(cents))
        .select(col("vec_id"), col("e"),
          graft.ext.Similarity.ivfCell(col("e"), col("cents")).as("cell"))
      val agg = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
             transform(sort_array(collect_list(struct(col("vec_id"), col("e")))),
               x => x("e")).as("vs"))
      val zeros = array_repeat(lit(0.0), 64)
      agg
        .select(col("cell"), col("n"),
          transform(
            aggregate(col("vs"), zeros, (acc, v) => zip_with(acc, v, (a, b) => a + b)),
            x => x / col("n").cast("double")).as("c"))
        .select(col("cell"), col("n"), posexplode(col("c")))
        .select(col("cell"), col("n"), (col("pos") + 1).cast("long").as("dim"),
                col("col").as("v"))
    }),

    // Adjacent-pair frequency count — the first merge step of BPE-style
    // tokenizer training: count every adjacent token pair across the
    // corpus, keep the global top-20. explode + one hash-aggregate +
    // TakeOrderedAndProject (top-k never materializes the full sort).
    // Deterministic boundary: ties ordered by pair text.
    "q68_bpe_pairs" -> ((s, d) => {
      val toks = tokens(col("text"))
      // tk materialized first — shingles2's element_at over an
      // unmaterialized tokens() would re-split the text per shingle (O(n²))
      documents(s, d).filter(size(toks) >= 2)
        .select(toks.as("tk"))
        .select(explode(Dedup.shingles2(col("tk"))).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    }),

    // Exact-k stratified selection: the top 20 documents per language by
    // content-hash order — the deterministic "take k per stratum" sampler
    // (vs q60's rate-based thinning). One window shuffle on the stratum
    // key; at 100 TB strata are few and the per-stratum top-k is a
    // TakeOrdered within each partition group.
    "q69_stratified_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("fp"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
    }),

    // Corpus snapshot diff: FULL OUTER reconciliation of two corpus
    // versions (derived deterministically: "old" drops doc_id % 5 == 0,
    // "new" drops % 7 == 0 and revises % 11 == 0) by content fingerprint —
    // the added/removed/changed/unchanged audit an incremental ingest
    // publishes per snapshot. One full-outer hash join on doc_id.
    "q80_corpus_diff" -> ((s, d) => {
      val fp = TextAnalysis.fingerprint(col("text"))
      val olds = documents(s, d).filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("o_id"), fp.as("fp_old"))
      val news = documents(s, d).filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("n_id"),
          when(col("doc_id") % 11 === 0,
            TextAnalysis.fingerprint(concat(col("text"), lit(" v2"))))
            .otherwise(fp).as("fp_new"))
      olds.join(news, col("o_id") === col("n_id"), "full_outer")
        .select(
          coalesce(col("o_id"), col("n_id")).as("doc_id"),
          col("fp_old"), col("fp_new"),
          when(col("o_id").isNull, "added")
            .when(col("n_id").isNull, "removed")
            .when(col("fp_old") === col("fp_new"), "unchanged")
            .otherwise("changed").as("status"))
    }),

    // TF-IDF keyword extraction: top-5 terms per document by
    // tf * ln((N+1)/(df+1)). One explode + two hash aggregates; the
    // document-frequency side joins back by term — vocabulary-sized, so
    // no broadcast hint (AQE broadcasts while stats allow, shuffles past
    // the cap). Rounded to 6 dp (ln is libm-derived).
    "q66_tfidf" -> ((s, d) => {
      val terms = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = terms.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("tf").cast("double") *
            round(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6),
            6).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
    }),
  )

  // ---- oracle SQL (generated from the same constants) ----------------------

  private val T = tokensSql("text")

  /** The q52 verification pipeline as SQL (shared builder in Dedup),
    * ending in the `edges` CTE. */
  private val edgesSql: String = Dedup.verifiedPairsSqlCtes

  val oracle: Map[String, String] = Map(
    "q60_stratified_sample" ->
      s"""SELECT doc_id, lang, source, bucket FROM (
            SELECT doc_id, lang, source,
                   ${TextAnalysis.fingerprintSql("text")} % 100 AS bucket
            FROM documents)
          WHERE bucket < ${rateForSql("lang")}""",
    "q61_passage_dedup" ->
      s"""WITH chunks AS (
            SELECT doc_id, unnest(${passageHashesSql("th")}) AS ph
            FROM (SELECT doc_id, list_transform(tk, t -> ${charFoldSql("t")}) AS th
                  FROM (SELECT doc_id, $T AS tk FROM documents)
                  WHERE len(tk) >= $ChunkLen)),
          freq AS (
            SELECT ph, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY ph)
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_chunks,
                 CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
                 CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS dup_ratio
          FROM chunks JOIN freq USING (ph)
          GROUP BY doc_id""",
    "q62_url_normalize" ->
      s"""SELECT domain, domain || path AS url_norm,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM (
            SELECT regexp_replace(regexp_extract(l, 'https://([^/]+)/', 1),
                                  '^www\\.', '') AS domain,
                   regexp_replace(regexp_extract(l, 'https://[^/]+([^?]*)', 1),
                                  '/$$', '') AS path,
                   user_id
            FROM (SELECT lower($rawUrlSql) AS l, user_id FROM events))
          GROUP BY domain, url_norm""",
    "q63_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN pts IS NULL
                          OR epoch_ns(ts) - epoch_ns(pts) > ${SessionGapMicros}000
                        THEN 1 ELSE 0 END AS is_new
            FROM (SELECT user_id, event_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pts
                  FROM events)),
          sess AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged)
          SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                 CAST(count(*) AS BIGINT) AS n_events,
                 min(epoch_ns(ts) // 1000000000) AS start_s,
                 max(epoch_ns(ts) // 1000000000) AS end_s
          FROM sess GROUP BY user_id, session_id""",
    "q64_quality_quantile" -> {
      val q = TextAnalysis.qualityScoreSql(
        "len(tk)::BIGINT",
        TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
        "length(text)")
      s"""WITH scored AS (
            SELECT doc_id, lang, $q AS quality
            FROM (SELECT doc_id, lang, text, $T AS tk FROM documents)),
          thr AS (
            SELECT lang, round(quantile_cont(quality, 0.25), 9) AS thr
            FROM scored GROUP BY lang)
          SELECT lang, min(thr) AS p25,
                 CAST(count(*) AS BIGINT) AS n_total,
                 CAST(sum(CASE WHEN quality >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          FROM scored JOIN thr USING (lang)
          GROUP BY lang"""
    },
    "q141_cluster_sizes" ->
      s"""WITH RECURSIVE
          $edgesSql,
          bidir AS (SELECT da AS s, db AS t FROM edges
                    UNION ALL SELECT db, da FROM edges),
          nodes AS (SELECT DISTINCT s AS n FROM bidir),
          walk(n, r) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT b.t, w.r FROM walk w JOIN bidir b ON b.s = w.n),
          comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM walk GROUP BY n),
          sizes AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                    FROM comp GROUP BY 1)
          SELECT cluster_size, count(*)::BIGINT AS n_clusters,
                 (cluster_size * count(*))::BIGINT AS n_docs
          FROM sizes GROUP BY cluster_size""",
    "q65_dedup_clusters" ->
      s"""WITH RECURSIVE
          $edgesSql,
          bidir AS (SELECT da AS s, db AS t FROM edges
                    UNION ALL SELECT db, da FROM edges),
          nodes AS (SELECT DISTINCT s AS n FROM bidir),
          walk(n, r) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT b.t, w.r FROM walk w JOIN bidir b ON b.s = w.n),
          comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM walk GROUP BY n)
          SELECT doc_id, cluster_id, cluster_size
          FROM comp
          JOIN (SELECT cluster_id AS cid, CAST(count(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY cluster_id) sz
            ON comp.cluster_id = sz.cid""",
    "q68_bpe_pairs" ->
      s"""SELECT pair, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT unnest(${Dedup.shingles2Sql("tk")}) AS pair
                FROM (SELECT $T AS tk FROM documents)
                WHERE len(tk) >= 2)
          GROUP BY pair
          ORDER BY n DESC, pair
          LIMIT 20""",
    "q80_corpus_diff" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      val fp2 = TextAnalysis.fingerprintSql("text || ' v2'")
      s"""WITH olds AS (
            SELECT doc_id AS o_id, $fp AS fp_old
            FROM documents WHERE doc_id % 5 <> 0),
          news AS (
            SELECT doc_id AS n_id,
                   CASE WHEN doc_id % 11 = 0 THEN $fp2 ELSE $fp END AS fp_new
            FROM documents WHERE doc_id % 7 <> 0)
          SELECT coalesce(o_id, n_id) AS doc_id, fp_old, fp_new,
                 CASE WHEN o_id IS NULL THEN 'added'
                      WHEN n_id IS NULL THEN 'removed'
                      WHEN fp_old = fp_new THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM olds FULL OUTER JOIN news ON o_id = n_id"""
    },
    "q112_dedup_apply" ->
      s"""WITH RECURSIVE
          $edgesSql,
          bidir AS (SELECT da AS s, db AS t FROM edges
                    UNION ALL SELECT db, da FROM edges),
          nodes AS (SELECT DISTINCT s AS n FROM bidir),
          walk(n, r) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT b.t, w.r FROM walk w JOIN bidir b ON b.s = w.n),
          comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM walk GROUP BY n)
          SELECT lang,
                 CAST(count(*) AS BIGINT) AS n_before,
                 CAST(sum(CASE WHEN cluster_id IS NULL OR cluster_id = documents.doc_id
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
                 CAST(sum(CASE WHEN cluster_id IS NULL OR cluster_id = documents.doc_id
                               THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
          FROM documents LEFT JOIN comp ON documents.doc_id = comp.doc_id
          GROUP BY lang""",
    "q71_cluster_winners" -> {
      val q = TextAnalysis.qualityScoreSql(
        "len(tk)::BIGINT",
        TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
        "length(text)")
      s"""WITH RECURSIVE
          $edgesSql,
          bidir AS (SELECT da AS s, db AS t FROM edges
                    UNION ALL SELECT db, da FROM edges),
          nodes AS (SELECT DISTINCT s AS n FROM bidir),
          walk(n, r) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT b.t, w.r FROM walk w JOIN bidir b ON b.s = w.n),
          comp AS (SELECT n AS doc_id, min(r) AS cluster_id FROM walk GROUP BY n),
          scored AS (
            SELECT doc_id, $q AS quality
            FROM (SELECT doc_id, text, $T AS tk FROM documents)),
          ranked AS (
            SELECT comp.doc_id AS doc_id, cluster_id, quality,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY quality DESC, comp.doc_id) AS rk
            FROM comp JOIN scored ON comp.doc_id = scored.doc_id)
          SELECT cluster_id,
                 CAST(count(*) AS BIGINT) AS cluster_size,
                 max(CASE WHEN rk = 1 THEN doc_id END) AS winner_doc,
                 max(CASE WHEN rk = 1 THEN quality END) AS winner_quality
          FROM ranked GROUP BY cluster_id"""
    },
    "q70_kmeans_step" -> {
      val zeros = Seq.fill(64)("0.0").mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
          c AS (SELECT array_agg(e ORDER BY vec_id) AS cents FROM e WHERE vec_id < 8),
          assign AS (
            SELECT vec_id, e.e AS e,
                   ${graft.ext.Similarity.ivfCellSql("e.e", "c.cents")} AS cell
            FROM e, c),
          agg AS (
            SELECT cell, CAST(count(*) AS BIGINT) AS n,
                   list(e ORDER BY vec_id) AS vs
            FROM assign GROUP BY cell),
          cent AS (
            SELECT cell, n,
                   list_transform(
                     list_reduce(list_prepend($zeros, vs),
                       (ka, kb) -> list_transform(ka, (kx, ki) -> kx + kb[ki])),
                     mx -> mx / n) AS c
            FROM agg),
          dims AS (SELECT unnest(range(1, 65)) AS dim)
          SELECT cell, n, dim, c[dim] AS v
          FROM cent CROSS JOIN dims"""
    },
    "q69_stratified_topk" ->
      s"""SELECT doc_id, lang, fp, rk FROM (
            SELECT doc_id, lang, fp,
                   row_number() OVER (PARTITION BY lang ORDER BY fp, doc_id) AS rk
            FROM (SELECT doc_id, lang,
                         ${TextAnalysis.fingerprintSql("text")} AS fp
                  FROM documents))
          WHERE rk <= 20""",
    "q66_tfidf" ->
      s"""WITH terms AS (
            SELECT doc_id, unnest(tk) AS term
            FROM (SELECT doc_id, $T AS tk FROM documents)),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                 FROM terms GROUP BY doc_id, term),
          df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                 FROM terms GROUP BY term),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
          SELECT doc_id, term, tf, score, rk FROM (
            SELECT doc_id, term, tf,
                   round(CAST(tf AS DOUBLE) *
                         round(ln((n_docs + 1.0) / (df + 1.0)), 6), 6) AS score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY round(CAST(tf AS DOUBLE) *
                                        round(ln((n_docs + 1.0) / (df + 1.0)), 6), 6) DESC,
                                        term) AS rk
            FROM tf JOIN df USING (term) CROSS JOIN n)
          WHERE rk <= 5""",
  )
}
