package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** LLM-data-pipeline operators (BASELINE.json north star): text analysis,
  * dedup (exact / MinHash / SimHash / n-gram Jaccard), similarity search
  * (brute-force cosine top-k + LSH-bucketed ANN) over `documents` /
  * `embeddings`.
  *
  * Oracle SQL for the hash-heavy operators is program-generated from the
  * same constants as the Spark plans (graft.functions.Portable) so the two
  * sides cannot drift.
  */
object LlmQueries {

  import TextAnalysis._

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token statistics: counts, mean token length, stopword density.
    "q24_text_stats" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = countIn(toks, LangProfiles.head._2)
      // nullif guards: zero-token docs → NULL ratios (ANSI-safe, oracle-equal)
      documents(s, d).select(
        col("doc_id"),
        nTok.as("n_tok"),
        length(col("text")).cast("long").as("n_chars_calc"),
        (tokenLenSum(toks).cast("double") / nullif(nTok, lit(0L))).as("avg_tok_len"),
        stopN.as("stop_n"),
        (stopN.cast("double") / nullif(nTok, lit(0L))).as("stop_ratio"))
    }),

    // Language-ID heuristic: stopword-profile argmax, deterministic
    // tie-break by profile order.
    "q25_lang_id" -> ((s, d) => {
      val toks = tokens(col("text"))
      val scores = langScores(toks)
      val scoreCols = scores.map { case (lang, c) => c.as(s"${lang}_n") }
      documents(s, d).select(
        (col("doc_id") +: scoreCols :+
          langPick(scores).as("pred") :+ col("lang")): _*)
    }),

    // Quality score: length/stopword/size-band composite in [0,1].
    "q26_quality_score" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = countIn(toks, LangProfiles.head._2)
      documents(s, d).select(
        col("doc_id"),
        qualityScore(nTok, stopN, length(col("text"))).as("quality"))
    }),

    // Token counting two ways: whitespace + BPE-ish regex word pieces.
    "q27_token_counts" -> ((s, d) => {
      val toks = tokens(col("text"))
      documents(s, d).select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_re"))
    }),

    // Document fingerprint: portable rolling content hash.
    "q28_fingerprint" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Exact dedup: hash-groupBy on a normalized key (first 3 tokens);
    // keep lowest doc_id, count duplicates. Single hash-aggregate shuffle.
    "q29_dedup_exact" -> ((s, d) => {
      val toks = tokens(col("text"))
      val key = md5(concat_ws(" ", slice(toks, 1, 3)))
      documents(s, d)
        .select(key.as("key_hash"), col("doc_id"))
        .groupBy(col("key_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
             count(lit(1)).as("n_dups"))
    }),

    // MinHash signatures (4 permutations over 2-shingle hashes).
    "q30_minhash_sig" -> ((s, d) =>
      Dedup.signaturesFromBase(Dedup.shingleBase(s, d))),

    // MinHash candidate pairs: full-signature band join, symmetric
    // per-doc candidate count. One shuffle on the band key. The signature
    // table is materialized once (localCheckpoint) so the self-join does
    // not recompute the hash chains on both sides — at scale this is the
    // "write signatures, then join" two-job shape.
    "q31_minhash_candidates" -> ((s, d) => {
      val sig = Dedup.signaturesFromBase(Dedup.shingleBase(s, d)).localCheckpoint()
      val a = sig.select(col("doc_id").as("da"), col("mh0"), col("mh1"),
                         col("mh2"), col("mh3"))
      val b = sig.select(col("doc_id").as("db"), col("mh0").as("nh0"),
                         col("mh1").as("nh1"), col("mh2").as("nh2"),
                         col("mh3").as("nh3"))
      a.join(b,
          col("mh0") === col("nh0") && col("mh1") === col("nh1") &&
          col("mh2") === col("nh2") && col("mh3") === col("nh3") &&
          col("da") =!= col("db"))
        .groupBy(col("da").as("doc_id"))
        .agg(count(lit(1)).as("n_cand"))
    }),

    // The complete LSH dedup pipeline: signatures → banded candidate
    // pairs → exact 2-shingle Jaccard verification ≥ 0.5. Candidate
    // generation is the one shuffle; verification joins the candidate
    // pairs back to the (distinct-shingle) docs — at 100 TB this is the
    // standard sig-write / candidate-join / verify three-job shape.
    // ONE tokenize+charFold pass: the session-cached shingle-hash base
    // (Dedup.shingleBase — repartitioned off the single input split,
    // layered selects against the O(n²) unmaterialized-HOF trap) feeds
    // BOTH the signature table and the exact-verification sets (at
    // 100 TB: write the hh table, then run the minhash job and the
    // verify job against it). The pipeline lives in Dedup.verifiedPairs —
    // q65/q71's duplicate clustering consumes the same definition.
    "q52_minhash_verified" -> ((s, d) => Dedup.verifiedPairs(s, d)),


    // Multi-band MinHash LSH candidates (b=4 bands × r=2 rows, OR-
    // construction): q31's single-band join requires ALL 4 minhashes equal
    // (r=4) — high precision, limited recall. Banding admits a pair when
    // ANY band's 2 minhashes agree; pairs are deduped across bands before
    // the per-doc count. Because the first 4 extended perms ARE the
    // signature perms, band 0+1 together cover q31's condition — the
    // candidate set is a strict superset (recall ≥ q31, spec-asserted).
    // One shuffle on the (band, h1, h2) key; 4× the rows of q31's join but
    // each band bucket is narrower — the standard b×r trade.
    "q55_minhash_banded" -> ((s, d) => {
      val base = Dedup.shingleBase(s, d)
      val sig = base.select((col("doc_id") +: MinhashPermsExt.indices.map(j =>
          Dedup.minhashExt(col("hh"), j).as(s"mh$j"))): _*)
      val bandArr = array((0 until 4).map(bd =>
        struct(lit(bd).as("band"), col(s"mh${2 * bd}").as("h1"),
               col(s"mh${2 * bd + 1}").as("h2"))): _*)
      val bands = sig
        .select(col("doc_id"), explode(bandArr).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
                col("bk.h1").as("h1"), col("bk.h2").as("h2"))
        .localCheckpoint()
      val a = bands.select(col("doc_id").as("da"), col("band"), col("h1"), col("h2"))
      val b = bands.select(col("doc_id").as("db"), col("band").as("bandb"),
                           col("h1").as("j1"), col("h2").as("j2"))
      // countDistinct collapses the cross-band pair dedup and the per-doc
      // count into ONE shuffle on da (a distinct() + groupBy would be two)
      a.join(b, col("band") === col("bandb") && col("h1") === col("j1") &&
                col("h2") === col("j2") && col("da") =!= col("db"))
        .groupBy(col("da").as("doc_id"))
        .agg(countDistinct(col("db")).as("n_cand"))
    }),

    // SimHash (16-bit) per document; token hashes materialized once in a
    // layered select (16 bit-sums reference them).
    "q32_simhash" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          Dedup.simhashTokenHashes(tokens(col("text"))).as("hs"))
        .select(col("doc_id"),
          Dedup.simhash16FromHashes(col("hs")).as("simhash"))),

    // n-gram Jaccard near-dup over blocked pairs (same source + id block):
    // |A∩B| / |A∪B| on distinct 2-shingles. Block key bounds the pair count.
    "q33_ngram_jaccard" -> ((s, d) => {
      val toks = tokens(col("text"))
      // tk materialized first: shingles2's element_at over an unmaterialized
      // tokens() expression would re-split the text per shingle (O(n²)).
      val docs = documents(s, d)
        .filter(size(toks) >= 2)
        .select(col("doc_id"), col("source"),
                (col("doc_id") / 100).cast("long").as("blk"), toks.as("tk"))
        .select(col("doc_id"), col("source"), col("blk"),
                array_distinct(Dedup.shingles2(col("tk"))).as("sh"))
      val a = docs.select(col("doc_id").as("da"), col("source"), col("blk"),
                          col("sh").as("sha"))
      val b = docs.select(col("doc_id").as("db"), col("source").as("sourceb"),
                          col("blk").as("blkb"), col("sh").as("shb"))
      a.join(b, col("source") === col("sourceb") && col("blk") === col("blkb") &&
                col("da") < col("db"))
        .select(col("da"), col("db"),
          size(array_intersect(col("sha"), col("shb"))).cast("long").as("n_inter"),
          (size(col("sha")) + size(col("shb")) -
            size(array_intersect(col("sha"), col("shb")))).cast("long").as("n_union"))
        .select(col("da"), col("db"), col("n_inter"), col("n_union"),
          (col("n_inter").cast("double") / col("n_union")).as("jaccard"))
    }),

    // Text cleaning: normalize case, strip non-alphanumerics, collapse
    // whitespace, drop stopwords — the standard pre-tokenization scrub.
    "q50_text_clean" -> ((s, d) => {
      val cleaned = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")
      val toks = filter(split(trim(cleaned), " "), t => t =!= "")
      val kept = filter(toks, t => !t.isin(TextAnalysis.LangProfiles.head._2: _*))
      documents(s, d).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(kept).cast("long").as("n_kept"),
        array_join(slice(kept, 1, 8), " ").as("head_tokens"))
    }),

    // PII scrubbing — the standard pre-training redaction pass: detect and
    // replace email/phone patterns, count redactions. The corpus text is
    // synthetic, so deterministic PII is APPENDED first (from doc_id) and
    // then scrubbed — the regex machinery is tested against known
    // plant counts. Pure per-row regexp chain, zero shuffle.
    "q57_pii_scrub" -> ((s, d) => {
      val withPii = concat(col("text"),
        lit(" contact_"), col("doc_id"), lit("@mail.example.com call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      val emailRe = TextAnalysis.PiiEmailRe
      val phoneRe = TextAnalysis.PiiPhoneRe
      documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(withPii, lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(withPii, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(withPii, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("scrubbed"))
    }),

    // Benchmark-contamination scan — the n-gram-overlap check run before
    // training: broadcast the benchmark set's (hashed) shingles, one pass
    // over the corpus counting shared distinct shingles per document.
    // Probe set here = doc_id < 5; at 100 TB the probe side is the small
    // benchmark suite (broadcast), the corpus side never shuffles beyond
    // the per-doc aggregate.
    "q58_contamination" -> ((s, d) => {
      // materialize the distinct-shingle projection: BOTH the probe and
      // corpus branches read it (without the checkpoint the array_distinct
      // would run twice per execution)
      val base = Dedup.shingleBase(s, d)
        .select(col("doc_id"), array_distinct(col("hh")).as("sh"))
        .localCheckpoint()
      val probes = base.filter(col("doc_id") < 5)
        .select(explode(col("sh")).as("h")).distinct()
      val shared = base.filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(col("sh")).as("h"))
        .join(broadcast(probes), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      base.filter(col("doc_id") >= 5)
        .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
        .join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_sh")).as("ratio"))
    }),

    // Brute-force cosine top-10 against the vec_id=0 query vector.
    "q34_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
      Similarity.cosineTopK(emb, q, 10, 0L)
    }),

    // Hard-negative mining for retrieval/embedding training: for each
    // query vector, the top-3 most-similar CORPUS vectors with a
    // DIFFERENT label — near-misses the contrastive loss needs (random
    // negatives are trivially easy; same-label hits are positives, not
    // negatives). Query set bounded (broadcast [bounded: fixed 20-query
    // panel]); the corpus scan never shuffles; the per-query top-3 runs
    // as WindowGroupLimit (per-partition limit heaps, then merge — the
    // same physical shape as the window-rank family).
    "q183_hard_negatives" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("e"))
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("e").as("qe"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id"))
      emb.join(broadcast(q), col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("e"), col("qe")), 6).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id").as("neg_id"), col("rk").cast("long").as("rk"),
          col("sim"))
    }),

    // Near-dup pairs: top-3 by cosine per (label, id-block) — blocked
    // all-pairs with deterministic rank.
    "q35_embed_neardup" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), col("label"),
        (col("vec_id") / 500).cast("long").as("blk"),
        asDouble(col("embedding")).as("e"))
      val a = emb.select(col("vec_id").as("va"), col("label"), col("blk"),
                         col("e").as("ea"))
      val b = emb.select(col("vec_id").as("vb"), col("label").as("labelb"),
                         col("blk").as("blkb"), col("e").as("eb"))
      val w = Window.partitionBy(col("label"), col("blk"))
        .orderBy(col("sim").desc, col("va"), col("vb"))
      a.join(b, col("label") === col("labelb") && col("blk") === col("blkb") &&
                col("va") < col("vb"))
        .select(col("label"), col("blk"), col("va"), col("vb"),
                cosine(col("ea"), col("eb")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
    }),

    // IVF coarse-quantizer cell assignment: nearest of 8 deterministic
    // centroids by cosine (the k-means-trained IVF's assignment step with
    // fixed seed centroids). Broadcast centroid list; one pass, no shuffle.
    "q49_ivf_cells" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("e"))
      val cents = emb.filter(col("vec_id") < 8)
        .agg(transform(sort_array(collect_list(struct(col("vec_id"), col("e")))),
          x => x("e")).as("cents"))
      emb.join(broadcast(cents))
        .select(col("vec_id"), Similarity.ivfCell(col("e"), col("cents")).as("cell"))
    }),

    // LSH-bucketed ANN: bucket by 8 hyperplane signs, exact re-rank inside
    // the query's bucket, top-5. The scale path: candidates are one
    // bucket, not the full table.
    "q36_ann_lsh" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .withColumn("bucket", Similarity.lshBucket(col("e")))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("bucket").as("qbucket"), col("e").as("qe"))
      emb.join(broadcast(q), col("bucket") === col("qbucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bucket"), cosine(col("e"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(5)
    }),
    // ANN quality measurement: recall of the LSH bucket's top-10 against
    // the brute-force top-10 for the vec_id=0 probe — the metric that
    // justifies (or rejects) the bucketed path at scale.
    "q53_ann_recall" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .withColumn("bucket", Similarity.lshBucket(col("e")))
        .localCheckpoint()
      val q = emb.filter(col("vec_id") === 0)
        .select(col("bucket").as("qbucket"), col("e").as("qe"))
      val scored = emb.join(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bucket"), col("qbucket"),
                cosine(col("e"), col("qe")).as("sim"))
      val brute = scored.orderBy(col("sim").desc, col("vec_id")).limit(10)
        .select(col("vec_id"))
      val lsh = scored.filter(col("bucket") === col("qbucket"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .select(col("vec_id"))
      val common = brute.intersect(lsh)
      brute.agg(count(lit(1)).as("n_brute")).join(
        lsh.agg(count(lit(1)).as("n_lsh"))).join(
        common.agg(count(lit(1)).as("n_common")))
        .select(col("n_brute"), col("n_lsh"), col("n_common"),
                (col("n_common").cast("double") / col("n_brute")).as("recall"))
    }),
  )

  // ---- oracle SQL (generated from the same constants) ----------------------

  private val T  = tokensSql("text")

  val oracle: Map[String, String] = {
    val stopEn = LangProfiles.head._2

    val sigSql =
      s"""SELECT doc_id,
            ${Dedup.minhashSql("hh", 0)} AS mh0,
            ${Dedup.minhashSql("hh", 1)} AS mh1,
            ${Dedup.minhashSql("hh", 2)} AS mh2,
            ${Dedup.minhashSql("hh", 3)} AS mh3
          FROM (SELECT doc_id,
                  ${Dedup.combineAdjacentSql("th")} AS hh
                FROM (SELECT doc_id,
                        list_transform(tk, t -> ${graft.functions.Portable.charFoldSql("t")}) AS th
                      FROM (SELECT doc_id, $T AS tk FROM documents)
                      WHERE len(tk) >= 2))"""

    val sig8Sql =
      s"""SELECT doc_id,
            ${(0 until 8).map(j => s"${Dedup.minhashExtSql("hh", j)} AS mh$j").mkString(",\n            ")}
          FROM (SELECT doc_id,
                  ${Dedup.combineAdjacentSql("th")} AS hh
                FROM (SELECT doc_id,
                        list_transform(tk, t -> ${graft.functions.Portable.charFoldSql("t")}) AS th
                      FROM (SELECT doc_id, $T AS tk FROM documents)
                      WHERE len(tk) >= 2))"""

    val langScoreSql = (lang: String) =>
      countInSql("tk", LangProfiles.find(_._1 == lang).get._2)

    Map(
      "q24_text_stats" ->
        s"""SELECT doc_id,
              len(tk)::BIGINT AS n_tok,
              length(text)::BIGINT AS n_chars_calc,
              CAST(${tokenLenSumSql("tk")} AS DOUBLE) / nullif(len(tk)::BIGINT, 0) AS avg_tok_len,
              ${countInSql("tk", stopEn)} AS stop_n,
              CAST(${countInSql("tk", stopEn)} AS DOUBLE) / nullif(len(tk)::BIGINT, 0) AS stop_ratio
            FROM (SELECT doc_id, text, $T AS tk FROM documents)""",
      "q25_lang_id" ->
        s"""SELECT doc_id,
              ${LangProfiles.map { case (l, set) => s"${countInSql("tk", set)} AS ${l}_n" }.mkString(", ")},
              ${langPickSql(langScoreSql)} AS pred,
              lang
            FROM (SELECT doc_id, lang, $T AS tk FROM documents)""",
      "q26_quality_score" ->
        s"""SELECT doc_id,
              ${qualityScoreSql(s"len(tk)::BIGINT", countInSql("tk", stopEn), "length(text)")} AS quality
            FROM (SELECT doc_id, text, $T AS tk FROM documents)""",
      "q27_token_counts" ->
        s"""SELECT doc_id,
              len($T)::BIGINT AS n_ws,
              len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_re
            FROM documents""",
      "q28_fingerprint" ->
        s"SELECT doc_id, ${fingerprintSql("text")} AS fp FROM documents",
      "q29_dedup_exact" ->
        s"""SELECT key_hash, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
            FROM (SELECT md5(array_to_string(list_slice($T, 1, 3), ' ')) AS key_hash,
                         doc_id
                  FROM documents)
            GROUP BY key_hash""",
      "q30_minhash_sig" -> sigSql,
      "q31_minhash_candidates" ->
        s"""WITH sig AS ($sigSql)
            SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_cand
            FROM sig a JOIN sig b
              ON a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2
             AND a.mh3 = b.mh3 AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id""",
      "q52_minhash_verified" ->
        s"""WITH ${Dedup.verifiedPairsSqlCtes}
            SELECT da, db, n_inter, n_union, jaccard FROM edges""",
      "q55_minhash_banded" ->
        s"""WITH sig AS ($sig8Sql),
                 bands AS (
                   ${(0 until 4).map(bd =>
                     s"SELECT doc_id, $bd AS band, mh${2 * bd} AS h1, mh${2 * bd + 1} AS h2 FROM sig")
                     .mkString("\n                   UNION ALL ")}),
                 pairs AS (
                   SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
                    AND a.doc_id <> b.doc_id)
            SELECT da AS doc_id, CAST(count(*) AS BIGINT) AS n_cand
            FROM pairs GROUP BY da""",
      "q32_simhash" ->
        s"""SELECT doc_id, ${Dedup.simhash16FromHashesSql("hs")} AS simhash
            FROM (SELECT doc_id, ${Dedup.simhashTokenHashesSql("tk")} AS hs
                  FROM (SELECT doc_id, $T AS tk FROM documents))""",
      "q33_ngram_jaccard" ->
        s"""WITH docs AS (
              SELECT doc_id, source, doc_id // 100 AS blk,
                     list_distinct(${Dedup.shingles2Sql("tk")}) AS sh
              FROM (SELECT doc_id, source, $T AS tk FROM documents)
              WHERE len(tk) >= 2)
            SELECT a.doc_id AS da, b.doc_id AS db,
                   len(list_intersect(a.sh, b.sh))::BIGINT AS n_inter,
                   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS n_union,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS jaccard
            FROM docs a JOIN docs b
              ON a.source = b.source AND a.blk = b.blk AND a.doc_id < b.doc_id""",
      "q50_text_clean" -> {
        val stop = TextAnalysis.LangProfiles.head._2.map(s => s"'$s'").mkString(", ")
        s"""SELECT doc_id,
              len(toks)::BIGINT AS n_tok,
              len(kept)::BIGINT AS n_kept,
              array_to_string(list_slice(kept, 1, 8), ' ') AS head_tokens
            FROM (
              SELECT doc_id, toks,
                     list_filter(toks, t -> NOT list_contains([$stop], t)) AS kept
              FROM (
                SELECT doc_id,
                       list_filter(string_split(trim(regexp_replace(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +', ' ', 'g')), ' '), t -> t <> '') AS toks
                FROM documents))"""
      },
      "q57_pii_scrub" -> {
        val e = TextAnalysis.PiiEmailRe
        val p = TextAnalysis.PiiPhoneRe
        s"""SELECT doc_id,
              len(regexp_extract_all(wp, '$e'))::BIGINT AS n_emails,
              len(regexp_extract_all(wp, '$p'))::BIGINT AS n_phones,
              regexp_replace(regexp_replace(wp, '$e', '<EMAIL>', 'g'),
                '$p', '<PHONE>', 'g') AS scrubbed
            FROM (SELECT doc_id,
                    text || ' contact_' || doc_id || '@mail.example.com call 555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS wp
                  FROM documents)"""
      },
      "q58_contamination" ->
        s"""WITH docs AS (
              SELECT doc_id, list_distinct(${Dedup.combineAdjacentSql("th")}) AS sh
              FROM (SELECT doc_id,
                      list_transform(tk, t -> ${graft.functions.Portable.charFoldSql("t")}) AS th
                    FROM (SELECT doc_id, $T AS tk FROM documents)
                    WHERE len(tk) >= 2)),
                 probe AS (
              SELECT DISTINCT unnest(sh) AS h FROM docs WHERE doc_id < 5),
                 m AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
              FROM (SELECT doc_id, unnest(sh) AS h FROM docs WHERE doc_id >= 5) dd
              JOIN probe USING (h)
              GROUP BY doc_id)
            SELECT d.doc_id, len(d.sh)::BIGINT AS n_sh,
                   CAST(coalesce(m.n_shared, 0) AS BIGINT) AS n_shared,
                   CAST(coalesce(m.n_shared, 0) AS DOUBLE) / len(d.sh) AS ratio
            FROM docs d LEFT JOIN m ON d.doc_id = m.doc_id
            WHERE d.doc_id >= 5""",
      "q34_cosine_topk" ->
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
                 q AS (SELECT e AS qe FROM e WHERE vec_id = 0)
            SELECT vec_id, ${cosineSql("e.e", "q.qe")} AS sim
            FROM e, q WHERE vec_id <> 0
            ORDER BY sim DESC, vec_id LIMIT 10""",
      "q183_hard_negatives" ->
        s"""WITH e AS (SELECT vec_id, label, ${asDoubleSql("embedding")} AS e
                       FROM embeddings),
            q AS (SELECT vec_id AS qid, label AS qlabel, e AS qe
                  FROM e WHERE vec_id < 20),
            scored AS (
              SELECT qid, vec_id, round(${cosineSql("e.e", "q.qe")}, 6) AS sim
              FROM e JOIN q ON e.label <> q.qlabel),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
              FROM scored)
            SELECT qid, vec_id AS neg_id, rk::BIGINT AS rk, sim
            FROM ranked WHERE rk <= 3""",
      "q35_embed_neardup" ->
        s"""WITH emb AS (SELECT vec_id, label, vec_id // 500 AS blk,
                                ${asDoubleSql("embedding")} AS e
                         FROM embeddings)
            SELECT label, blk, va, vb, sim, rk FROM (
              SELECT a.label AS label, a.blk AS blk,
                     a.vec_id AS va, b.vec_id AS vb,
                     ${cosineSql("a.e", "b.e")} AS sim,
                     row_number() OVER (PARTITION BY a.label, a.blk
                                        ORDER BY ${cosineSql("a.e", "b.e")} DESC,
                                                 a.vec_id, b.vec_id) AS rk
              FROM emb a JOIN emb b
                ON a.label = b.label AND a.blk = b.blk AND a.vec_id < b.vec_id)
            WHERE rk <= 3""",
      "q49_ivf_cells" ->
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
                 c AS (SELECT array_agg(e ORDER BY vec_id) AS cents FROM e WHERE vec_id < 8)
            SELECT vec_id, ${Similarity.ivfCellSql("e.e", "c.cents")} AS cell
            FROM e, c""",
      "q53_ann_recall" ->
        s"""WITH e AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
                 bk AS (SELECT vec_id, e, ${Similarity.lshBucketSql("e")} AS bucket FROM e),
                 q AS (SELECT bucket AS qbucket, e AS qe FROM bk WHERE vec_id = 0),
                 scored AS (
                   SELECT vec_id, bucket, qbucket,
                          ${cosineSql("bk.e", "q.qe")} AS sim
                   FROM bk, q WHERE vec_id <> 0),
                 brute AS (SELECT vec_id FROM scored ORDER BY sim DESC, vec_id LIMIT 10),
                 lsh AS (SELECT vec_id FROM scored WHERE bucket = qbucket
                         ORDER BY sim DESC, vec_id LIMIT 10),
                 common AS (SELECT vec_id FROM brute INTERSECT SELECT vec_id FROM lsh)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM brute) AS n_brute,
                   (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
                   (SELECT CAST(count(*) AS BIGINT) FROM common) AS n_common,
                   CAST((SELECT count(*) FROM common) AS DOUBLE)
                     / (SELECT count(*) FROM brute) AS recall""",
      "q36_ann_lsh" ->
        s"""WITH emb AS (SELECT vec_id, ${asDoubleSql("embedding")} AS e FROM embeddings),
                 bk AS (SELECT vec_id, e, ${Similarity.lshBucketSql("e")} AS bucket FROM emb),
                 q AS (SELECT bucket AS qbucket, e AS qe FROM bk WHERE vec_id = 0)
            SELECT vec_id, bucket, ${cosineSql("bk.e", "q.qe")} AS sim
            FROM bk, q WHERE bucket = qbucket AND vec_id <> 0
            ORDER BY sim DESC, vec_id LIMIT 5""",
    )
  }
}
