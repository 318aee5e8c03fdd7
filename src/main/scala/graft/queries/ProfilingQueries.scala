package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Dedup, TextAnalysis}
import graft.queries.ScaleQueries.PrPartOffset

/** Round-7 batch — pipeline calibration and data profiling: exact ROC-AUC
  * of the quality filter (the number that decides whether a filter ships),
  * edit-distance verification of LSH dedup candidates (the fuzzy-dedup
  * metric MinHash can't express), temperature-based mixture allocation
  * (the multinomial p^α sampling of multilingual/multisource training
  * sets), exponentially time-decayed engagement aggregates, inclusion-
  * dependency (foreign-key) profiling, and a fixed-round k-core peel.
  *
  * Determinism discipline as everywhere: libm outputs (ln/exp) round to
  * 9 dp before reuse; cross products route through DECIMAL(38,0); double
  * sums ride 9-dp DECIMAL(18,9); thresholds are integer rationals.
  */
object ProfilingQueries {

  /** Mixture temperature (mT5-style p^α resampling) and sample budget. */
  val MixAlpha = 0.7
  val MixBudget = 10000L

  /** Edit-distance accept threshold as a rational: lev/maxlen ≤ 3/10. */
  val EditNum = 3L
  val EditDenom = 10L

  /** Decay: ln(2) / half-life-days — per-day decay exponent for a 30-day
    * half-life. The Scala double literal prints into the oracle SQL and
    * parses back to the identical double. */
  val DecayPerDay = 0.023104906018664842 // ln(2) / 30

  /** k-core threshold and fixed peel rounds (full core = loop to
    * fixpoint; two rounds are the oracle-bounded demonstration). */
  val CoreK = 3L
  val CorePeels = 2

  private def ln9(x: org.apache.spark.sql.Column) = round(log(x), 9)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact ROC-AUC of the q26 quality score against the lang='en' gold
    // label via the Mann-Whitney rank-sum with midranks: group by score,
    // cumulative-rank the groups, AUC = (Σ npos·r2 − Npos(Npos+1)) /
    // (2·Npos·Nneg) where r2 is TWICE the group's average rank (integer —
    // the ½s never materialize). All sums are exact integers in
    // DECIMAL(38,0); one double division at the end. The filter-shipping
    // decision number, computed without a per-row global sort.
    "q138_filter_auc" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val scored = documents(s, d).select(
        TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("sc"),
        (col("lang") === "en").cast("long").as("pos"))
      val grp = scored.groupBy(col("sc"))
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("np"))
      // fenced: ≤ distinct score values (score is a low-granularity ratio
      // of bounded integer features); the window sort spills, agg does not
      val w = Window.orderBy(col("sc")).rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grp
        .withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col("np"), col("cnt"),
          (col("cumb") * 2 + col("cnt") + 1).as("r2"))
      val agg = ranked.agg(
        sum(col("np")).as("npos"), sum(col("cnt")).as("ntot"),
        sum((col("np") * col("r2")).cast("decimal(38,0)")).as("s2"))
      val num = col("s2") -
        col("npos").cast("decimal(38,0)") * (col("npos") + 1)
      agg.select(col("npos"), (col("ntot") - col("npos")).as("nneg"),
        round(num.cast("double") /
          (lit(2.0) * col("npos").cast("double") *
            (col("ntot") - col("npos")).cast("double")), 6).as("auc"))
    }),

    // Fuzzy dedup the MinHash family can't express: the SAME full-
    // signature candidate pairs (Dedup.signatureCandidates — shared stage,
    // no drift), verified by CHARACTER edit distance instead of shingle
    // Jaccard. Accept is the integer rational lev·10 ≤ maxlen·3, computed
    // by the codegen'd threshold-bounded kernel [[EditWithinExpr]]
    // (prefix/suffix strip + Ukkonen band + early abandon): the built-in
    // levenshtein's full |a|·|b| DP over 76k candidate pairs costs 56 s at
    // sf0.1; the bounded kernel returns the identical accepted relation in
    // ~1 s (distances ≤ threshold are exact; rejects are -1). Candidate-
    // bounded — never all-pairs; the text join is a shuffle join on
    // doc_id (corpus-sized side — never broadcast).
    "q139_edit_dedup" -> ((s, d) => {
      val txt = documents(s, d).select(col("doc_id"), col("text"))
      Dedup.signatureCandidates(s, d)
        .join(txt.select(col("doc_id").as("da"), col("text").as("ta")), "da")
        .join(txt.select(col("doc_id").as("db"), col("text").as("tb")), "db")
        .select(col("da"), col("db"),
          editWithin(col("ta"), col("tb"), EditNum, EditDenom).as("lev"),
          greatest(length(col("ta")), length(col("tb"))).cast("long").as("maxlen"))
        .filter(col("lev") >= 0)
        .withColumn("sim",
          round(lit(1.0) - col("lev").cast("double") / col("maxlen").cast("double"), 6))
    }),

    // Temperature-based mixture allocation (the p^α resampling of
    // multilingual corpora, mT5/XLM-R style): per source, weight ∝ p^α
    // with p its corpus share, allocation = floor(weight · budget), and
    // the implied epochs over the source's documents. p^α = exp(α·ln p)
    // with both libm steps 9-dp-rounded; the weight normalizer sums
    // exactly in DECIMAL(18,9). Source table is aggregate-sized: every
    // join here broadcasts a 1-row or #sources-row frame.
    "q140_temperature_mix" -> ((s, d) => {
      val cnt = documents(s, d).groupBy(col("source")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("nt"))
      val q = round(exp(round(lit(MixAlpha) *
        ln9(col("n").cast("double") / col("nt").cast("double")), 9)), 9)
      val scored = cnt.crossJoin(broadcast(tot))
        .select(col("source"), col("n"), q.cast("decimal(18,9)").as("q"))
      val qsum = scored.agg(sum(col("q")).as("qs"))
      scored.crossJoin(broadcast(qsum))
        .select(col("source"), col("n"),
          round(col("q").cast("double") / col("qs").cast("double"), 9).as("weight"),
          floor(col("q").cast("double") / col("qs").cast("double") *
            lit(MixBudget.toDouble)).cast("long").as("alloc"))
        .withColumn("epochs",
          round(col("alloc").cast("double") / col("n").cast("double"), 6))
    }),

    // Exponentially time-decayed per-user engagement: weight = exp(−age·λ)
    // at a fixed as-of instant (the table's max timestamp — deterministic),
    // λ = ln2/half-life. Per-row weights and weighted values are
    // 9-dp-rounded doubles summed exactly as DECIMAL(18,9) — partition-
    // order independent. The recency-weighted activity score a freshness-
    // aware sampler uses; one scan + one user aggregate.
    "q142_decayed_sum" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      val asof = ev.agg(max(col("us")).as("asof"))
      val age = (col("asof") - col("us")).cast("double") / lit(86400.0e6)
      val wexp = round(exp(round(age * lit(-DecayPerDay), 9)), 9)
      ev.crossJoin(broadcast(asof))
        .select(col("user_id"),
          round(wexp * col("value"), 9).cast("decimal(18,9)").as("wv"),
          col("value").cast("decimal(18,2)").as("v"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("wv")).cast("double"), 6).as("decayed_value"),
          sum(col("v")).cast("double").as("raw_value"))
    }),

    // Inclusion-dependency (FK) profiling — the data-profiling pass a
    // lakehouse runs before trusting joins: for each candidate
    // (child → parent) key pair, the distinct child keys, how many exist
    // in the parent, the containment ratio, and the FK verdict. Each pair
    // is two distinct-aggregates and one left join on the key — at 100 TB
    // each profile is one shuffle on its own key, pairs independent.
    // events.user_id → customer is the deliberate NEGATIVE (synthetic
    // user ids overrun the customer table).
    "q143_fk_profile" -> ((s, d) => {
      def prof(name: String, child: DataFrame, parent: DataFrame): DataFrame =
        child.toDF("k").distinct()
          .join(parent.toDF("p").distinct(), col("k") === col("p"), "left")
          .agg(count(lit(1)).as("n_child_keys"),
            sum(col("p").isNotNull.cast("long")).as("n_contained"))
          .select(lit(name).as("fk"), col("n_child_keys"), col("n_contained"),
            round(col("n_contained").cast("double") /
              col("n_child_keys").cast("double"), 6).as("containment"),
            (col("n_contained") === col("n_child_keys")).as("is_fk"))
      prof("lineitem.l_orderkey->orders.o_orderkey",
          lineitem(s, d).select(col("l_orderkey")),
          orders(s, d).select(col("o_orderkey")))
        .unionByName(prof("orders.o_custkey->customer.c_custkey",
          orders(s, d).select(col("o_custkey")),
          customer(s, d).select(col("c_custkey"))))
        .unionByName(prof("lineitem.l_partkey->part.p_partkey",
          lineitem(s, d).select(col("l_partkey")),
          part(s, d).select(col("p_partkey"))))
        .unionByName(prof("customer.c_nationkey->nation.n_nationkey",
          customer(s, d).select(col("c_nationkey")),
          nation(s, d).select(col("n_nationkey"))))
        .unionByName(prof("events.user_id->customer.c_custkey",
          events(s, d).select(col("user_id")),
          customer(s, d).select(col("c_custkey"))))
    }),

    // Fixed-round k-core peel over the undirected supplier↔part supply
    // graph (q120's edge list): round r removes nodes with degree < K,
    // then recounts. Reports (round, n_nodes, n_edges) for the intact
    // graph and after each of CorePeels peels — the degeneracy-ordering
    // prefix a graph-sampling stage uses. Each peel is one degree
    // aggregate + one semi-join on each endpoint; a full k-core loops the
    // same two jobs to fixpoint.
    "q144_kcore" -> ((s, d) => {
      val edges = lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("s"),
          (col("l_partkey") + PrPartOffset).as("p")).distinct()
        .select(col("s").as("u"), col("p").as("v"))
        .localCheckpoint() // three rounds consume it
      def stats(e: DataFrame, r: Int): DataFrame =
        e.select(explode(array(col("u"), col("v"))).as("n"))
          .agg(countDistinct(col("n")).as("n_nodes"))
          .crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .select(lit(r.toLong).as("peel"), col("n_nodes"), col("n_edges"))
      def peel(e: DataFrame): DataFrame = {
        val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
          .groupBy(col("n")).agg(count(lit(1)).as("deg"))
        val alive = deg.filter(col("deg") >= CoreK).select(col("n"))
        e.join(alive.select(col("n").as("u")), "u")
          .join(alive.select(col("n").as("v")), "v")
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      val rounds = Iterator.iterate(edges)(peel).take(CorePeels + 1).toSeq
      rounds.zipWithIndex.map { case (e, i) => stats(e, i) }
        .reduce(_ unionByName _)
    }),
  )

  val oracle: Map[String, String] = {
    val tokSql = tokensSql("text")
    val qSql = TextAnalysis.qualityScoreSql(
      "len(tk)::BIGINT",
      TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
      "length(text)")
    Map(
      "q138_filter_auc" ->
        s"""WITH scored AS (
              SELECT $qSql AS sc,
                     (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos
              FROM (SELECT lang, text, $tokSql AS tk FROM documents)),
            grp AS (
              SELECT sc, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS np
              FROM scored GROUP BY 1),
            ranked AS (
              SELECT np, cnt,
                     (2 * coalesce(sum(cnt) OVER (ORDER BY sc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      + cnt + 1)::BIGINT AS r2
              FROM grp),
            agg AS (
              SELECT sum(np)::BIGINT AS npos, sum(cnt)::BIGINT AS ntot,
                     sum((np * r2)::DECIMAL(38,0)) AS s2
              FROM ranked)
            SELECT npos, (ntot - npos) AS nneg,
                   round((s2::HUGEINT - npos::HUGEINT * (npos + 1)::HUGEINT)::DOUBLE /
                         (2.0 * npos::DOUBLE * (ntot - npos)::DOUBLE), 6) AS auc
            FROM agg""",
      "q139_edit_dedup" ->
        s"""WITH ${Dedup.verifiedPairsSqlCtes}
            SELECT da, db, lev, maxlen,
                   round(1.0 - lev::DOUBLE / maxlen::DOUBLE, 6) AS sim
            FROM (
              SELECT da, db, levenshtein(a.text, b.text)::BIGINT AS lev,
                     greatest(length(a.text), length(b.text))::BIGINT AS maxlen
              FROM cands JOIN documents a ON cands.da = a.doc_id
                         JOIN documents b ON cands.db = b.doc_id)
            WHERE lev * $EditDenom <= maxlen * $EditNum""",
      "q140_temperature_mix" ->
        s"""WITH cnt AS (
              SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1),
            tot AS (SELECT sum(n)::BIGINT AS nt FROM cnt),
            scored AS (
              SELECT source, n,
                     round(exp(round($MixAlpha *
                       round(ln(n::DOUBLE / nt::DOUBLE), 9), 9)), 9)::DECIMAL(18,9) AS q
              FROM cnt, tot),
            qsum AS (SELECT sum(q) AS qs FROM scored)
            SELECT source, n,
                   round(q::DOUBLE / qs::DOUBLE, 9) AS weight,
                   floor(q::DOUBLE / qs::DOUBLE * ${MixBudget}.0)::BIGINT AS alloc,
                   round(floor(q::DOUBLE / qs::DOUBLE * ${MixBudget}.0) / n::DOUBLE, 6) AS epochs
            FROM scored, qsum""",
      "q142_decayed_sum" ->
        s"""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS us, value FROM events),
            tmax AS (SELECT max(us) AS ts_max FROM ev)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(sum(round(
                     round(exp(round((ts_max - us)::DOUBLE / 86400000000.0
                                     * -$DecayPerDay, 9)), 9)
                     * value, 9)::DECIMAL(18,9))::DOUBLE, 6) AS decayed_value,
                   sum(value::DECIMAL(18,2))::DOUBLE AS raw_value
            FROM ev, tmax GROUP BY user_id""",
      "q143_fk_profile" -> {
        def prof(name: String, childExpr: String, childTbl: String,
                 parentExpr: String, parentTbl: String): String =
          s"""SELECT '$name' AS fk, count(*)::BIGINT AS n_child_keys,
                     sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contained,
                     round(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                           / count(*)::DOUBLE, 6) AS containment,
                     (sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) = count(*)) AS is_fk
              FROM (SELECT DISTINCT $childExpr AS k FROM $childTbl) c
              LEFT JOIN (SELECT DISTINCT $parentExpr AS p FROM $parentTbl) x
                ON c.k = x.p"""
        Seq(
          prof("lineitem.l_orderkey->orders.o_orderkey",
            "l_orderkey", "lineitem", "o_orderkey", "orders"),
          prof("orders.o_custkey->customer.c_custkey",
            "o_custkey", "orders", "c_custkey", "customer"),
          prof("lineitem.l_partkey->part.p_partkey",
            "l_partkey", "lineitem", "p_partkey", "part"),
          prof("customer.c_nationkey->nation.n_nationkey",
            "c_nationkey", "customer", "n_nationkey", "nation"),
          prof("events.user_id->customer.c_custkey",
            "user_id", "events", "c_custkey", "customer"),
        ).mkString("\nUNION ALL\n")
      },
      "q144_kcore" -> {
        def peelSql(prev: String, cur: String): String =
          s"""$cur AS (
                SELECT u, v FROM $prev
                WHERE u IN (SELECT n FROM (
                        SELECT n, count(*) AS deg FROM (
                          SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
                        GROUP BY 1) WHERE deg >= $CoreK)
                  AND v IN (SELECT n FROM (
                        SELECT n, count(*) AS deg FROM (
                          SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
                        GROUP BY 1) WHERE deg >= $CoreK))"""
        def statsSql(tbl: String, r: Int): String =
          s"""SELECT ${r}::BIGINT AS peel,
                     (SELECT count(DISTINCT n) FROM (
                        SELECT u AS n FROM $tbl UNION ALL SELECT v FROM $tbl))::BIGINT AS n_nodes,
                     (SELECT count(*) FROM $tbl)::BIGINT AS n_edges"""
        s"""WITH e0 AS (
              SELECT DISTINCT l_suppkey::BIGINT AS u,
                     (l_partkey + $PrPartOffset)::BIGINT AS v
              FROM lineitem),
            ${peelSql("e0", "e1")},
            ${peelSql("e1", "e2")}
            ${statsSql("e0", 0)}
            UNION ALL ${statsSql("e1", 1)}
            UNION ALL ${statsSql("e2", 2)}"""
      },
    )
  }
}
