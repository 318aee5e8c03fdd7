package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Dedup, Sketches, TextAnalysis}
import graft.queries.ScaleQueries.PrPartOffset

/** Round-5 corpus/analytics operators: repetition filtering, sequence
  * packing, token entropy, a PageRank power-iteration, weighted
  * reservoir sampling, robust (median/MAD) outlier detection, PMI
  * collocations, HLL set intersection, Z-order layout keys, and a 2-D
  * skyline. Same shared-constants discipline as the earlier families
  * (functions/Portable.scala): the Spark plan and the DuckDB oracle are
  * generated from the same Scala constants so the gate checks values,
  * not just shapes.
  *
  * Scale notes are per-operator; the recurring shapes are (a) per-row
  * scalar chains, (b) one or two hash-aggregates on a key that already
  * partitions the data, and (c) register/sketch tables whose size is
  * independent of the input.
  */
object AnalyticsQueries {

  /** Greedy sequence-packing capacity (tokens per training sequence). */
  val PackCapacity = 256L
  /** q161 BFS horizon (bounds the oracle's recursive expansion). */
  val BfsMaxDepth = 6L
  /** DuckDB fold accumulator packing base for (bins, cur): both counters
    * stay far below 2^32 (docs are < 600 chars). */
  private val PackB = 1L << 32

  /** PageRank damping in thousandths (d = 0.85). */
  private val Damping = 0.85
  /** Weighted-sample uniform grid: u = (mix % 10^6 + 1) / 10^6. */
  private val UGrid = 1000000L

  /** Z-order geometry: 8 bits per dimension, price quantum 2000.0,
    * day quantum 16, bucket = z div 1024. */
  private val ZBits = 8
  private val ZPriceQ = 2000.0
  private val ZDayQ = 16L
  private val ZBucketDiv = 1024L
  /** Bit-interleave px (even bits) and py (odd bits) with generated
    * div/mod arithmetic — no engine bit intrinsics, mirroring hllRho's
    * portable construction. */
  private def zInterleaveSql(px: String, py: String): String =
    (0 until ZBits).map { j =>
      val p2 = 1L << j
      s"(($px div $p2) % 2) * ${1L << (2 * j)} + (($py div $p2) % 2) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")
  private def zInterleaveDuck(px: String, py: String): String =
    (0 until ZBits).map { j =>
      val p2 = 1L << j
      s"(($px // $p2) % 2) * ${1L << (2 * j)} + (($py // $p2) % 2) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style repetition signals per document: duplicate-token
    // ratio and the fraction of adjacent bigrams occupied by the single
    // most frequent bigram (Rae et al. '21 repetition filters). One scan:
    // token hashes materialized once, per-row distinct count, then two
    // hash-aggregates on doc_id (bigram frequency → per-doc max) with the
    // constants n/nd carried through the grouping — no join back. Both
    // fractions are single IEEE divisions of exact integers.
    "q101_repetition" -> ((s, d) => {
      // Two traps dodged here (both measured at sf0.1): the repartition
      // is a materialization barrier so combineAdjacent's element_at hits
      // a REALIZED th (the q52 inline-HOF trap), and the explode must be
      // explode_outer — InferFiltersFromGenerate otherwise derives
      // size(sh)>0 and pushes it below the exchange with sh fully
      // INLINED, re-running the whole O(n²) chain per row inside the
      // Filter (9.2 s vs 0.9 s). No empty sh exists (size >= 2 guard),
      // so outer ≡ inner.
      // n_types (nd) counts distinct RAW tokens, not distinct charFold
      // hashes — a hash collision must not understate the type count
      // versus the Gopher repetition definition. th is still referenced
      // twice below (size + combineAdjacent) so it stays materialized.
      val toks = tokens(col("text"))
      val base = documents(s, d).filter(size(toks) >= 2)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          size(array_distinct(toks)).cast("long").as("nd"),
          transform(toks, t => charFold(t)).as("th"))
        .select(col("doc_id"), size(col("th")).cast("long").as("n"),
          col("nd"), Dedup.combineAdjacent(col("th")).as("sh"))
      base.select(col("doc_id"), col("n"), col("nd"), explode_outer(col("sh")).as("bh"))
        .groupBy(col("doc_id"), col("bh"))
        .agg(count(lit(1)).as("c"), max(col("n")).as("n"), max(col("nd")).as("nd"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_toks"), max(col("nd")).as("n_types"),
          max(col("c")).as("topc"))
        .select(col("doc_id"), col("n_toks"), col("n_types"),
          ((col("n_toks") - col("n_types")).cast("double") /
            col("n_toks").cast("double")).as("dup_ratio"),
          (col("topc").cast("double") /
            (col("n_toks") - 1).cast("double")).as("top_bigram_frac"))
    }),

    // Greedy sequence packing: order each language stratum by content
    // hash, fill 256-token training sequences first-fit-in-order, and
    // report bins + fill ratio — the batch-packing step before writing
    // pretraining shards. The fold is inherently sequential WITHIN a
    // stratum (pack state carries across docs), so the stratum is the
    // parallel unit: at 100 TB the key becomes (lang, hash-shard) and
    // packing runs per shard — same fold, bounded group size. Counters
    // fold as a struct in Spark and as one packed BIGINT in DuckDB
    // (list_reduce STRUCT accumulators are unreliable — NOTES.md).
    "q102_seq_packing" -> ((s, d) => {
      val C = PackCapacity
      val fold = (acc: Column, nn: Column) => {
        val fits = (acc("cur") + nn <= C) || (acc("cur") === 0)
        struct(
          when(fits, acc("bins")).otherwise(acc("bins") + 1).as("bins"),
          when(fits, acc("cur") + nn).otherwise(nn).as("cur"))
      }
      documents(s, d)
        .select(col("lang"), col("doc_id"), charFold(col("text")).as("hk"),
          size(tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_toks"),
          sort_array(collect_list(struct(col("hk"), col("doc_id"), col("n")))).as("ds"))
        .select(col("lang"), col("n_docs"), col("n_toks"),
          aggregate(transform(col("ds"), r => r("n")),
            struct(lit(0L).as("bins"), lit(0L).as("cur")), fold).as("acc"))
        .select(col("lang"), col("n_docs"), col("n_toks"),
          (col("acc.bins") + (col("acc.cur") > 0).cast("long")).as("n_bins"))
        .select(col("lang"), col("n_docs"), col("n_toks"), col("n_bins"),
          // nullif guards the degenerate stratum whose docs all tokenize
          // to zero tokens (n_bins = 0): fill_milli is NULL there instead
          // of an ANSI divide-by-zero error.
          expr(s"(n_toks * 1000) div (nullif(n_bins, 0) * $C)").as("fill_milli"))
    }),

    // Shannon entropy of each document's token distribution (type-token
    // diversity — the complement of q101's repetition ratio; low entropy
    // = TEMPLATE/boilerplate text). One shuffle on doc_id shared by the
    // window (total count) and the final aggregate. Per-term entropy
    // contributions are rounded to 9 dp and summed as DECIMAL so the
    // per-doc sum is exact and partition-order-independent (q99 pattern).
    "q103_token_entropy" -> ((s, d) => {
      val p = col("c").cast("double") / col("n").cast("double")
      documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
        .select(col("doc_id"), col("n"),
          round(-(p * log(p)), 9).cast("decimal(18,9)").as("he"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_toks"), count(lit(1)).as("n_types"),
          round(sum(col("he")).cast("double"), 6).as("entropy"))
    }),

    // One PageRank power-iteration over the supplier→part supply graph
    // (distinct lineitem edges), uniform start vector: r1(part) =
    // (1-d)/N + d·Σ r0/outdeg(supp). The iteration is ONE join of the
    // O(|nodes|) outdegree table against the edge list plus one aggregate
    // on the destination key — the exact per-step shape of a 100 TB
    // PageRank, where only the rank vector reshuffles each step. No
    // broadcast hint on outdeg (node-sized, grows with the graph — AQE
    // picks from stats); q120 shows the co-partitioned multi-round form.
    // Per-edge contributions are rounded to 12 dp and summed as DECIMAL
    // so the Σ is order-independent.
    "q104_pagerank_step" -> ((s, d) => {
      val edges = lineitem(s, d)
        .select(col("l_suppkey"), col("l_partkey")).distinct()
      val outdeg = edges.groupBy(col("l_suppkey")).agg(count(lit(1)).as("od"))
      val totals = edges.agg(
        (countDistinct(col("l_suppkey")) + countDistinct(col("l_partkey"))).as("nn"))
      edges.join(outdeg, "l_suppkey")
        .crossJoin(broadcast(totals))
        .select(col("l_partkey"), col("nn"),
          round(lit(Damping) / (col("nn") * col("od")).cast("double"), 12)
            .cast("decimal(18,12)").as("contrib"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_in"), sum(col("contrib")).as("sc"), max(col("nn")).as("nn"))
        .select(col("l_partkey").as("node"), col("n_in"),
          (col("sc") + round(lit(1.0 - Damping) / col("nn").cast("double"), 12)
            .cast("decimal(18,12)")).cast("double").as("rank1"))
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // priority key = -ln(u)/w with u a deterministic hash-uniform in
    // (0,1] and w = doc length; the global top-100 by ascending key IS
    // the weighted sample. The key is a per-row scalar chain and the
    // selection is TakeOrderedAndProject (orderBy+limit) — no global
    // sort materializes, each partition contributes its local top-k.
    // ln is rounded to 9 dp (libm rule); ties broken by doc_id.
    "q105_weighted_sample" -> ((s, d) => {
      val u = (Sketches.hllMix(charFold(col("text"))) % UGrid + 1).cast("double") /
        lit(UGrid.toDouble)
      val w = greatest(col("n_chars"), lit(1L))
      documents(s, d)
        .select(col("doc_id"), col("lang"), w.as("w"),
          round(-log(u) / w.cast("double"), 9).as("k"))
        .orderBy(col("k"), col("doc_id"))
        .limit(100)
    }),

    // Robust outlier detection per event type: median via exact
    // interpolated percentile (the q54 cross-engine pair), MAD =
    // median(|v − med|), outliers = |v − med| > 3·MAD. Two grouped
    // percentiles over a handful of groups with the medians broadcast
    // back — the fact stream never reshuffles. The z-score analog that
    // survives heavy-tailed value distributions.
    "q106_mad_outliers" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("med"), abs(col("value") - col("med")).as("dd"))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dd, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("dd") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
    }),

    // Pointwise mutual information of adjacent token pairs (collocation
    // mining): pmi = ln(c_xy·T_u² / (T_b·c_x·c_y)), support ≥ 5, top 20.
    // Pair and unigram counts are two hash-aggregates over one token
    // scan; the vocabulary joins back by term key (vocabulary-sized —
    // no broadcast hint, AQE picks); the final selection is TakeOrdered. The count products are formed in DOUBLE from the
    // start (n_pair·tu·tu reaches 2^63 once corpus tokens pass ~2^21,
    // which a larger SF does) — both engines multiply doubles in the
    // same left-to-right order, so the hash gate holds.
    "q107_pmi_pairs" -> ((s, d) => {
      val base = documents(s, d)
        .select(tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("tk"), size(col("tk")).as("n"))
      val pairs = base
        .select(col("tk"), explode(sequence(lit(1), col("n") - 1)).as("i"))
        .select(element_at(col("tk"), col("i")).as("t1"),
          element_at(col("tk"), col("i") + 1).as("t2"))
      val pc = pairs.groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 5)
      // materialized ONCE: three consumers (t1 join, t2 join, totals) —
      // without the checkpoint each re-derives the full token aggregate
      val uni = documents(s, d)
        .select(explode(tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val totals = uni.agg(sum(col("c")).as("tu"))
        .crossJoin(pairs.agg(count(lit(1)).as("tb")))
      pc.join(uni.select(col("t").as("t1"), col("c").as("c1")), "t1")
        .join(uni.select(col("t").as("t2"), col("c").as("c2")), "t2")
        .crossJoin(broadcast(totals))
        .select(col("t1"), col("t2"), col("n_pair"),
          round(log((col("n_pair").cast("double") * col("tu").cast("double") *
            col("tu").cast("double")) /
            (col("tb").cast("double") * col("c1").cast("double") *
              col("c2").cast("double"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("t1"), col("t2"))
        .limit(20)
    }),

    // HLL set intersection by inclusion–exclusion: |click ∩ purchase| ≈
    // est(A) + est(B) − est(A ∪ B), where the union estimate comes from
    // MERGING the two register tables (bucket-wise max) — no rescan of
    // either input. The audience-overlap query every corpus/user store
    // answers from pre-built per-segment sketches; the exact intersection
    // rides along to measure the error.
    "q108_hll_intersect" -> ((s, d) => {
      import Sketches._
      val m = HllBuckets
      def regs(t: String): DataFrame =
        hllRegisters(events(s, d).filter(col("event_type") === t), col("user_id"))
      def estimate(r: DataFrame, name: String): DataFrame = {
        val harmonic =
          aggregate(col("rs"), lit(0.0), (acc, rr) =>
            acc + lit(1.0) /
              call_function("shiftleft", lit(1L), rr("mx").cast("int")).cast("double")) +
            (lit(m) - col("nb")).cast("double")
        r.agg(
            sort_array(collect_list(struct(col("bucket"), col("mx")))).as("rs"),
            count(lit(1)).as("nb"))
          .select((hllAlphaM2 / harmonic).as("eraw"), (lit(m) - col("nb")).as("nv"))
          .select(round(when(col("eraw") <= 2.5 * m && col("nv") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("nv").cast("double")))
            .otherwise(col("eraw")), 6).as(name))
      }
      val ra = regs("click").localCheckpoint()
      val rb = regs("purchase").localCheckpoint()
      val ru = ra.unionByName(rb).groupBy(col("bucket")).agg(max(col("mx")).as("mx"))
      val exact = events(s, d).filter(col("event_type") === "click")
        .select(col("user_id")).distinct()
        .join(events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct(), "user_id")
        .agg(count(lit(1)).as("n_exact"))
      estimate(ra, "est_a").crossJoin(estimate(rb, "est_b"))
        .crossJoin(estimate(ru, "est_union")).crossJoin(exact)
        .select(col("est_a"), col("est_b"), col("est_union"),
          round(col("est_a") + col("est_b") - col("est_union"), 6).as("est_inter"),
          col("n_exact"))
        .select(col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
          col("n_exact"),
          // nullif: disjoint audiences (n_exact = 0) yield a NULL err
          // rather than engine-divergent NaN/Inf representations.
          round(abs(col("est_inter") - col("n_exact").cast("double")) /
            nullif(col("n_exact"), lit(0L)).cast("double"), 6).as("err"))
    }),

    // Z-order (Morton) layout keys over (price, order-day): quantize each
    // dimension to 8 bits, bit-interleave with portable div/mod
    // arithmetic, and report per-bucket occupancy + per-dimension ranges
    // — the multi-dimensional clustering key a 100 TB table is SORTED BY
    // so that 2-D range predicates prune file-level min/max zones on
    // both columns at once. Per-row scalar chain + one aggregate.
    "q109_zorder" -> ((s, d) => {
      orders(s, d)
        .select(
          expr(s"least(greatest(cast(floor(o_totalprice / $ZPriceQ) as bigint), 0L), 255L)").as("px"),
          expr(s"least(greatest(datediff(cast(o_orderdate as date), date'1992-01-01') div $ZDayQ, 0L), 255L)")
            .cast("long").as("py"))
        .select(col("px"), col("py"), expr(zInterleaveSql("px", "py")).as("z"))
        .groupBy(expr(s"z div $ZBucketDiv").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("px")).as("px_min"), max(col("px")).as("px_max"),
          min(col("py")).as("py_min"), max(col("py")).as("py_max"))
    }),

    // 2-D skyline (Pareto frontier) of parts maximizing (retail price,
    // size): sort by (price desc, size desc) — a point is on the frontier
    // iff its size exceeds the running max over all strictly-preferred
    // predecessors. Skylines are algebraically mergeable (skyline(∪
    // partition skylines) = skyline(whole)), and that merge is STRUCTURAL
    // here: a per-partition local skyline pass runs first, so the global
    // single-partition window only ever sees the union of per-partition
    // frontiers, not the distinct-pair table.
    "q110_skyline" -> ((s, d) => {
      def skyline(df: DataFrame,
          w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
        df.withColumn("m", max(col("sz"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .filter(col("m").isNull || col("sz") > col("m"))
          .select(col("price"), col("sz"))
      val pairs = part(s, d)
        .select(col("p_retailprice").as("price"), col("p_size").cast("long").as("sz"))
        .distinct()
      val local = skyline(pairs, Window.partitionBy(spark_partition_id())
        .orderBy(col("price").desc, col("sz").desc))
      // fenced: ≤ Σ per-partition frontier sizes (local pre-pass above)
      skyline(local, Window.orderBy(col("price").desc, col("sz").desc))
    }),

    // Multi-source BFS shortest-hops over the undirected supplier↔part
    // supply graph (q120's graph): min hop count from the seed suppliers
    // {1..5} to every node reachable within 6 hops. Frontier expansion,
    // not path enumeration: each round is ONE shuffle join where only the
    // O(frontier) rows move against the co-partitioned persisted edge
    // list (q120's mechanism — the O(|edges|) side never reshuffles),
    // then an anti-join against the visited set drops already-discovered
    // nodes, so a node is labeled the FIRST round it appears = its BFS
    // distance. Work per round ∝ frontier ∪ visited, never |V|×depth;
    // the oracle's recursive CTE enumerates (node, dist) pairs and
    // min-aggregates — same relation, quadratic-in-depth state the
    // distributed form never materializes.
    "q161_bfs_hops" -> ((s, d) => {
      val edges = lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + PrPartOffset).as("dst")).distinct()
      val bidir = edges.union(edges.select(col("dst"), col("src")))
        .repartition(s.sessionState.conf.numShufflePartitions, col("src"))
        .persist()
      val sources = edges.select(col("src")).filter(col("src") <= 5).distinct()
      var visited = sources.select(col("src").as("node"), lit(0L).as("dist"))
        .localCheckpoint()
      var frontier = visited.select(col("node"))
      var depth = 0L
      // per-round DRIVER action: one `frontier.isEmpty` — an existence
      // probe (first non-empty partition short-circuits), the bounded
      // scalar BFS termination inherently needs; ≤ BfsMaxDepth rounds,
      // nothing row-sized ever reaches the driver. PlanShapeSpec pins
      // the round's exchange shape (frontier-sized only).
      while (depth < BfsMaxDepth && !frontier.isEmpty) {
        depth += 1
        // next frontier materialized once (frontier-sized); the visited
        // set stays a UNION of those already-materialized pieces, so no
        // round re-materializes more than its own discoveries
        val next = bidir.join(frontier, bidir("src") === frontier("node"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .select(col("node"), lit(depth).as("dist"))
          .localCheckpoint()
        visited = visited.unionByName(next)
        frontier = next.select(col("node"))
      }
      bidir.unpersist()
      visited
    }),

    // Retention cohort matrix — the product-analytics staple: users
    // cohorted by first-active day; for each (cohort, day-offset ≤ 13)
    // the count of cohort members active that day, the cohort size, and
    // the retention rate in exact integer millis (q125's div rule — no
    // float rounding to drift). Shape: ONE user_id aggregate collapses a
    // user to their sorted active-day set (bounded: ≤ observation window
    // days — a naive distinct would partition on (user, day) and force a
    // second user_id shuffle), the cohort = the set's head, offsets
    // explode from composite-sized rows, and one (cohort, offset)
    // aggregate closes. Cohort size needs no join: offset 0 is every
    // member's first-active day, so n_active(cohort, 0) IS the size —
    // lifted by a window over the days×14-bounded matrix [fenced].
    "q164_retention_cohorts" -> ((s, d) => {
      val perUser = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("day"))).as("days"))
      perUser
        .select(element_at(col("days"), 1).as("cohort"),
          explode(col("days")).as("day"))
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
        .filter(col("day_offset") <= 13)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .withColumn("cohort_size", // fenced: ≤ #days × 14 rows
          max(when(col("day_offset") === 0, col("n_active")))
            .over(Window.partitionBy(col("cohort"))))
        .select(col("cohort"), col("day_offset"), col("n_active"),
          col("cohort_size"),
          expr("(n_active * 1000) div cohort_size").as("ret_milli"))
    }),

    // First-order Markov transition matrix over per-user event sequences
    // (the path-analysis primitive behind "what happens after a click").
    // One lead window partitioned by user_id, one (from, to) aggregate on
    // the same exchange's output, then probabilities on the
    // |types|²-bounded transition table — rates in exact integer millis
    // (q125's div rule). Ordering ties broken by event_id so the
    // sequence — and therefore the matrix — is deterministic.
    "q168_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_state", lead(col("event_type"), 1).over(w))
        .filter(col("to_state").isNotNull)
      val trans = pairs
        .groupBy(col("event_type").as("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n_trans"))
      val wf = Window.partitionBy(col("from_state")) // bounded: ≤ |types|² rows
      trans.withColumn("n_from", sum(col("n_trans")).over(wf))
        .select(col("from_state"), col("to_state"), col("n_trans"),
          col("n_from"),
          expr("(n_trans * 1000) div n_from").as("p_milli"))
    }),

    // Kaplan-Meier survival over time-to-first-purchase (hours from a
    // user's first event), users without a purchase right-censored at
    // their last activity — the estimator that handles censoring
    // correctly where a naive mean cannot. Per-user reduction is one
    // aggregate; the KM table lives on the duration grid (≤ observation
    // window in hours), where the at-risk counts and the cumulative
    // product run as fenced windows. The product follows the q99 ln
    // discipline: per-term ln rounded to 9 dp, summed as DECIMAL (exact,
    // order-free), exp at the end; a step where every at-risk user
    // converts drives survival to exactly 0 (ln would be -inf — guarded
    // on both engines).
    "q169_km_purchase" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val per = events(s, d).groupBy(col("user_id")).agg(
        min(us).as("f"), max(us).as("l"),
        min(when(col("event_type") === "purchase", us)).as("p"))
      val users = per
        .withColumn("t", expr("(coalesce(p, l) - f) div 3600000000"))
        .withColumn("ev", col("p").isNotNull.cast("long"))
      val byT = users.groupBy(col("t"))
        .agg(sum(col("ev")).as("n_event"), count(lit(1)).as("n_all"))
      // fenced: ≤ #distinct durations (observation window in hours)
      val wRisk = Window.orderBy(col("t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("n_all")).over(wRisk))
        .filter(col("n_event") > 0)
        .withColumn("lnterm",
          when(col("n_event") < col("n_risk"),
            round(log(lit(1.0) -
              col("n_event").cast("double") / col("n_risk").cast("double")), 9)
              .cast("decimal(18,9)")))
        .withColumn("nz",
          sum((col("n_event") === col("n_risk")).cast("long")).over(wCum))
        .withColumn("cum", sum(col("lnterm")).over(wCum))
        .select(col("t"), col("n_risk"), col("n_event"),
          when(col("nz") > 0, lit(0.0))
            .otherwise(round(exp(col("cum").cast("double")), 6)).as("surv"))
    }),

    // Reliability (calibration) curve of the quality score against the
    // lang=='en' gold label — the companion to q138's AUC: AUC says the
    // filter RANKS well, this says whether the score VALUES mean what
    // they claim, decile by decile. One corpus aggregate onto a ≤10-row
    // table; mean score via 9-dp DECIMAL partials (order-free), observed
    // rate in exact integer millis.
    "q170_calibration" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val scored = documents(s, d).select(
        TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("sc"),
        (col("lang") === "en").cast("long").as("pos"))
      scored
        .select(least(floor(col("sc") * 10).cast("long"), lit(9L)).as("bin"),
          col("sc"), col("pos"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          round((sum(round(col("sc"), 9).cast("decimal(18,9)")) /
            count(lit(1))).cast("double"), 6).as("mean_score"))
        .select(col("bin"), col("n"), col("n_pos"), col("mean_score"),
          expr("(n_pos * 1000) div n").as("obs_milli"))
    }),

    // Two-proportion z-test on an A/B split (user_id parity): did group
    // B's 24-hour first-purchase conversion differ? Per-user reduction
    // reuses q169's first/ first-purchase micros; the test statistic is
    // computed from 4 counters on a 1-row frame. Every arithmetic step
    // (rational-to-double division, sqrt) is IEEE-correctly-rounded, so
    // the statistic is bit-identical cross-engine; rounded to 9 dp
    // anyway per house rule.
    "q171_ab_ztest" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val per = events(s, d).groupBy(col("user_id")).agg(
        min(us).as("f"),
        min(when(col("event_type") === "purchase", us)).as("p"))
      val conv = per.select((col("user_id") % 2).as("grp"),
        (col("p").isNotNull &&
          col("p") - col("f") <= lit(86400000000L)).cast("long").as("cv"))
      val wide = conv.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cv")).as("x"))
        .agg(
          sum(when(col("grp") === 0, col("n"))).as("n_a"),
          sum(when(col("grp") === 0, col("x"))).as("x_a"),
          sum(when(col("grp") === 1, col("n"))).as("n_b"),
          sum(when(col("grp") === 1, col("x"))).as("x_b"))
      val pa = col("x_a").cast("double") / col("n_a").cast("double")
      val pb = col("x_b").cast("double") / col("n_b").cast("double")
      val ph = (col("x_a") + col("x_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      wide.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        round((pa - pb) /
          sqrt(ph * (lit(1.0) - ph) *
            (lit(1.0) / col("n_a").cast("double") +
             lit(1.0) / col("n_b").cast("double"))), 9).as("z"))
    }),
  )

  val oracle: Map[String, String] = {
    val tokSql = tokensSql("text")
    Map(
      "q101_repetition" ->
        s"""WITH base AS (
              SELECT doc_id, len(list_distinct($tokSql))::BIGINT AS nd,
                     list_transform($tokSql, t -> ${charFoldSql("t")}) AS th
              FROM documents),
            b2 AS (SELECT doc_id, len(th)::BIGINT AS n, nd,
                     ${Dedup.combineAdjacentSql("th")} AS sh
                   FROM base WHERE len(th) >= 2),
            bg AS (SELECT doc_id, n, nd, unnest(sh) AS bh FROM b2),
            pc AS (SELECT doc_id, bh, count(*)::BIGINT AS c,
                     max(n) AS n, max(nd) AS nd
                   FROM bg GROUP BY 1, 2)
            SELECT doc_id, max(n)::BIGINT AS n_toks, max(nd)::BIGINT AS n_types,
                   (max(n) - max(nd))::DOUBLE / max(n)::DOUBLE AS dup_ratio,
                   max(c)::DOUBLE / (max(n) - 1)::DOUBLE AS top_bigram_frac
            FROM pc GROUP BY 1""",
      "q102_seq_packing" -> {
        val C = PackCapacity
        val B = PackB
        s"""WITH base AS (
              SELECT lang, doc_id, ${charFoldSql("text")} AS hk,
                     len($tokSql)::BIGINT AS n
              FROM documents),
            g AS (
              SELECT lang, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS n_toks,
                     list_reduce(list_prepend(0::BIGINT, list(n ORDER BY hk, doc_id)),
                       (qa, qn) -> CASE WHEN qa % $B + qn <= $C OR qa % $B = 0
                                        THEN qa + qn
                                        ELSE (qa // $B + 1) * $B + qn END) AS acc
              FROM base GROUP BY 1),
            b AS (SELECT lang, n_docs, n_toks,
                    (acc // $B + CASE WHEN acc % $B > 0 THEN 1 ELSE 0 END)::BIGINT AS n_bins
                  FROM g)
            SELECT lang, n_docs, n_toks, n_bins,
                   ((n_toks * 1000) // (nullif(n_bins, 0) * $C))::BIGINT AS fill_milli
            FROM b"""
      },
      "q103_token_entropy" ->
        s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
            counts AS (SELECT doc_id, term, count(*)::BIGINT AS c
                       FROM toks GROUP BY 1, 2),
            wn AS (SELECT doc_id, c,
                     sum(c) OVER (PARTITION BY doc_id)::BIGINT AS n
                   FROM counts)
            SELECT doc_id, max(n)::BIGINT AS n_toks, count(*)::BIGINT AS n_types,
                   round(CAST(sum(CAST(round(-((c::DOUBLE / n::DOUBLE) *
                     ln(c::DOUBLE / n::DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE), 6)
                     AS entropy
            FROM wn GROUP BY 1""",
      "q104_pagerank_step" ->
        s"""WITH edges AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
            outdeg AS (SELECT l_suppkey, count(*)::BIGINT AS od
                       FROM edges GROUP BY 1),
            totals AS (SELECT (count(DISTINCT l_suppkey) +
                               count(DISTINCT l_partkey))::BIGINT AS nn
                       FROM edges)
            SELECT l_partkey AS node, count(*)::BIGINT AS n_in,
                   CAST(sum(CAST(round($Damping / (nn * od)::DOUBLE, 12)
                       AS DECIMAL(18,12))) +
                     CAST(round(${1.0 - Damping} / max(nn)::DOUBLE, 12)
                       AS DECIMAL(18,12)) AS DOUBLE) AS rank1
            FROM edges JOIN outdeg USING (l_suppkey), totals
            GROUP BY 1""",
      "q105_weighted_sample" ->
        s"""SELECT doc_id, lang, w, k FROM (
              SELECT doc_id, lang, greatest(n_chars, 1)::BIGINT AS w,
                     round(-ln((${Sketches.hllMixSql(charFoldSql("text"))} % $UGrid + 1)::DOUBLE
                       / $UGrid.0) / greatest(n_chars, 1)::DOUBLE, 9) AS k
              FROM documents)
            ORDER BY k, doc_id LIMIT 100""",
      "q106_mad_outliers" ->
        s"""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                         FROM events GROUP BY 1),
            dev AS (SELECT events.event_type, med, abs(value - med) AS dd
                    FROM events JOIN med USING (event_type)),
            mad AS (SELECT event_type, quantile_cont(dd, 0.5) AS mad
                    FROM dev GROUP BY 1)
            SELECT dev.event_type, min(med) AS med, min(mad.mad) AS mad,
                   count(*)::BIGINT AS n,
                   sum(CASE WHEN dd > 3.0 * mad.mad THEN 1 ELSE 0 END)::BIGINT
                     AS n_outliers
            FROM dev JOIN mad USING (event_type)
            GROUP BY 1""",
      "q107_pmi_pairs" ->
        s"""WITH base AS (
              SELECT tk, len(tk)::BIGINT AS n FROM (
                SELECT $tokSql AS tk FROM documents)
              WHERE len(tk) >= 2),
            pairs AS (SELECT tk[i] AS t1, tk[i + 1] AS t2 FROM (
                        SELECT tk, unnest(range(1, n)) AS i FROM base)),
            pc AS (SELECT t1, t2, count(*)::BIGINT AS n_pair
                   FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5),
            uni AS (SELECT t, count(*)::BIGINT AS c FROM (
                      SELECT unnest($tokSql) AS t FROM documents)
                    GROUP BY 1),
            totals AS (SELECT (SELECT sum(c)::BIGINT FROM uni) AS tu,
                              (SELECT count(*)::BIGINT FROM pairs) AS tb)
            SELECT t1, t2, n_pair,
                   round(ln((n_pair::DOUBLE * tu::DOUBLE * tu::DOUBLE) /
                     (tb::DOUBLE * u1.c::DOUBLE * u2.c::DOUBLE)), 6) AS pmi
            FROM pc JOIN uni u1 ON t1 = u1.t JOIN uni u2 ON t2 = u2.t, totals
            ORDER BY pmi DESC, t1, t2 LIMIT 20""",
      "q108_hll_intersect" -> {
        import Sketches._
        val m = HllBuckets
        def regsSql(t: String) =
          s"""SELECT bucket, max(rho) AS mx FROM (
                SELECT bucket, ${hllRhoSql("w")} AS rho FROM (
                  SELECT h1 % $m AS bucket, ${hllMixSql("h1")} AS w FROM (
                    SELECT ${hllMixSql("h0")} AS h1 FROM (
                      SELECT ${hllHashSql("CAST(user_id AS VARCHAR)")} AS h0
                      FROM events WHERE event_type = '$t'))))
              GROUP BY bucket"""
        def estSql(regsCte: String, out: String) =
          s"""SELECT round(CASE WHEN eraw <= ${2.5 * m} AND nv > 0
                                THEN $m.0 * ln($m.0 / nv::DOUBLE)
                                ELSE eraw END, 6) AS $out
              FROM (
                SELECT $hllAlphaM2Sql /
                         (list_reduce(list_prepend(0.0::DOUBLE,
                            list_transform(rs, rr ->
                              1.0::DOUBLE / ((1::BIGINT << rr.mx)::DOUBLE))),
                            (sa, sb) -> sa + sb)
                          + ($m - nb)::DOUBLE) AS eraw,
                       ($m - nb) AS nv
                FROM (SELECT list({'bucket': bucket, 'mx': mx} ORDER BY bucket) AS rs,
                             CAST(count(*) AS BIGINT) AS nb
                      FROM $regsCte))"""
        s"""WITH ca AS (${regsSql("click")}),
              cb AS (${regsSql("purchase")}),
              cu AS (SELECT bucket, max(mx) AS mx FROM
                       (SELECT * FROM ca UNION ALL SELECT * FROM cb)
                     GROUP BY bucket),
              ea AS (${estSql("ca", "est_a")}),
              eb AS (${estSql("cb", "est_b")}),
              eu AS (${estSql("cu", "est_union")}),
              ex AS (SELECT count(*)::BIGINT AS n_exact FROM
                       (SELECT DISTINCT user_id FROM events
                        WHERE event_type = 'click') a
                     JOIN (SELECT DISTINCT user_id FROM events
                           WHERE event_type = 'purchase') b USING (user_id)),
              s0 AS (SELECT est_a, est_b, est_union,
                       round(est_a + est_b - est_union, 6) AS est_inter, n_exact
                     FROM ea, eb, eu, ex)
            SELECT est_a, est_b, est_union, est_inter, n_exact,
                   round(abs(est_inter - n_exact::DOUBLE) /
                     nullif(n_exact, 0)::DOUBLE, 6) AS err
            FROM s0"""
      },
      "q109_zorder" ->
        s"""WITH q AS (
              SELECT least(greatest(CAST(floor(o_totalprice / $ZPriceQ) AS BIGINT), 0), 255) AS px,
                     least(greatest(date_diff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) // $ZDayQ, 0), 255)::BIGINT AS py
              FROM orders),
            z AS (SELECT px, py, ${zInterleaveDuck("px", "py")} AS z FROM q)
            SELECT (z // $ZBucketDiv)::BIGINT AS zbucket, count(*)::BIGINT AS n,
                   min(px)::BIGINT AS px_min, max(px)::BIGINT AS px_max,
                   min(py)::BIGINT AS py_min, max(py)::BIGINT AS py_max
            FROM z GROUP BY 1""",
      "q110_skyline" ->
        """SELECT price, sz FROM (
             SELECT price, sz,
                    max(sz) OVER (ORDER BY price DESC, sz DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
             FROM (SELECT DISTINCT p_retailprice AS price,
                          p_size::BIGINT AS sz FROM part))
           WHERE m IS NULL OR sz > m""",
      "q161_bfs_hops" ->
        s"""WITH RECURSIVE
              edges AS (SELECT DISTINCT l_suppkey::BIGINT AS src,
                               (l_partkey + $PrPartOffset)::BIGINT AS dst
                        FROM lineitem),
              bidir AS (SELECT src, dst FROM edges
                        UNION ALL SELECT dst AS src, src AS dst FROM edges),
              bfs(node, dist) AS (
                SELECT DISTINCT src AS node, 0::BIGINT AS dist
                FROM edges WHERE src <= 5
                UNION
                SELECT b.dst AS node, bfs.dist + 1 AS dist
                FROM bfs JOIN bidir b ON b.src = bfs.node
                WHERE bfs.dist < $BfsMaxDepth)
            SELECT node, min(dist)::BIGINT AS dist FROM bfs GROUP BY 1""",
      "q164_retention_cohorts" ->
        """WITH act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
            coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1),
            sizes AS (SELECT cohort, count(*)::BIGINT AS cohort_size
                      FROM coh GROUP BY 1),
            r AS (SELECT cohort, (day - cohort)::BIGINT AS day_offset,
                         count(*)::BIGINT AS n_active
                  FROM act JOIN coh USING (user_id)
                  WHERE (day - cohort) <= 13 GROUP BY 1, 2)
           SELECT cohort, day_offset, n_active, cohort_size,
                  (n_active * 1000) // cohort_size AS ret_milli
           FROM r JOIN sizes USING (cohort)""",
      "q168_markov_transitions" ->
        """WITH pairs AS (
             SELECT event_type AS from_state,
                    lead(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS to_state
             FROM events),
           trans AS (
             SELECT from_state, to_state, count(*)::BIGINT AS n_trans
             FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2)
           SELECT from_state, to_state, n_trans,
                  CAST(sum(n_trans) OVER (PARTITION BY from_state) AS BIGINT)
                    AS n_from,
                  CAST((n_trans * 1000) //
                    sum(n_trans) OVER (PARTITION BY from_state) AS BIGINT)
                    AS p_milli
           FROM trans""",
      "q169_km_purchase" ->
        """WITH per AS (
             SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l,
                    min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p
             FROM events GROUP BY 1),
           users AS (
             SELECT (coalesce(p, l) - f) // 3600000000 AS t,
                    (p IS NOT NULL)::BIGINT AS ev FROM per),
           byt AS (
             SELECT t, sum(ev)::BIGINT AS n_event, count(*)::BIGINT AS n_all
             FROM users GROUP BY 1),
           risk AS (
             SELECT t, n_event,
                    CAST(sum(n_all) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
             FROM byt),
           ev AS (
             SELECT t, n_risk, n_event,
                    CASE WHEN n_event < n_risk THEN
                      CAST(round(ln(1.0 - n_event::DOUBLE / n_risk::DOUBLE), 9)
                        AS DECIMAL(18,9)) END AS lnterm,
                    (n_event = n_risk)::BIGINT AS z
             FROM risk WHERE n_event > 0)
           SELECT t, n_risk, n_event,
                  CASE WHEN sum(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) > 0 THEN 0.0::DOUBLE
                       ELSE round(exp(CAST(sum(lnterm) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS DOUBLE)), 6) END AS surv
           FROM ev""",
      "q170_calibration" -> {
        val tokSql = tokensSql("text")
        val qSql = TextAnalysis.qualityScoreSql(
          "len(tk)::BIGINT",
          TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
          "length(text)")
        s"""WITH scored AS (
              SELECT $qSql AS sc,
                     (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos
              FROM (SELECT lang, text, $tokSql AS tk FROM documents)),
            b AS (SELECT least(CAST(floor(sc * 10) AS BIGINT), 9) AS bin,
                         sc, pos
                  FROM scored)
            SELECT bin, count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
                   round(CAST(sum(CAST(round(sc, 9) AS DECIMAL(18,9))) /
                     count(*) AS DOUBLE), 6) AS mean_score,
                   CAST((sum(pos) * 1000) // count(*) AS BIGINT) AS obs_milli
            FROM b GROUP BY 1"""
      },
      "q171_ab_ztest" ->
        """WITH per AS (
             SELECT user_id, min(epoch_us(ts)) AS f,
                    min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p
             FROM events GROUP BY 1),
           conv AS (
             SELECT user_id % 2 AS grp,
                    (CASE WHEN p IS NOT NULL AND p - f <= 86400000000
                     THEN 1 ELSE 0 END)::BIGINT AS cv
             FROM per),
           g AS (SELECT grp, count(*)::BIGINT AS n, sum(cv)::BIGINT AS x
                 FROM conv GROUP BY 1),
           wide AS (
             SELECT CAST(sum(CASE WHEN grp = 0 THEN n END) AS BIGINT) AS n_a,
                    CAST(sum(CASE WHEN grp = 0 THEN x END) AS BIGINT) AS x_a,
                    CAST(sum(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n_b,
                    CAST(sum(CASE WHEN grp = 1 THEN x END) AS BIGINT) AS x_b
             FROM g)
           SELECT n_a, x_a, n_b, x_b,
                  round((x_a::DOUBLE / n_a::DOUBLE - x_b::DOUBLE / n_b::DOUBLE) /
                    sqrt((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE *
                      (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE) *
                      (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)), 9) AS z
           FROM wide""",
    )
  }
}
