package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan shape assertions for queries whose 100 TB posture depends
  * on a specific topology — the claims PERF.md makes, executable. */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def countIn[T](plan: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Int = {
    var n = 0
    def walk(p: SparkPlan): Unit = {
      if (pf.isDefinedAt(p)) n += 1
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      // cross adaptive/stage boundaries (reused exchanges, query stages)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case _ => ()
      }
    }
    walk(plan)
    n
  }

  test("q58 contamination probes join via broadcast — the corpus side never shuffles for the join") {
    val plan = executedPlan(SparkEntry.queries("q58_contamination")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected a broadcast hash join for the probe set:\n$plan")
  }

  test("q60 stratified sampling plans with zero shuffles") {
    val plan = executedPlan(SparkEntry.queries("q60_stratified_sample")(spark, sf))
    assert(countIn(plan) { case e: ShuffleExchangeExec => e } == 0,
      s"sampling is a scan-stage filter; found a shuffle:\n$plan")
  }

  test("q62 url rollup shuffles only on the aggregate keys") {
    val plan = executedPlan(SparkEntry.queries("q62_url_normalize")(spark, sf))
    // count(*) + count(distinct user_id) over (domain, url_norm):
    // partial agg -> exchange on group keys -> distinct-expand exchange; no
    // join exchanges, nothing keyed on raw event columns
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 2, s"expected <= 2 aggregate exchanges, got $shuffles:\n$plan")
  }

  test("q63 sessionization shuffles once on user_id and reuses it for both windows and the rollup") {
    val plan = executedPlan(SparkEntry.queries("q63_sessionize")(spark, sf))
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    // lag window, running-sum window and the final group-by all partition by
    // user_id — one exchange, the rest reuse its partitioning
    assert(shuffles == 1, s"expected exactly 1 user_id exchange, got $shuffles:\n$plan")
  }

  test("q66 tf-idf broadcasts the vocabulary sides — the tf table never reshuffles for joins") {
    val plan = executedPlan(SparkEntry.queries("q66_tfidf")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected broadcast df join:\n$plan")
  }

  test("q87 CMS register joins broadcast — the probe table never shuffles for the estimates") {
    val plan = executedPlan(SparkEntry.queries("q87_cms_topk")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 3,
      s"expected 3 broadcast register joins:\n$plan")
  }

  test("q91 sign signatures and q93 resampling plan with zero shuffles") {
    Seq("q91_embed_signs", "q93_quality_resample").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sf))
      assert(countIn(plan) { case e: ShuffleExchangeExec => e } == 0,
        s"$q is a scan-stage projection/filter; found a shuffle:\n$plan")
    }
  }

  test("q89 chunking plans with zero shuffles (generate stays in the scan stage)") {
    val plan = executedPlan(SparkEntry.queries("q89_doc_chunks")(spark, sf))
    assert(countIn(plan) { case e: ShuffleExchangeExec => e } == 0,
      s"chunking is scan -> project -> generate; found a shuffle:\n$plan")
  }

  test("q92 quantization broadcasts the 64-row codebook back to the explode") {
    val plan = executedPlan(SparkEntry.queries("q92_quantize_int8")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected a broadcast codebook join:\n$plan")
  }

  test("q94 bloom probe joins the bit positions via broadcast") {
    val plan = executedPlan(SparkEntry.queries("q94_bloom_join")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected broadcast position join:\n$plan")
  }

  test("q111 DSIR scoring joins the 64-row weight table via broadcast and selects via TakeOrdered") {
    val df = SparkEntry.queries("q111_dsir")(spark, sf)
    val plan = executedPlan(df)
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected broadcast weight-table join:\n$plan")
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    } == 1, s"expected TakeOrderedAndProject top-100 (no global sort):\n$plan")
  }

  test("q114 PQ encoding broadcasts the codebooks — the embedding scan never shuffles before encode") {
    val plan = executedPlan(SparkEntry.queries("q114_pq_encode")(spark, sf))
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } >= 1, s"expected the 1-row codebook frame broadcast:\n$plan")
  }

  test("q118 range sharding assigns via one broadcast of the boundary row") {
    val plan = executedPlan(SparkEntry.queries("q118_range_shards")(spark, sf))
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } >= 1, s"expected the percentile-boundary broadcast:\n$plan")
    // percentile agg + final rollup: no other keyed exchanges
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 2, s"expected <= 2 aggregate exchanges, got $shuffles:\n$plan")
  }

  test("q125 fertility is one scan and one aggregate exchange") {
    val plan = executedPlan(SparkEntry.queries("q125_tokenizer_fertility")(spark, sf))
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 1, s"expected a single lang exchange, got $shuffles:\n$plan")
  }

  test("q126 set-sim join builds candidates by equi-join — no all-pairs operator anywhere") {
    val plan = executedPlan(SparkEntry.queries("q126_setsim_join")(spark, sf))
    assert(countIn(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } == 0, s"prefix filtering must never plan an all-pairs join:\n$plan")
  }

  test("q139/q146 dedup verifies run on equi-join candidates — no all-pairs operator") {
    Seq("q139_edit_dedup", "q146_containment").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sf))
      assert(countIn(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      } == 0, s"$q: signature candidates + key joins must never plan all-pairs:\n$plan")
    }
  }

  test("q127 SCD2 reuses one user_id exchange for both window passes") {
    val plan = executedPlan(SparkEntry.queries("q127_scd2")(spark, sf))
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 1,
      s"lag/row_number/lead share (user_id | vf_us, event_id); got $shuffles exchanges:\n$plan")
  }

  test("q128 edge-iterator: no all-pairs operator, no exchange carries wedge-expanded cardinality") {
    val df = SparkEntry.queries("q128_triangles")(spark, sf)
    val row = df.collect().head
    val nEdges = row.getAs[Long]("n_edges")
    val nWedges = row.getAs[Long]("n_wedges")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(countIn(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    } == 0, s"adjacency build + per-edge probe must plan as equi-joins:\n$plan")
    // the closing count must be the codegen'd sorted-array merge applied
    // per EDGE — the O(wedges) pair relation never materializes
    assert(countIn(plan) {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.SortedIntersectCountExpr])) => p
    } >= 1, s"expected the SortedIntersectCountExpr per-edge merge:\n$plan")
    // runtime cardinality audit: every exchange in the post-checkpoint plan
    // (deg agg, adjacency agg, the two probe joins, final aggs) moves at
    // most O(edges) records — the old wedge shuffle moved n_wedges rows
    var maxRecords = 0L
    def walk(p: SparkPlan): Unit = {
      p match {
        case e: ShuffleExchangeExec =>
          e.metrics.foreach { case (k, m) =>
            if (k.toLowerCase.contains("records") && m.value > maxRecords)
              maxRecords = m.value
          }
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case _ => ()
      }
    }
    walk(plan)
    val edgeBound = 2 * nEdges + 1000 // deg agg unions both endpoints + agg partials
    assert(maxRecords <= edgeBound,
      s"an exchange moved $maxRecords records (> edge bound $edgeBound, " +
        s"n_edges=$nEdges, n_wedges=$nWedges):\n$plan")
    if (nWedges > edgeBound)
      assert(maxRecords < nWedges,
        s"an exchange carried wedge-expanded cardinality ($maxRecords >= $nWedges)")
  }

  test("q144 peel loop: the persisted edge list is never re-exchanged when consumed") {
    // each peel round repartitions its survivor list by u ONCE and
    // persist()s it; every consumer (degree aggregate, u-side join, edge
    // count) must then read the cache with its pinned HashPartitioning —
    // an exchange sitting directly on a cache scan (through projections/
    // filters only) would mean the edge side pays a second shuffle per peel
    val df = SparkEntry.queries("q144_kcore")(spark, sf)
    val plan = executedPlan(df)
    def narrowChainToCacheScan(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => true
      case pr: org.apache.spark.sql.execution.ProjectExec => narrowChainToCacheScan(pr.child)
      case f: org.apache.spark.sql.execution.FilterExec => narrowChainToCacheScan(f.child)
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => narrowChainToCacheScan(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => narrowChainToCacheScan(i.child)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => narrowChainToCacheScan(q.plan)
      case a: AdaptiveSparkPlanExec => narrowChainToCacheScan(a.executedPlan)
      case _ => false
    }
    assert(countIn(plan) {
      case e: ShuffleExchangeExec if narrowChainToCacheScan(e.child) => e
    } == 0, s"an exchange re-shuffles the persisted edge list:\n$plan")
  }

  test("q120 loop invariant: a src-repartitioned persisted edge list is NOT reshuffled by the per-round rank join") {
    // q120's iterations are hidden behind checkpoint boundaries, so the
    // invariant is asserted on the exact mechanism the loop relies on: the
    // persisted, src-partitioned edge list must satisfy the join's
    // distribution requirement as-is — one exchange for the rank vector, one
    // for the dst aggregate, ZERO for the O(|edges|) side. persist (not
    // localCheckpoint) is load-bearing: under AQE a checkpoint's LogicalRDD
    // reports UnknownPartitioning, while the cache layer pins the cached
    // plan's HashPartitioning (canChangeCachedPlanOutputPartitioning=false).
    // Auto-broadcast is disabled so the shuffle-join (100 TB) shape plans.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 2000L)
        .map(i => (i % 97, i % 41, 1L + i % 7)).toDF("src", "dst", "deg")
        .repartition(spark.sessionState.conf.numShufflePartitions, col("src"))
        .persist()
      val rank = (0L until 97L).map(i => (i, i * 10)).toDF("node", "r")
      val round = edges.join(rank, col("src") === col("node")).drop("node")
        .groupBy(col("dst")).agg(sum(col("r")).as("r"))
      val plan = executedPlan(round)
      val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
      assert(shuffles <= 2,
        s"expected rank-side + dst-agg exchanges only (edge list reuses its " +
          s"checkpoint partitioning); got $shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("q161 loop invariant: per-round exchanges are frontier-sized; the persisted edge list never reshuffles") {
    // q161's rounds are hidden behind localCheckpoint boundaries, so the
    // invariant is asserted on the round's exact mechanism (q120's test
    // discipline): join the persisted src-partitioned bidirectional edge
    // list to a frontier, distinct the discoveries, anti-join visited.
    // Every exchange must carry frontier/discovery-sized data — the
    // O(|edges|) side satisfies the join's distribution as-is. The
    // per-round DRIVER action is one `frontier.isEmpty` (a bounded
    // existence probe inherent to BFS termination) — nothing else leaves
    // the cluster.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 2000L).map(i => (i % 97, 1000L + i % 41))
        .toDF("src", "dst")
        .repartition(spark.sessionState.conf.numShufflePartitions, col("src"))
        .persist()
      val frontier = (0L until 5L).toDF("node")
      val visited = (0L until 5L).map(i => (i, 0L)).toDF("node", "dist")
      val next = edges.join(frontier, edges("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
      val plan = executedPlan(next)
      val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
      // frontier side of the hop join, the discovery distinct (partial+
      // final plans as one exchange), and the two anti-join sides — all
      // frontier/discovery-sized; the edge list contributes NONE
      assert(shuffles <= 4,
        s"expected only frontier-sized exchanges (edge list reuses its " +
          s"persisted partitioning); got $shuffles:\n$plan")
      edges.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("q152 IVF-PQ re-rank is candidate-bounded: TakeOrdered chain, no global sort, no all-pairs") {
    // the candidate stage (cell assign + probe equi-join + broadcast
    // registers) reuses the q49/q115/q119 constructions asserted above;
    // here the visible post-checkpoint plan must show the search itself:
    // shortlist(RerankR) -> exact re-rank(10) and brute(10) all as
    // TakeOrderedAndProject — the re-rank never sorts or scans beyond its
    // candidate list, and the 1-row query frame joins via broadcast
    val plan = executedPlan(SparkEntry.queries("q152_ivfpq")(spark, sf))
    // 4: shortlist(RerankR) twice — the n_short count branch and the
    // re-rank branch each top-k the cached candidate frame — plus the
    // re-rank(10) and brute(10)
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    } == 4, s"expected shortlist x2 + re-rank + brute as TakeOrdered:\n$plan")
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.SortExec => t
    } == 0, s"top-k must not plan a global sort:\n$plan")
    assert(countIn(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    } == 0, s"1-row frames must broadcast, never cartesian:\n$plan")
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } >= 1, s"expected the 1-row query-vector broadcast:\n$plan")
  }

  test("q153 multi-AOI zonal stats: AOI side broadcasts, ONE aggregate exchange total") {
    val plan = executedPlan(SparkEntry.queries("q153_zonal_stats")(spark, sf))
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } >= 1, s"expected the AOI table broadcast (bbox-overlap join):\n$plan")
    // scan -> broadcast join -> fold projection -> partial agg -> ONE
    // exchange on (aoi_id, acq_date) -> final agg; the tile side never
    // shuffles for the join
    assert(countIn(plan) { case e: ShuffleExchangeExec => e } == 1,
      s"expected exactly one (aoi_id, date) aggregate exchange:\n$plan")
  }

  test("q130 BM25 broadcasts the query-term table — the corpus never shuffles for it") {
    val plan = executedPlan(SparkEntry.queries("q130_bm25")(spark, sf))
    assert(countIn(plan) { case b: BroadcastHashJoinExec => b } >= 1,
      s"expected the Bm25QueryTerms-row term table broadcast:\n$plan")
    // two TakeOrdereds: the limit-8 query-term pick and the final top-20;
    // neither may plan as a global sort
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    } == 2, s"expected TakeOrderedAndProject term pick + top-20:\n$plan")
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.SortExec => t
    } == 0, s"top-k must not plan a global sort:\n$plan")
  }

  test("q167 composite aggregates BEFORE any explode: no generator feeds an exchange") {
    val plan = executedPlan(SparkEntry.queries("q167_max_composite")(spark, sf))
    // exactly one exchange — the (cell) aggregate; the posexplode to long
    // format must sit ABOVE it (post-aggregation), never below
    assert(countIn(plan) { case e: ShuffleExchangeExec => e } == 1,
      s"expected one cell-aggregate exchange:\n$plan")
    def generatorBelowExchange(p: org.apache.spark.sql.execution.SparkPlan,
                               belowExchange: Boolean): Boolean = {
      val here = p match {
        case _: org.apache.spark.sql.execution.GenerateExec => belowExchange
        case _ => false
      }
      val nowBelow = belowExchange || p.isInstanceOf[ShuffleExchangeExec]
      here || p.children.exists(generatorBelowExchange(_, nowBelow)) ||
        (p match {
          case a: AdaptiveSparkPlanExec => generatorBelowExchange(a.executedPlan, belowExchange)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            generatorBelowExchange(s.plan, nowBelow)
          case _ => false
        })
    }
    assert(!generatorBelowExchange(plan, belowExchange = false),
      s"pixel explode must happen on composite-sized data, after the aggregate:\n$plan")
  }

  test("q164 retention: one user_id exchange of event-scale data, no join at all") {
    val plan = executedPlan(SparkEntry.queries("q164_retention_cohorts")(spark, sf))
    // exchanges: user_id aggregate (the only event-scale one), the
    // (cohort, offset) aggregate, and the cohort window over the
    // days×14-bounded matrix; cohort size derives from the offset-0 row
    // so no join exists anywhere
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 3, s"expected ≤3 exchanges, got $shuffles:\n$plan")
    assert(countIn(plan) {
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    } == 0, s"cohort size must come from the matrix itself, not a join:\n$plan")
  }

  test("q183 hard negatives: query panel broadcasts, top-3 runs as WindowGroupLimit") {
    val plan = executedPlan(SparkEntry.queries("q183_hard_negatives")(spark, sf))
    // the corpus side must never shuffle FOR THE JOIN: the bounded query
    // panel arrives by broadcast (nested-loop — the condition is a label
    // inequality, no equi-key exists)
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: BroadcastHashJoinExec => b
    } >= 1, s"expected the query panel broadcast:\n$plan")
    // rank<=3 must execute as the group-limit operator (per-partition
    // top-k heaps), not a full per-query sort feeding a filter
    assert(countIn(plan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    } >= 1, s"expected WindowGroupLimit for the per-query top-3:\n$plan")
  }

  test("q182 span-dedup apply: everything but the shingle-frequency pass stays doc_id-partitioned") {
    val plan = executedPlan(SparkEntry.queries("q182_span_dedup_apply")(spark, sf))
    // exchanges: the explicit doc_id repartition, the shingle-frequency
    // aggregate (ph) + its join-back, and nothing else — the anti-joins
    // and the rebuild aggregate all reuse doc_id partitioning
    val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles <= 4, s"expected ≤4 exchanges, got $shuffles:\n$plan")
  }

  test("q246 CCNet terciles: cutoffs come from ONE percentile aggregate — no window, no global sort") {
    // the 100 TB posture the round-16 verdict asked for: the tercile split
    // must never plan the unpartitioned ntile window (one task holding the
    // whole corpus sort); instead the two cutoffs arrive as a broadcast
    // 1-row frame and bucketing is a per-row comparison
    val plan = executedPlan(SparkEntry.queries("q246_ccnet_buckets")(spark, sf))
    assert(countIn(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    } == 0, s"tercile bucketing must not plan a window:\n$plan")
    assert(countIn(plan) {
      case t: org.apache.spark.sql.execution.SortExec => t
    } == 0, s"tercile bucketing must not plan a sort:\n$plan")
    assert(countIn(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } >= 1, s"expected the 1-row percentile-cutoff broadcast:\n$plan")
  }

  test("q248/q249 register sketches: tree-reduce aggregates, register-sized windows, no all-pairs") {
    // the registers are built by ONE partial+final aggregate pair over
    // the scan; every window/sort downstream runs on register-sized,
    // group-partitioned frames. Pins: no cartesian anywhere, and the
    // exchange count stays at the aggregate/window/readout handful — a
    // data-sized extra shuffle (the thing the register design removes)
    // would show up as exchange growth
    // q251 reads two PERSISTED registers (its lineitem scan happened in
    // the ingest commits, before the plan under test); q253's weighted
    // register is one data-sized aggregate like q248's. Same pins.
    Seq(("q248_quantile_sketch", 4), ("q249_drift_sketch", 8),
        ("q251_sketch_register_merge", 6),
        ("q253_weighted_quantile_sketch", 6)).foreach {
      case (q, maxShuffles) =>
        val plan = executedPlan(SparkEntry.queries(q)(spark, sf))
        assert(countIn(plan) {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        } == 0, s"$q: register joins must never plan all-pairs:\n$plan")
        val shuffles = countIn(plan) { case e: ShuffleExchangeExec => e }
        assert(shuffles <= maxShuffles,
          s"$q: expected <= $maxShuffles register-path exchanges, got $shuffles:\n$plan")
    }
  }

  test("q163 embed-cov: the moment aggregate sees raw rows — no generator below any exchange, one agg exchange") {
    // q163's Gram matrix is ONE typed aggregate over the scan: nothing
    // explodes before aggregation (the dim² posexplode this replaced
    // generated 4096 rows per input row), and the only exchange is the
    // global aggregate's single-partition gather of fixed-width
    // buffers. The (i, j) explode runs ABOVE it, on the one-row result.
    val plan = executedPlan(SparkEntry.queries("q163_embed_cov")(spark, sf))
    assert(countIn(plan) { case e: ShuffleExchangeExec => e } <= 1,
      s"expected only the global-aggregate exchange:\n$plan")
    def generatorBelowExchange(p: org.apache.spark.sql.execution.SparkPlan,
                               belowExchange: Boolean): Boolean = {
      val here = p match {
        case _: org.apache.spark.sql.execution.GenerateExec => belowExchange
        case _ => false
      }
      val nowBelow = belowExchange || p.isInstanceOf[ShuffleExchangeExec]
      here || p.children.exists(generatorBelowExchange(_, nowBelow)) ||
        (p match {
          case a: AdaptiveSparkPlanExec => generatorBelowExchange(a.executedPlan, belowExchange)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            generatorBelowExchange(s.plan, nowBelow)
          case _ => false
        })
    }
    assert(!generatorBelowExchange(plan, belowExchange = false),
      s"the pair explode must run on the aggregated row, never per input row:\n$plan")
  }
}
