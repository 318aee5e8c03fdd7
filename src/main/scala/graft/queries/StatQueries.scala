package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Portable._
import graft.ext.{Dedup, TextAnalysis}

/** Round-6 fourth batch — statistical analytics: closed-form OLS
  * regression per group (the trend line a reporting layer fits without
  * ML machinery), a Zipf-law fit over the token frequency spectrum (the
  * corpus-health diagnostic), and a train/val/test split-leakage audit
  * (near-dup pairs crossing split boundaries — the contamination a
  * random split silently ships).
  *
  * Determinism: regressions run on EXACT integer/decimal sums (money as
  * cents, libm lns rounded to 9 dp then DECIMAL-summed); the final
  * slope/intercept divisions are single IEEE ops on exactly-convertible
  * operands.
  */
object StatQueries {

  /** Zipf fit depth: the top-N tokens by frequency. */
  val ZipfTop = 1000

  /** Split-assignment buckets (content-hash mod SplitMod): < SplitTrain →
    * train, == SplitTrain → val, > SplitTrain → test (8/1/1). */
  val SplitMod = 10L
  val SplitTrain = 8L

  /** ln rounded to 9 dp — the libm-determinism rule. */
  private def ln9(x: org.apache.spark.sql.Column) = round(log(x), 9)

  /** Quantile grid for the drift table (q136). */
  val DriftGrid = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** Quantile grid for the mergeable fixed-point sketch (q248). */
  val SketchGrid = Seq(0.25, 0.5, 0.75, 0.95)
  /** q248/q249 sketch resolution: values bucket to this many leading
    * decimal digits (3 ⇒ cell width ≤ 1% of the value ⇒ midpoint
    * estimates are within ±0.5% relative error — the DDSketch guarantee
    * shape, but on a pure-decimal grid). */
  val SketchSigDigits = 3

  /** The sketch's cell width for a scaled-integer value: 10^(decimal
    * digits of |x| − SketchSigDigits), computed via string length so
    * both engines agree with zero libm. abs-based so a '-' sign never
    * counts as a digit — a negative value's cell is exactly as fine as
    * its positive twin's (r17 ADVICE; matches the CALL proc's wOf). */
  private[graft] def sketchW(x: org.apache.spark.sql.Column) =
    pow(lit(10.0), greatest(length(abs(x).cast("string")) - SketchSigDigits,
      lit(0)).cast("double")).cast("long")
  private[graft] def sketchWSql(x: String): String =
    s"CAST(power(10, greatest(length(CAST(abs($x) AS VARCHAR)) - " +
      s"$SketchSigDigits, 0)) AS BIGINT)"

  /** Cell assignment on the SIGNED grid: trunc-toward-zero division so
    * cells stay value-ordered for negatives. Spark's `DIV` already
    * truncates toward zero; DuckDB's `//` FLOORS, so the oracle spells
    * trunc explicitly — without this the two engines put x = −155,
    * w = 10 in different cells (−150 vs −160). */
  private[graft] def sketchCell(x: org.apache.spark.sql.Column,
                                w: org.apache.spark.sql.Column) =
    expr("x DIV w") * w
  private[graft] def sketchCellSql(x: String, w: String): String =
    s"(CASE WHEN $x >= 0 THEN ($x // $w) ELSE -((-($x)) // $w) END) * $w"

  /** Cell-midpoint read-out, signed: +half-width above a positive cell,
    * −half-width below a negative one (the estimate must land INSIDE
    * the cell — always adding +w put negative estimates a full cell
    * off, r17 ADVICE); cell 0 holds exactly the value 0 (any |x| ≥ 1
    * is its own cell at w = 1), so its estimate is exact. `scale` is
    * 2 × the fixed-point scale (the ×2 of the midpoint fold). */
  private[graft] def sketchMid(cell: org.apache.spark.sql.Column,
                               scale: Double): org.apache.spark.sql.Column =
    when(cell === 0, lit(0.0)).otherwise(
      (cell * 2 + when(cell > 0, sketchW(cell)).otherwise(-sketchW(cell)))
        .cast("double") / lit(scale))
  private[graft] def sketchMidSql(cell: String, scale: String): String =
    s"(CASE WHEN $cell = 0 THEN 0.0 ELSE ($cell * 2 + (CASE WHEN $cell > 0 " +
      s"THEN ${sketchWSql(cell)} ELSE -${sketchWSql(cell)} END))::DOUBLE " +
      s"/ $scale END)"

  /** Jaccard threshold sweep for the dedup calibration curve (q137). */
  val DedupThresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-segment OLS trend of order value over time:
    // slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) with x = days since
    // 1992-01-01 and y = order value in CENTS (exact via DECIMAL(18,2)).
    // Every sum is exact integer arithmetic; the cross products route
    // through DECIMAL(38,0) (n·Σxy ≈ 3e21 at sf0.1 — past BIGINT); the
    // two closing divisions are single IEEE ops. One join + one 5-group
    // aggregate — closed-form regression needs no iteration at any scale.
    "q132_group_regression" -> ((s, d) => {
      val base = orders(s, d)
        .join(customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long").as("x"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("y"))
      // per-row products fit BIGINT easily (x·y ≲ 8e11); the SUMS are what
      // overflow at row counts past ~1e7 (ANSI ARITHMETIC_OVERFLOW), so
      // each product routes through DECIMAL(38,0) BEFORE aggregation —
      // exact at any scale factor, map-side partial aggregation unchanged
      val sums = base.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val num = d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy"))
      val den = d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx"))
      sums
        .withColumn("slope_milli",
          round(num.cast("double") / den.cast("double") * 1000.0, 6))
        .select(col("segment"), col("n"), col("slope_milli"),
          round((col("sy").cast("double") -
            col("slope_milli") / 1000.0 * col("sx").cast("double")) /
            col("n").cast("double") / 100.0, 6).as("intercept"))
    }),

    // Zipf-law fit: OLS of ln(freq) on ln(rank) over the ZipfTop most
    // frequent tokens — the slope is the Zipf exponent (healthy natural
    // text sits near −1; templated/duplicated corpora flatten it). lns
    // are 9-dp-rounded then carried as 1e-9 FIXED-POINT BIGINTs (q120's
    // discipline): every sum and cross product routes through
    // DECIMAL(38,0) — bit-identical integer arithmetic on both engines
    // (no BIGINT×DECIMAL precision-loss multiply — r06 ADVICE), IEEE ops
    // confined to the closing divisions on exactly-convertible operands.
    // The spectrum is ZipfTop rows, so the rank window is fenced small.
    "q133_zipf_fit" -> ((s, d) => {
      val freq = documents(s, d)
        .select(explode(tokens(col("text"))).as("t"))
        .select(charFold(col("t")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("h")).limit(ZipfTop)
      // ln9 value is exact in DECIMAL(18,9); ×1e9 is integral, so the
      // decimal product's scale adjustment cannot lose digits
      def fx9(c: org.apache.spark.sql.Column) =
        (ln9(c).cast("decimal(18,9)") * lit(1000000000L)).cast("long")
      val pts = freq
        // fenced: ≤ZipfTop rows (post-limit spectrum)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("h"))).cast("long"))
        .select(fx9(col("rank").cast("double")).as("x"),
          fx9(col("cnt").cast("double")).as("y"))
      // x·x ≈ 4.8e19 overflows BIGINT per-row, so cast BEFORE the multiply
      def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      val sums = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(d19(col("x")) * d19(col("x"))).as("sxx"), sum(col("y")).as("sy"),
        sum(d19(col("x")) * d19(col("y"))).as("sxy"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val num = d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy"))
      val den = d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx"))
      sums.select(col("n"),
        round(num.cast("double") / den.cast("double"), 6).as("zipf_slope"),
        round((col("sy").cast("double") / lit(1.0e9) -
          num.cast("double") / den.cast("double") *
            (col("sx").cast("double") / lit(1.0e9))) /
          col("n").cast("double"), 6).as("ln_intercept"))
    }),

    // Train/val/test split-leakage audit: assign every document to a
    // split by content hash (8/1/1), then count the exact-verified
    // near-dup pairs (the q52 relation — shared definition) inside and
    // ACROSS splits. Cross-split rows are the contamination a random
    // split ships: the val/test signal those documents carry is already
    // in train. Pair edges come from the session-cached shingle base;
    // the split table joins in twice by doc id.
    "q134_split_leakage" -> ((s, d) => {
      val splitOf = (b: org.apache.spark.sql.Column) =>
        when(b < SplitTrain, "train").when(b === SplitTrain, "val")
          .otherwise("test")
      val splits = documents(s, d)
        .select(col("doc_id"), splitOf(charFold(col("text")) % SplitMod).as("split"))
      val pairs = Dedup.verifiedPairs(s, d)
        .join(splits.select(col("doc_id").as("da"), col("split").as("sa")), "da")
        .join(splits.select(col("doc_id").as("db"), col("split").as("sb")), "db")
        .select(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
      pairs.groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leak", col("split_a") =!= col("split_b"))
    }),

    // Per-source quantile-drift table: the quality-score quantile grid per
    // source vs the corpus-wide grid, plus the max absolute gap (a
    // KS-statistic at fixed probes) — the quantile-space complement of
    // q113's KL view of corpus drift. Exact interpolated percentiles
    // (9-dp-rounded); the corpus row broadcasts back. At 100 TB the swap
    // is approx_percentile (t-digest) — same plan shape, bounded state.
    "q136_quantile_drift" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val scored = documents(s, d).select(col("source"),
          TextAnalysis.qualityScore(nTok, stopN, length(col("text"))).as("q"))
        .localCheckpoint() // one scoring pass feeds both percentile passes
      val gridSql = DriftGrid.map(p => s"${p}D").mkString("array(", ", ", ")")
      val qexpr = s"transform(percentile(q, $gridSql), x -> round(x, 9))"
      val bySrc = scored.groupBy(col("source")).agg(expr(qexpr).as("qs"))
      val corpus = scored.agg(expr(qexpr).as("qc"))
      val gaps = DriftGrid.indices.map(i =>
        abs(element_at(col("qs"), i + 1) - element_at(col("qc"), i + 1)))
      bySrc.crossJoin(broadcast(corpus))
        .select(col("source") +:
          DriftGrid.zipWithIndex.map { case (p, i) =>
            element_at(col("qs"), i + 1).as(s"p${(p * 100).toInt}")
          } :+
          round(greatest(gaps: _*), 9).as("max_gap"): _*)
    }),

    // Mergeable FIXED-POINT quantile sketch (the register-style answer
    // to q95/q136's histogram quantiles, and what retires global sorts
    // for quantiles at 100 TB for real): every price buckets to its
    // leading-3-significant-decimal-digits cell — a RELATIVE-ERROR grid
    // like DDSketch's log buckets (Masson et al., VLDB '19) but computed
    // with pure integer arithmetic (string length = decimal exponent),
    // so both engines agree bit-for-bit with zero libm. The register is
    // (group, cell) counts — bounded at ≤ 900 cells per decade, counts
    // ADD under merge, so it tree-reduces exactly like the HLL/CMS
    // registers (one partial-agg shuffle of register-sized state).
    // Quantile read-out: rank r = ceil(p·N) into the per-group running
    // count over the register (a window over ≤ thousands of rows per
    // group — register-sized, never data-sized), estimate = cell
    // midpoint ⇒ within ±0.5% relative error of the true quantile
    // (StatSpec pins the bound against exact percentiles).
    "q248_quantile_sketch" -> ((s, d) => {
      val xi = lineitem(s, d).select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("x"))
      val cells = xi
        .withColumn("w", sketchW(col("x")))
        .select(col("flag"), sketchCell(col("x"), col("w")).as("cell"))
        .groupBy(col("flag"), col("cell")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // the register: built once, read 3× below
      val cum = cells.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("flag"))
          .orderBy(col("cell"))))
      val tot = cells.groupBy(col("flag"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_cells"))
      val grid = tot.select(col("flag"), col("n"), col("n_cells"),
          explode(array(SketchGrid.map(lit): _*)).as("p"))
        .withColumn("rank_r",
          ceil(col("p") * col("n").cast("double")).cast("long"))
      grid.join(cum, Seq("flag"))
        .filter(col("cum") >= col("rank_r") &&
          col("cum") - col("cnt") < col("rank_r"))
        .select(col("flag").as("l_returnflag"), col("p"), col("rank_r"),
          sketchMid(col("cell"), 200.0).as("est_price"),
          col("n_cells"))
    }),

    // q136's drift table rebuilt ENTIRELY from q248-style registers —
    // the 100 TB path q136's scaladoc promised ("at scale the swap is a
    // sketch"), now real and oracle-gated: per-source AND corpus-wide
    // quality-score quantiles read out of mergeable fixed-point
    // registers (score at 6 dp fixed point, 3-significant-digit cells),
    // per-probe |source − corpus| gaps and the per-source max gap (the
    // KS statistic at fixed probes). ONE data-sized aggregate builds the
    // per-source registers; the corpus register is the per-source one
    // RE-AGGREGATED (register-sized input — the mergeability in action);
    // everything downstream (rank walks, gap joins) runs on register-
    // sized frames. No percentile over raw data anywhere.
    "q249_drift_sketch" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val si = floor(TextAnalysis.qualityScore(nTok, stopN,
        length(col("text"))) * 1000000.0 + 0.5).cast("long")
      val reg = documents(s, d).select(col("source"), si.as("x"))
        .withColumn("w", sketchW(col("x")))
        .select(col("source"), sketchCell(col("x"), col("w")).as("cell"))
        .groupBy(col("source"), col("cell")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // the registers: one corpus pass, reused 3x
      val corp = reg.groupBy(col("cell")).agg(sum(col("cnt")).as("cnt"))
        .select(lit("__corpus__").as("source"), col("cell"), col("cnt"))
      val all = reg.unionByName(corp)
      val cum = all.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("source"))
          .orderBy(col("cell"))))
      val grid = all.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
        .select(col("source"), col("n"),
          explode(array(DriftGrid.map(lit): _*)).as("p"))
        .withColumn("rank_r",
          ceil(col("p") * col("n").cast("double")).cast("long"))
      val ests = grid.join(cum, Seq("source"))
        .filter(col("cum") >= col("rank_r") &&
          col("cum") - col("cnt") < col("rank_r"))
        .select(col("source"), col("p"),
          sketchMid(col("cell"), 2000000.0).as("est"))
      val gaps = ests.filter(col("source") =!= "__corpus__")
        .join(broadcast(ests.filter(col("source") === "__corpus__")
          .select(col("p"), col("est").as("est_corpus"))), Seq("p"))
        .withColumn("gap", abs(col("est") - col("est_corpus")))
      gaps.join(gaps.groupBy(col("source")).agg(max(col("gap")).as("max_gap")),
          Seq("source"))
        .select(col("source"), col("p"), col("est").as("est_src"),
          col("est_corpus"), col("gap"), col("max_gap"))
    }),

    // The q248 register as a STORABLE, MERGEABLE table artifact — the
    // user-visible face of the mergeability q248's spec proves (the way
    // q86 does it for the HLL registers): the corpus arrives as two
    // independent ingests, each ingest commits its own register as a
    // versioned lakehouse table, and the corpus-wide quantile read-out
    // runs over the UNION of the two PERSISTED registers — cell-wise
    // count addition plus a register-sized rank walk — WITHOUT
    // rescanning either ingest's raw rows. Counts add exactly, so the
    // answer is bit-identical to the single-pass q248 register over the
    // whole table; the oracle computes exactly that single-pass answer,
    // which makes the driver's hash equality the merge-equals-one-pass
    // proof, adversarially replayed by a second engine. At 100 TB:
    // per-ingest work is one register aggregate over the NEW partition
    // only; corpus quantiles then cost a union of register-sized tables
    // — the same incremental pattern as q135's persisted dedup index.
    // `CALL graft.quantile_sketch_save/_merge` expose the same artifact
    // over any lakehouse table (GraftCatalogSpec pins those).
    "q251_sketch_register_merge" -> ((s, d) => {
      import graft.sink.VersionedTable
      val work = graft.streaming.EventsStream.scratchDir("graft_sketchreg")
      val xi = lineitem(s, d).select(col("l_returnflag").as("flag"),
        col("l_orderkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("x"))
      def registerOf(df: DataFrame): DataFrame = df
        .withColumn("w", sketchW(col("x")))
        .select(col("flag"), sketchCell(col("x"), col("w")).as("cell"))
        .groupBy(col("flag"), col("cell")).agg(count(lit(1)).as("cnt"))
      // two independent ingests, each committing its own register table
      val roots = Seq(0, 1).map { h =>
        val root = work.resolve(s"reg$h").toString
        VersionedTable.create(s, root,
          registerOf(xi.filter(col("l_orderkey") % 2 === h)).coalesce(1))
        root
      }
      // merge = cell-wise count addition over the two PERSISTED registers
      val merged = roots.map(VersionedTable.read(s, _))
        .reduce(_ unionByName _)
        .groupBy(col("flag"), col("cell")).agg(sum(col("cnt")).as("cnt"))
        .localCheckpoint() // register-sized; read twice below
      val cum = merged.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("flag"))
          .orderBy(col("cell"))))
      val grid = merged.groupBy(col("flag"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_cells"))
        .select(col("flag"), col("n"), col("n_cells"),
          explode(array(SketchGrid.map(lit): _*)).as("p"))
        .withColumn("rank_r",
          ceil(col("p") * col("n").cast("double")).cast("long"))
      grid.join(cum, Seq("flag"))
        .filter(col("cum") >= col("rank_r") &&
          col("cum") - col("cnt") < col("rank_r"))
        .select(col("flag").as("l_returnflag"), col("p"), col("rank_r"),
          sketchMid(col("cell"), 200.0).as("est_price"),
          col("n_cells"))
    }),

    // WEIGHTED quantiles on the same register grid — cells carry summed
    // WEIGHTS (token counts) instead of row counts, so the read-out
    // answers "the quality score below which p of the corpus's TOKENS
    // sit": the quantity LLM-data curation actually thresholds on (a
    // 10k-token document moves the cutoff 100× more than a 100-token
    // one — a row-count quantile treats them alike). Everything else is
    // unchanged: integer cells, ONE data-sized aggregate, weights still
    // ADD under merge (the register stays mergeable/tree-reducible, a
    // free generalization — counts were never load-bearing, only
    // additivity), and the rank walk runs on cumulative WEIGHT at
    // r = ceil(p·W). Oracle replays the identical integer arithmetic.
    "q253_weighted_quantile_sketch" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stopN = TextAnalysis.countIn(toks, TextAnalysis.LangProfiles.head._2)
      val si = floor(TextAnalysis.qualityScore(nTok, stopN,
        length(col("text"))) * 1000000.0 + 0.5).cast("long")
      val reg = documents(s, d).select(si.as("x"), nTok.as("wt"))
        .withColumn("w", sketchW(col("x")))
        .select(sketchCell(col("x"), col("w")).as("cell"), col("wt"))
        .groupBy(col("cell")).agg(sum(col("wt")).as("cnt"))
        .localCheckpoint() // the register: built once, read 3× below
      val cum = reg.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("cell")))) // register-sized
      val grid = reg.agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_cells"))
        .select(col("n_tokens"), col("n_cells"),
          explode(array(DriftGrid.map(lit): _*)).as("p"))
        .withColumn("rank_w",
          ceil(col("p") * col("n_tokens").cast("double")).cast("long"))
      grid.crossJoin(broadcast(cum))
        .filter(col("cum") >= col("rank_w") &&
          col("cum") - col("cnt") < col("rank_w"))
        .select(col("p"), col("rank_w"),
          sketchMid(col("cell"), 2000000.0).as("est_score"),
          col("n_tokens"), col("n_cells"))
    }),

    // Dedup-threshold calibration curve: for each Jaccard cutoff, the
    // verified near-dup pairs and the documents they touch — the table
    // that decides how aggressive a dedup pass should be BEFORE burning a
    // 100 TB sweep. One threshold fan-out (5 literals) over the shared
    // verified edge relation; thresholds with zero surviving pairs drop
    // out identically on both engines.
    "q137_dedup_rate_curve" -> ((s, d) => {
      val pt = Dedup.verifiedPairs(s, d)
        .select(col("da"), col("db"), col("jaccard"),
          explode(array(DedupThresholds.map(lit): _*)).as("threshold"))
        .filter(col("jaccard") >= col("threshold"))
      val np = pt.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
      val nd = pt.select(col("threshold"),
          explode(array(col("da"), col("db"))).as("doc"))
        .groupBy(col("threshold")).agg(countDistinct(col("doc")).as("n_docs"))
      np.join(nd, "threshold")
    }),

    // Seasonal-baseline anomaly detection: each (event_type, hour-of-day)
    // slot's expected hourly event count is its mean over the observed
    // days; hourly buckets whose count sits > 2σ from their slot's
    // baseline are anomalies. The monitoring query behind every "traffic
    // looks weird" alert — seasonality REMOVED before thresholding, so a
    // nightly lull is not an anomaly and a 3 am spike is. Two exact
    // integer aggregates (hourly counts; per-slot Σ and Σ²), then scalar
    // z-scores: means/variances derive from BIGINT sums in a fixed
    // operation order, sqrt rounded 9 dp (libm rule), z rounded 6 — both
    // engines compute bit-identical doubles. At 100 TB: the hourly
    // rollup is the only data-sized aggregate (keyed by type × hour, it
    // partitions evenly); the profile table is 24 × types rows and the
    // final join against it broadcasts [bounded: 24 × |event types|].
    "q162_seasonal_anomaly" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      val profile = hourly
        .groupBy(col("event_type"), hour(col("h")).as("hod"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sc"),
          sum(col("cnt") * col("cnt")).as("ssq"))
        .filter(col("n") >= 2)
        .withColumn("mean",
          round(col("sc").cast("double") / col("n").cast("double"), 9))
        .withColumn("sd", round(sqrt(greatest(
          round(col("ssq").cast("double") / col("n").cast("double"), 9) -
            col("mean") * col("mean"), lit(0.0))), 9))
        .select(col("event_type"), col("hod"), col("mean"), col("sd"))
      hourly.withColumn("hod", hour(col("h")))
        .join(broadcast(profile), Seq("event_type", "hod"))
        .filter(col("sd") > 0)
        .withColumn("z", round((col("cnt").cast("double") - col("mean")) / col("sd"), 6))
        .filter(abs(col("z")) > 2)
        .select(col("event_type"), col("h"), col("cnt"), col("mean"),
          col("sd"), col("z"))
    }),
  )

  /** The single-pass register replay over the whole lineitem table —
    * the oracle for BOTH q248 (which builds the register in one pass)
    * and q251 (which merges two persisted half-registers: counts add
    * exactly, so the merged answer must hash-match this). */
  private lazy val sketchSinglePassSql: String = {
    val pList = SketchGrid.map(p => s"$p::DOUBLE").mkString("[", ", ", "]")
    s"""WITH xi AS (
          SELECT l_returnflag AS flag,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS x
          FROM lineitem),
        cells AS (
          SELECT flag, ${sketchCellSql("x", "w")} AS cell,
                 count(*)::BIGINT AS cnt
          FROM (SELECT flag, x, ${sketchWSql("x")} AS w FROM xi)
          GROUP BY 1, 2),
        cum AS (
          SELECT flag, cell, cnt,
                 sum(cnt) OVER (PARTITION BY flag ORDER BY cell) AS cum
          FROM cells),
        tot AS (SELECT flag, sum(cnt)::BIGINT AS n,
                       count(*)::BIGINT AS n_cells
                FROM cells GROUP BY 1),
        grid AS (
          SELECT flag, n, n_cells, p,
                 CAST(ceil(p * n::DOUBLE) AS BIGINT) AS rank_r
          FROM tot, (SELECT unnest($pList) AS p))
        SELECT g.flag AS l_returnflag, g.p, g.rank_r,
               ${sketchMidSql("c.cell", "200.0")} AS est_price,
               g.n_cells
        FROM grid g JOIN cum c
          ON g.flag = c.flag AND c.cum >= g.rank_r
          AND c.cum - c.cnt < g.rank_r"""
  }

  val oracle: Map[String, String] = {
    val tokSql = tokensSql("text")
    Map(
      "q132_group_regression" ->
        s"""WITH base AS (
              SELECT c_mktsegment AS segment,
                     date_diff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE))::BIGINT AS x,
                     (o_totalprice::DECIMAL(18,2) * 100)::BIGINT AS y
              FROM orders JOIN customer ON o_custkey = c_custkey),
            sums AS (
              SELECT segment, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                     sum((x * x)::DECIMAL(38,0)) AS sxx,
                     sum(y::DECIMAL(38,0)) AS sy,
                     sum((x * y)::DECIMAL(38,0)) AS sxy
              FROM base GROUP BY 1),
            fit AS (
              SELECT segment, n, sx, sy,
                     round((n::HUGEINT * sxy::HUGEINT
                            - sx::HUGEINT * sy::HUGEINT)::DOUBLE /
                           (n::HUGEINT * sxx::HUGEINT
                            - sx::HUGEINT * sx::HUGEINT)::DOUBLE
                           * 1000.0, 6) AS slope_milli
              FROM sums)
            SELECT segment, n, slope_milli,
                   round((sy::DOUBLE - slope_milli / 1000.0 * sx::DOUBLE) /
                         n::DOUBLE / 100.0, 6) AS intercept
            FROM fit""",
      "q133_zipf_fit" ->
        s"""WITH freq AS (
              SELECT h, count(*)::BIGINT AS cnt FROM (
                SELECT ${charFoldSql("t")} AS h FROM (
                  SELECT unnest($tokSql) AS t FROM documents))
              GROUP BY 1 ORDER BY cnt DESC, h LIMIT $ZipfTop),
            pts AS (
              SELECT (round(ln((row_number() OVER (ORDER BY cnt DESC, h))::DOUBLE), 9)::DECIMAL(28,9)
                      * 1000000000)::BIGINT AS x,
                     (round(ln(cnt::DOUBLE), 9)::DECIMAL(28,9)
                      * 1000000000)::BIGINT AS y
              FROM freq),
            sums AS (
              SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                     sum(x::DECIMAL(19,0) * x::DECIMAL(19,0)) AS sxx,
                     sum(y)::BIGINT AS sy,
                     sum(x::DECIMAL(19,0) * y::DECIMAL(19,0)) AS sxy
              FROM pts)
            SELECT n,
                   round((n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT)::DOUBLE /
                         (n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT)::DOUBLE,
                         6) AS zipf_slope,
                   round((sy::DOUBLE / 1e9 -
                          (n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT)::DOUBLE /
                          (n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT)::DOUBLE *
                          (sx::DOUBLE / 1e9)) /
                         n::DOUBLE, 6) AS ln_intercept
            FROM sums""",
      "q136_quantile_drift" -> {
        val q = TextAnalysis.qualityScoreSql(
          "len(tk)::BIGINT",
          TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
          "length(text)")
        val gridSql = DriftGrid.mkString("[", ", ", "]")
        val pcols = DriftGrid.zipWithIndex.map { case (p, i) =>
          s"qs[${i + 1}] AS p${(p * 100).toInt}"
        }.mkString(", ")
        val gapTerms = DriftGrid.indices
          .map(i => s"abs(qs[${i + 1}] - qc[${i + 1}])").mkString(", ")
        s"""WITH scored AS (
              SELECT source, $q AS q
              FROM (SELECT source, text, $tokSql AS tk FROM documents)),
            bysrc AS (
              SELECT source,
                     list_transform(quantile_cont(q, $gridSql),
                       x -> round(x, 9)) AS qs
              FROM scored GROUP BY 1),
            corpus AS (
              SELECT list_transform(quantile_cont(q, $gridSql),
                       x -> round(x, 9)) AS qc
              FROM scored)
            SELECT source, $pcols,
                   round(greatest($gapTerms), 9) AS max_gap
            FROM bysrc, corpus"""
      },
      // q251's oracle is the SAME single-pass replay: the merged
      // persisted registers must be bit-identical to one pass over the
      // whole table — hash equality against this SQL is the proof
      "q251_sketch_register_merge" -> sketchSinglePassSql,
      "q248_quantile_sketch" -> sketchSinglePassSql,
      "q253_weighted_quantile_sketch" -> {
        val q = TextAnalysis.qualityScoreSql(
          "len(tk)::BIGINT",
          TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
          "length(text)")
        val pList = DriftGrid.map(p => s"$p::DOUBLE").mkString("[", ", ", "]")
        s"""WITH scored AS (
              SELECT CAST(floor(($q) * 1000000.0 + 0.5) AS BIGINT) AS x,
                     len(tk)::BIGINT AS wt
              FROM (SELECT text, $tokSql AS tk FROM documents)),
            reg AS (
              SELECT ${sketchCellSql("x", "w")} AS cell,
                     sum(wt)::BIGINT AS cnt
              FROM (SELECT x, wt, ${sketchWSql("x")} AS w FROM scored)
              GROUP BY 1),
            cum AS (
              SELECT cell, cnt, sum(cnt) OVER (ORDER BY cell) AS cum
              FROM reg),
            grid AS (
              SELECT n_tokens, n_cells, p,
                     CAST(ceil(p * n_tokens::DOUBLE) AS BIGINT) AS rank_w
              FROM (SELECT sum(cnt)::BIGINT AS n_tokens,
                           count(*)::BIGINT AS n_cells FROM reg),
                   (SELECT unnest($pList) AS p))
            SELECT g.p, g.rank_w,
                   ${sketchMidSql("c.cell", "2000000.0")} AS est_score,
                   g.n_tokens, g.n_cells
            FROM grid g JOIN cum c
              ON c.cum >= g.rank_w AND c.cum - c.cnt < g.rank_w"""
      },
      "q249_drift_sketch" -> {
        val q = TextAnalysis.qualityScoreSql(
          "len(tk)::BIGINT",
          TextAnalysis.countInSql("tk", TextAnalysis.LangProfiles.head._2),
          "length(text)")
        val pList = DriftGrid.map(p => s"$p::DOUBLE").mkString("[", ", ", "]")
        s"""WITH scored AS (
              SELECT source,
                     CAST(floor(($q) * 1000000.0 + 0.5) AS BIGINT) AS x
              FROM (SELECT source, text, $tokSql AS tk FROM documents)),
            reg AS (
              SELECT source, ${sketchCellSql("x", "w")} AS cell,
                     count(*)::BIGINT AS cnt
              FROM (SELECT source, x, ${sketchWSql("x")} AS w FROM scored)
              GROUP BY 1, 2),
            allr AS (
              SELECT source, cell, cnt FROM reg
              UNION ALL
              SELECT '__corpus__' AS source, cell, sum(cnt)::BIGINT AS cnt
              FROM reg GROUP BY 2),
            cum AS (
              SELECT source, cell, cnt,
                     sum(cnt) OVER (PARTITION BY source ORDER BY cell) AS cum
              FROM allr),
            grid AS (
              SELECT source, n, p, CAST(ceil(p * n::DOUBLE) AS BIGINT) AS r
              FROM (SELECT source, sum(cnt)::BIGINT AS n FROM allr GROUP BY 1),
                   (SELECT unnest($pList) AS p)),
            ests AS (
              SELECT g.source, g.p,
                     ${sketchMidSql("c.cell", "2000000.0")} AS est
              FROM grid g JOIN cum c
                ON g.source = c.source AND c.cum >= g.r
                AND c.cum - c.cnt < g.r),
            gaps AS (
              SELECT s.source, s.p, s.est AS est_src, c.est AS est_corpus,
                     abs(s.est - c.est) AS gap
              FROM ests s JOIN ests c ON c.source = '__corpus__' AND s.p = c.p
              WHERE s.source <> '__corpus__')
            SELECT source, p, est_src, est_corpus, gap,
                   max(gap) OVER (PARTITION BY source) AS max_gap
            FROM gaps"""
      },
      "q137_dedup_rate_curve" -> {
        val thrList = DedupThresholds.mkString("[", ", ", "]")
        s"""WITH ${Dedup.verifiedPairsSqlCtes},
            pt AS (
              SELECT da, db, jaccard, t.threshold
              FROM edges, (SELECT unnest($thrList) AS threshold) t
              WHERE jaccard >= threshold),
            np AS (SELECT threshold, count(*)::BIGINT AS n_pairs
                   FROM pt GROUP BY 1),
            nd AS (SELECT threshold, count(DISTINCT doc)::BIGINT AS n_docs
                   FROM (SELECT threshold, unnest([da, db]) AS doc FROM pt)
                   GROUP BY 1)
            SELECT threshold, n_pairs, n_docs
            FROM np JOIN nd USING (threshold)"""
      },
      "q134_split_leakage" ->
        s"""WITH ${Dedup.verifiedPairsSqlCtes},
            splits AS (
              SELECT doc_id,
                     CASE WHEN ${charFoldSql("text")} % $SplitMod < $SplitTrain
                          THEN 'train'
                          WHEN ${charFoldSql("text")} % $SplitMod = $SplitTrain
                          THEN 'val'
                          ELSE 'test' END AS split
              FROM documents)
            SELECT least(a.split, b.split) AS split_a,
                   greatest(a.split, b.split) AS split_b,
                   count(*)::BIGINT AS n_pairs,
                   (least(a.split, b.split) <> greatest(a.split, b.split)) AS leak
            FROM edges JOIN splits a ON edges.da = a.doc_id
                       JOIN splits b ON edges.db = b.doc_id
            GROUP BY 1, 2""",
      "q162_seasonal_anomaly" ->
        """WITH hourly AS (
             SELECT event_type, date_trunc('hour', ts) AS h,
                    count(*)::BIGINT AS cnt
             FROM events GROUP BY 1, 2),
           profile AS (
             SELECT event_type, extract(hour FROM h) AS hod,
                    count(*)::BIGINT AS n, sum(cnt)::BIGINT AS sc,
                    sum(cnt * cnt)::BIGINT AS ssq
             FROM hourly GROUP BY 1, 2 HAVING count(*) >= 2),
           prof2 AS (
             SELECT event_type, hod,
                    round(sc::DOUBLE / n::DOUBLE, 9) AS mean,
                    round(sqrt(greatest(
                      round(ssq::DOUBLE / n::DOUBLE, 9) -
                        round(sc::DOUBLE / n::DOUBLE, 9) *
                        round(sc::DOUBLE / n::DOUBLE, 9), 0.0)), 9) AS sd
             FROM profile)
           SELECT hourly.event_type, h, cnt, mean, sd,
                  round((cnt::DOUBLE - mean) / sd, 6) AS z
           FROM hourly JOIN prof2
             ON hourly.event_type = prof2.event_type
            AND extract(hour FROM h) = prof2.hod
           WHERE sd > 0 AND abs(round((cnt::DOUBLE - mean) / sd, 6)) > 2""",
    )
  }
}
