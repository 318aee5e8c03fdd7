package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** The per-query regression verdict: `v` (this round's adjudicated
    * min) against the committed stable baseline `b`. Heavy queries
    * (baseline ≥ 2 s) trip at 1.3×, the rest at 1.5× — the expensive
    * tail is where sub-1.5× creep is real wall-clock (a 1.4× slide on a
    * 5 s query costs more than a 3× slide on a 0.2 s one), and every
    * heavy query now has a stable re-run behind its number, so the
    * tighter trigger adjudicates isolation time, not contention. The
    * 0.3 s absolute floor keeps scheduling jitter on fast queries out.
    * BenchGateSpec pins the matrix (including the planted-1.4×-on-heavy
    * case the looser gate missed). */
  private[graft] def isRegression(v: Double, b: Double): Boolean = {
    val factor = if (b >= 2.0) 1.3 else 1.5
    v > factor * b && v - b > 0.3
  }

  /** A probe run this much over its committed time means the machine was
    * NOT idle around the stable pass — its numbers adjudicate nothing. */
  private[graft] val ProbeContendedFactor = 1.3

  /** Baseline refresh demands a NEAR-idle box, not merely a
    * non-contended one: refreshed entries are raw times, and writing
    * them from a 1.1×+-slow box inflates every future verdict's
    * denominator (the exact stale-baseline ambiguity round 12's q116
    * left for hand adjudication). */
  private[graft] val BaselineRefreshProbeBar = 1.1

  /** The box-speed scale the verdicts normalize by: the SMALLEST probe
    * ratio above 1.0. Only the slowdown common to EVERY probe is
    * attributable to the box — with a join-light and a shuffle-heavy
    * probe, a clean join probe next to an elevated shuffle probe proves
    * the box is not uniformly slow, so queries are NOT normalized by
    * the shuffle probe's trouble (which is either shuffle-path
    * contention, reported, or that probe's own regression, alerted). */
  private[graft] def probeScale(probeRatios: Seq[Double]): Double =
    probeRatios.minOption.filter(_ > 1.0).getOrElse(1.0)

  /** Calibration-aware verdicts: the gate's regression set, SUPPRESSED
    * (empty, contended=true) when EVERY calibration probe — fixed
    * reference queries re-timed immediately before and after the stable
    * pass — deviated more than [[ProbeContendedFactor]] from its
    * committed baseline. Round 11's driver emitted four false
    * regressions because its "stable" re-runs landed on a degraded box
    * (stable 6.84 s vs its own sweep min 2.41 s); the probes make that
    * condition measurable instead of judge-adjudicated. Requiring ALL
    * probes elevated (not any) closes the converse hole: a code change
    * that regresses one probe query itself would otherwise read as
    * "contended" and suppress every verdict — with a second,
    * differently-bottlenecked probe still clean, the round stays live
    * and the elevated probe is alerted as a suspect. A contended run
    * reports the would-be entries separately (`suppressed`) so a reader
    * can still see what to re-check on an idle machine; no probe
    * baseline (first round, renamed queries) leaves the gate exactly as
    * before. */
  private[graft] def calibratedRegressions(
      adjudicated: Map[String, Double], baseline: Map[String, Double],
      probeRatios: Seq[Double])
      : (Seq[(String, Double, Double)], Boolean) = {
    val contended =
      probeRatios.nonEmpty && probeRatios.min > ProbeContendedFactor
    if (contended) (Seq.empty, true)
    else {
      // NORMALIZE by the shared probe ratio below the suppression
      // threshold: a box running uniformly 1.25× slow scales every
      // query INCLUDING the probes, so dividing compares like-for-like
      // — a borderline 1.32×-of-baseline heavy query on that box is
      // 1.06× in box-speed terms, not a regression (the exact false
      // flag a 1.3-threshold gate lets through at 1.29× degradation).
      // The divisor is capped at ProbeContendedFactor by construction,
      // so a genuine 1.7×+ slowdown still trips after normalization.
      val scale = probeScale(probeRatios)
      val flagged = adjudicated.toSeq.sortBy(_._1).flatMap { case (n, v) =>
        baseline.get(n).filter(b => isRegression(v / scale, b))
          .map(b => (n, v, b)) // report the RAW time; gate on normalized
      }
      (flagged, false)
    }
  }

  /** Single-probe form (pre-round-13 shape; kept for the no-second-probe
    * fallback and the gate specs). */
  private[graft] def calibratedRegressions(
      adjudicated: Map[String, Double], baseline: Map[String, Double],
      probeRatio: Option[Double])
      : (Seq[(String, Double, Double)], Boolean) =
    calibratedRegressions(adjudicated, baseline, probeRatio.toSeq)

  /** The ALWAYS-SAFE baseline merge (`WRITE_BASELINE=tighten`): never
    * raises an existing entry (min(old, fresh)), fills entries for
    * queries that have none, and leaves the PROBE entries untouched.
    * Rationale, per case:
    *   - existing entries can only tighten → no future verdict's
    *     denominator can inflate, so this merge needs no near-idle bar
    *     (the bar exists purely to keep inflated raw times out);
    *   - a new entry minted on a busy box is biased HIGH, which is the
    *     safe direction for a first entry (a future regression still
    *     trips; a false flag cannot) — the same argument PERF.md's
    *     hand-adjudicated entries used, now automated;
    *   - probe entries are the contention/refresh bar's denominators:
    *     letting one fast window ratchet them DOWN is exactly how the
    *     epoch-2 q13 floor made the 1.1 refresh bar unreachable for
    *     four windows running (round 15) — so tighten never moves them.
    * This structurally ends hand-adjudicated entries: every sweep may
    * run tighten, new queries gate immediately, and existing entries
    * converge downward to true idle floors over time.
    *
    * The ratchet is BOUNDED per window ([[TightenMinShrink]]): one
    * anomalously fast window — warm page cache, partial work from a
    * transient bug — may lower an entry at most 2×, not to an arbitrary
    * floor no healthy run ever attains (the probe-entry failure mode,
    * slower). A genuine large improvement still converges: each clean
    * window halves the remaining gap, so two or three windows land it. */
  private[graft] val TightenMinShrink = 0.5
  private[graft] def tightenedBaseline(
      old: Map[String, Double], fresh: Map[String, Double],
      probes: Set[String]): Map[String, Double] =
    (old.keySet ++ fresh.keySet).iterator.map { k =>
      k -> ((old.get(k), fresh.get(k)) match {
        case (Some(o), Some(f)) =>
          if (probes(k)) o
          else math.min(o, math.max(f, o * TightenMinShrink))
        case (Some(o), None) => o
        case (None, f) => f.get
      })
    }.toMap

  /** The committed baseline file's epoch stamp ("_epoch": N), if any. */
  private def committedEpoch(): Option[Int] =
    """"_epoch":\s*([0-9]+)""".r
      .findFirstMatchIn(scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("BENCH_STABLE_BASELINE.json")))
        .getOrElse(""))
      .map(_.group(1).toInt)

  /** Serialize + write BENCH_STABLE_BASELINE.json — the ONE place that
    * knows the file format, shared by the normal refresh, the tighten
    * refresh and the epoch mint (a format tweak applied to one copy of
    * three would silently diverge the files). `meta` carries the
    * "_"-prefixed pseudo-entries other than the epoch stamp — today the
    * same-window sweep-total companion ("_sweep_total" seconds over
    * "_sweep_total_n" queries, minted only on near-idle windows): the
    * per-query entries are a min-ENVELOPE no single sweep ever attains
    * (their sum drifts the headline ratio up mechanically as entries
    * tighten), so the headline compares a sweep total against a total
    * one real window actually produced. */
  private def writeBaselineFile(entries: Seq[(String, Double)],
                                epoch: Option[Int],
                                meta: Seq[(String, Double)] = Seq.empty): Boolean = {
    val body = (epoch.map(e => s""""_epoch": $e""").toSeq ++
      (meta.sortBy(_._1) ++ entries).map { case (k, v) =>
        s""""$k": ${BigDecimal(v).setScale(3,
          BigDecimal.RoundingMode.HALF_UP)}"""
      }).map("  " + _).mkString("{\n", ",\n", "\n}\n")
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_STABLE_BASELINE.json"), body)
      true
    } catch { case e: Throwable =>
      // swallowed-but-reported here; callers that announce success
      // (the epoch mint's MINTED line) must check the return value
      System.err.println(s"[bench] baseline write failed: ${e.getMessage}")
      false
    }
  }

  /** The would-be regression set regardless of calibration — what a
    * contended run records as `suppressed`. */
  private[graft] def rawRegressions(
      adjudicated: Map[String, Double], baseline: Map[String, Double])
      : Seq[(String, Double, Double)] =
    adjudicated.toSeq.sortBy(_._1).flatMap { case (n, v) =>
      baseline.get(n).filter(b => isRegression(v, b)).map(b => (n, v, b))
    }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table + run one small query so session init,
    // parquet footer reads and JIT compilation don't land on the first
    // timed query.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).count())
      SparkEntry.queries.get("q13_star_join").foreach(_(spark, sfDir).count())
      // streaming warmup: the first streaming query of a session pays
      // micro-batch engine class-loading + state-store init (~1-2 s);
      // drain one minimal streaming query first so timed streaming
      // queries measure plan cost, not one-time init (uses the bench's
      // own data dir — no other path is assumed to exist)
      graft.streaming.EventsStream
        .hourlyRollupStreaming(spark, sfDir, "graft_warmup_stream")
        .count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup FAILED: ${e.getClass.getName}: ${e.getMessage}")
    }
    // Failures are RECORDED, not swallowed: a failed query times as -1 in
    // the per-query map (a broken query must not silently "pass" as ~0 s)
    // and its stack reason goes to stderr.
    // optional local-dev filter (unset for the driver → full sweep)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        -1.0
      }
    }
    // N >= 2 full passes (SPARK_GRAFT_BENCH_PASSES, default 2), per-query
    // min/median/max: a single contended pass on this shared container has
    // shown 2x+ swings on IDENTICAL code (see PERF.md). The HEADLINE value
    // stays min (warm steady-state throughput — a real regression shows in
    // every pass); the spread is what separates a plan regression (min
    // moved) from machine noise (min flat, max inflated).
    val passesN = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    val passes: Seq[Map[String, Double]] =
      (1 to passesN).map(_ => sweep.map { case (n, f) => n -> timeOnce(n, f) }.toMap)
    // (name, Some((min, median, max))) — None if ANY pass failed
    val results: Seq[(String, Option[(Double, Double, Double)])] =
      sweep.map { case (name, _) =>
        val ts = passes.map(_(name))
        name -> (if (ts.exists(_ < 0)) None else {
          val s = ts.sorted
          val med = if (s.length % 2 == 1) s(s.length / 2)
            else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
          Some((s.head, med, s.last))
        })
      }
    val failed = results.collect { case (n, None) => n }
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} FAILED: ${failed.mkString(", ")}")
    // Stability pass: queries whose sweep spread is WIDE (max > 3×min and
    // max-min > 1 s) are contention victims, not plan regressions — but a
    // reader can't tell from the spread alone. Re-run each flagged query
    // STABLE_RUNS times consecutively on the now-otherwise-idle JVM (no
    // interleaved neighbors competing for the 32 threads) and record the
    // min as `stable_min` in BENCH_SPREAD.json: if stable_min ≈ sweep min
    // the noise verdict is confirmed; a stable_min near the inflated max
    // is a real slowdown the sweep's min never caught. Bounded: ≤ 8
    // queries × 3 runs. Disable with SPARK_GRAFT_BENCH_STABLE_RUNS=0.
    val stableRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_STABLE_RUNS", "3").toInt
    // Committed per-query stable baseline (previous round's adjudicated
    // mins): any query whose sweep min regresses vs it gets a stable
    // re-run even with a TIGHT spread — round 9's q66 sat at 1.7 s in
    // EVERY pass (per-pass codegen-cache recompile) yet ran 0.8 s
    // isolated; spread-only flagging can never catch that class.
    val committedAll: Map[String, Double] =
      try {
        val p = java.nio.file.Paths.get("BENCH_STABLE_BASELINE.json")
        if (!java.nio.file.Files.exists(p)) Map.empty
        else """"([^"]+)":\s*([0-9.]+)""".r
          .findAllMatchIn(java.nio.file.Files.readString(p))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    // "_"-prefixed keys are file METADATA (the epoch stamp + the
    // sweep-total companion), not query entries — letting one through
    // would e.g. make '_epoch' the sorted-first fallback probe candidate
    val baseline: Map[String, Double] =
      committedAll.filterNot(_._1.startsWith("_"))
    val committedMeta: Map[String, Double] =
      committedAll.filter(_._1.startsWith("_")) - "_epoch"
    def regressed(name: String, v: Double): Boolean =
      baseline.get(name).exists(b => Bench.isRegression(v, b))
    val wideSpread = results.collect {
      // 2× (not 3×): round-9's q181 sat at a genuine 2.4× spread and a
      // 3× bar never re-ran it; the absolute guard keeps sub-second
      // queries (where 2× is scheduling jitter) out of the re-run set
      case (k, Some((mn, _, mx))) if mx > 2 * mn && mx - mn > 1.0 => (k, mx - mn)
    }.sortBy(-_._2).take(8).map(_._1)
    val vsBaseline = results.collect {
      case (k, Some((mn, _, _))) if regressed(k, mn) => k
    }
    // The heavy tail ALWAYS gets a stable re-run: queries ≥ 2 s dominate
    // the sweep total, and round 10 showed two of them (q126 at 1.47×,
    // q156 at 1.44×) sliding under the old trigger with no stable datum
    // on record — sub-threshold creep the spread flags can't see. With
    // every ≥ 2 s query carrying a stable_min in BENCH_SPREAD.json, the
    // tighter heavy gate in [[Bench.isRegression]] adjudicates against
    // isolation numbers, not contended sweep ones.
    val heavyTail = results.collect {
      case (k, Some((mn, _, _))) if mn >= 2.0 => k
    }
    val flagged = (wideSpread ++ vsBaseline ++ heavyTail).distinct
    // Calibration probes: fixed reference queries with committed
    // baselines, re-timed immediately BEFORE and AFTER the stable pass
    // (max(before, after): contention at either end taints the window
    // between them). TWO probes with different bottlenecks — a
    // broadcast star join (scan-bound, shuffle-light) and the TF-IDF
    // chain (explode + wide groupBy shuffles) — so box-wide contention
    // (both elevated → suppress) is distinguishable from shuffle-path
    // contention or a probe's own code regression (one elevated →
    // verdicts stay live, the elevated probe is alerted).
    val probeNames: Seq[String] = {
      val preferred = Seq("q13_star_join", "q66_tfidf")
        .filter(n => baseline.get(n).exists(_ > 0) &&
          SparkEntry.queries.contains(n))
      if (preferred.nonEmpty) preferred
      else baseline.filter(_._2 >= 0.5).keys.toSeq.sorted.take(1)
        .filter(SparkEntry.queries.contains)
    }
    // Each probe is a MIN of 3 back-to-back runs: the committed
    // denominator is an adjudicated min, so a single-shot numerator is
    // systematically biased high (scheduling/GC tails — round 15
    // measured q66 single-shot at 2.1x its baseline in the same run
    // whose stable min sat at 1.14x, and q62's stable min UNDER its
    // baseline), which made the 1.1 refresh bar unreachable on an idle
    // box. Min-vs-min compares like for like; real contention still
    // elevates all three runs and trips the bar.
    def probePass(): Map[String, Double] =
      if (stableRuns <= 0) Map.empty
      else probeNames.flatMap { n =>
        val ts = (1 to 3).map(_ => timeOnce(n, SparkEntry.queries(n)))
          .filter(_ >= 0)
        ts.minOption.map(n -> _)
      }.toMap
    // a probe the sweep filter excluded never warmed: its first timed
    // run would pay plan compile + codegen and read as a 3x "alert";
    // warm it once untimed (full sweeps skip this — the passes warmed it)
    if (stableRuns > 0) probeNames
      .filter(n => only.exists(!_.contains(n)))
      .foreach(n => timeOnce(n, SparkEntry.queries(n)))
    val probesBefore = probePass()
    val stableMin: Map[String, Double] =
      if (stableRuns <= 0) Map.empty
      else flagged.map { n =>
        val ts = (1 to stableRuns).map(_ => timeOnce(n, SparkEntry.queries(n)))
          .filter(_ >= 0)
        n -> (if (ts.isEmpty) -1.0 else ts.min)
      }.toMap
    val probesAfter = probePass()
    val probeRatios: Seq[(String, Double)] = probeNames.flatMap { n =>
      for {
        b <- baseline.get(n)
        pb <- probesBefore.get(n)
        pa <- probesAfter.get(n)
      } yield n -> math.max(pb, pa) / b
    }
    // The GATE: a query is a REGRESSION when even its adjudicated min
    // (stable re-run when one happened, else the sweep min) exceeds
    // 1.5× its committed baseline. Contention and cache-eviction noise
    // can't reach here — the stable re-run already filtered them — so
    // an entry means a real plan/kernel slowdown to investigate.
    def adjudicated(name: String): Option[Double] = {
      val st = stableMin.get(name).filter(_ >= 0)
      val sw = results.collectFirst { case (`name`, Some((mn, _, _))) => mn }
      (st, sw) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
    }
    val adjMap: Map[String, Double] = results.flatMap {
      case (name, Some(_)) => adjudicated(name).map(name -> _)
      case _ => None
    }.toMap
    val (regressions, contended) =
      calibratedRegressions(adjMap, baseline, probeRatios.map(_._2))
    val scale = probeScale(probeRatios.map(_._2))
    def tot(f: ((Double, Double, Double)) => Double): Double =
      results.flatMap(_._2).map(f).sum
    val (minTotal, medTotal, maxTotal) = (tot(_._1), tot(_._2), tot(_._3))
    // The best SINGLE-PASS total: the smallest sum-of-one-pass's-times
    // across the N passes — a total one contiguous pass actually
    // produced, unlike minTotal (the per-query min-envelope, which no
    // single pass attains; r17 ADVICE). Valid only when every query
    // succeeded in every pass (a -1 would deflate a pass's sum).
    val bestPassTotal: Option[Double] =
      if (failed.nonEmpty || passes.isEmpty) None
      else Some(passes.map(_.values.sum).min)
    // Same-window sweep-total companion: minted alongside a baseline
    // write whenever the window is NEAR-IDLE (every probe under the
    // refresh bar) and every query succeeded — the one artifact the
    // min-envelope per-query entries cannot provide, a total that one
    // real window actually produced. Minted from the best single-pass
    // total (not the within-window envelope — r17 ADVICE). The count
    // travels with it so a changed query set reports incomparable
    // instead of silently wrong.
    val nOk = results.count(_._2.isDefined)
    val companionQualifies = probeRatios.nonEmpty &&
      probeRatios.forall(_._2 <= BaselineRefreshProbeBar) &&
      bestPassTotal.nonEmpty
    // The committed companion keeps the BEST qualifying single-pass
    // total for the same query set: probes bracket the stable pass, not
    // the whole sweep, so a window can read probe-clean yet degrade
    // mid-sweep — letting such a window RAISE the companion 20%+
    // (observed r18: 261.2 → 318.7) inflates the denominator every
    // future headline divides by, the flattering direction. Min-keeping
    // stays honest: each candidate is a total one real window actually
    // produced, never a cross-pass or cross-query envelope. A changed
    // query set always replaces (old total incomparable).
    val freshMeta: Map[String, Double] =
      if (companionQualifies) {
        val keepOld =
          committedMeta.get("_sweep_total_n").map(_.toInt).contains(nOk) &&
          committedMeta.get("_sweep_total").exists(_ <= bestPassTotal.get)
        if (keepOld) committedMeta
        else Map("_sweep_total" -> bestPassTotal.get,
          "_sweep_total_n" -> nOk.toDouble)
      } else committedMeta
    val suppressed: Seq[(String, Double, Double)] =
      if (contended) rawRegressions(adjMap, baseline) else Seq.empty
    // A probe elevated past the contention bar while ANOTHER probe ran
    // clean is not box-wide contention — it is either contention in
    // that probe's own subsystem (shuffle path vs scan path) or a code
    // regression in the probe query itself; alert it by name so the
    // reader knows WHICH, instead of silently suppressing the round.
    val probeAlerts: Seq[(String, Double)] =
      if (contended) Seq.empty
      else probeRatios.filter(_._2 > ProbeContendedFactor)
    if (contended)
      System.err.println("[bench] CONTENDED run (every probe over " +
        s"$ProbeContendedFactor x: " + probeRatios.map { case (n, r) =>
          f"$n $r%.2f" }.mkString(", ") + "): regression verdicts " +
        s"suppressed; ${suppressed.size} candidate(s) need an " +
        "idle-machine re-run: " + suppressed.map(_._1).mkString(", "))
    probeAlerts.foreach { case (n, r) =>
      System.err.println(f"[bench] PROBE ALERT: $n ran $r%.2fx its " +
        "committed baseline while the other probe stayed clean — " +
        "suspect its own plan/kernel or its subsystem's contention, " +
        "not the box")
    }
    if (regressions.nonEmpty)
      System.err.println(s"[bench] ${regressions.size} REGRESSION(S) vs " +
        s"stable baseline: " + regressions.map { case (n, v, b) =>
          f"$n $b%.2f->$v%.2f (${v / scale}%.2f normalized)" }.mkString(", "))
    // Refresh the committed baseline on demand (full sweeps only):
    // adjudicated mins for every query, carrying the old entry when a
    // query was dropped this round. Refreshing demands a NEAR-idle box
    // (every probe under BaselineRefreshProbeBar), not merely a
    // non-contended one: the written times are raw, and entries from a
    // 1.1x+-slow box inflate every future verdict's denominator.
    val refreshBlocked = contended ||
      probeRatios.exists(_._2 > BaselineRefreshProbeBar)
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("1")
        && only.isEmpty && refreshBlocked) {
      System.err.println("[bench] baseline refresh SKIPPED: " +
        (if (contended) "contended run"
         else "probe(s) over the refresh bar " +
           s"$BaselineRefreshProbeBar: " + probeRatios
             .filter(_._2 > BaselineRefreshProbeBar)
             .map { case (n, r) => f"$n $r%.2f" }.mkString(", ")))
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("1")
        && only.isEmpty && !refreshBlocked) {
      val fresh = results.collect { case (k, Some(_)) =>
        k -> adjudicated(k).getOrElse(-1.0) }.filter(_._2 >= 0).toMap
      // carry the epoch stamp through a normal refresh; the refresh bar
      // already proved near-idle, so the companion re-mints here too
      Bench.writeBaselineFile((baseline ++ fresh).toSeq.sortBy(_._1),
        Bench.committedEpoch(), freshMeta.toSeq)
    }
    // TIGHTEN refresh (SPARK_GRAFT_BENCH_WRITE_BASELINE=tighten): the
    // always-safe merge — see [[tightenedBaseline]]. Runs on any
    // non-contended window (no near-idle bar: nothing here can inflate
    // a denominator), which is what retires hand-adjudicated entries:
    // new queries gate from their first sweep, and existing entries
    // converge DOWNWARD to true idle floors as windows come and go.
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("tighten")
        && only.isEmpty) {
      if (contended)
        System.err.println("[bench] tighten refresh SKIPPED: contended run")
      else {
        val fresh = results.collect { case (k, Some(_)) =>
          k -> adjudicated(k).getOrElse(-1.0) }.filter(_._2 >= 0).toMap
        val merged = Bench.tightenedBaseline(baseline, fresh,
          probeNames.toSet).toSeq.sortBy(_._1)
        val added = fresh.keySet -- baseline.keySet
        val lowered = fresh.filter { case (k, v) =>
          baseline.get(k).exists(v < _) && !probeNames.contains(k) }
        System.err.println(s"[bench] tighten refresh: ${added.size} new " +
          s"entr${if (added.size == 1) "y" else "ies"}" +
          (if (added.nonEmpty) s" (${added.toSeq.sorted.mkString(", ")})"
           else "") + s", ${lowered.size} tightened" +
          (if (!companionQualifies)
             "; sweep-total companion carried (window not near-idle)"
           else if (freshMeta == committedMeta)
             f"; sweep-total companion kept (this window's best pass ${bestPassTotal.get}%.1f s did not beat it)"
           else
             f"; sweep-total companion minted (${bestPassTotal.get}%.1f s / $nOk queries, best single pass)"))
        Bench.writeBaselineFile(merged, Bench.committedEpoch(),
          freshMeta.toSeq)
      }
    }
    // EPOCH MINT (SPARK_GRAFT_BENCH_WRITE_BASELINE=epoch): replace the
    // WHOLE committed baseline with this run's adjudicated mins — the
    // structural fix for a baseline whose probe entries predate the
    // box's current performance epoch. The normal refresh bar compares
    // today's probes against exactly those stale entries, so once the
    // box's floor moved past 1.1× of the old numbers the refresh is
    // UNREACHABLE forever (round-14: ~12 refused windows, q66's idle
    // floor ≈ 1.25× its epoch-1 entry) and every query added since
    // stays ungated. The mint therefore swaps the evidence: instead of
    // the old-epoch comparison (the thing being replaced), it demands
    // INTERNAL stability — ≥ 3 full passes and every probe's own
    // cross-pass spread ≤ 1.3 (box churn during the window shows up as
    // spread; a contended run cannot fake three consistent passes).
    // The previous epoch is preserved as BENCH_STABLE_BASELINE_epochN
    // .json for cross-epoch comparison, and the new file records its
    // epoch number as the `_epoch` pseudo-entry.
    if (sys.env.get("SPARK_GRAFT_BENCH_WRITE_BASELINE").contains("epoch")
        && only.isEmpty) {
      val mintSpreadBar = 1.3
      val probeSpreads: Seq[(String, Double)] = probeNames.map { n =>
        val ts = passes.map(_.getOrElse(n, -1.0)).filter(_ > 0)
        n -> (if (ts.isEmpty) Double.MaxValue else ts.max / ts.min)
      }
      val unstable = probeSpreads.filter(_._2 > mintSpreadBar)
      if (passesN < 3)
        System.err.println("[bench] epoch mint SKIPPED: needs >= 3 " +
          s"passes, got $passesN")
      else if (unstable.nonEmpty)
        System.err.println("[bench] epoch mint SKIPPED: probe cross-pass" +
          s" spread over $mintSpreadBar: " + unstable.map { case (n, r) =>
            f"$n $r%.2f" }.mkString(", "))
      else {
        val oldEpoch = Bench.committedEpoch().getOrElse(1)
        val fresh = results.collect { case (k, Some(_)) =>
          k -> adjudicated(k).getOrElse(-1.0) }.filter(_._2 >= 0)
          .toSeq.sortBy(_._1)
        try {
          val cur = java.nio.file.Paths.get("BENCH_STABLE_BASELINE.json")
          val keep = java.nio.file.Paths.get(
            s"BENCH_STABLE_BASELINE_epoch$oldEpoch.json")
          if (java.nio.file.Files.exists(cur) &&
              !java.nio.file.Files.exists(keep))
            java.nio.file.Files.copy(cur, keep)
          // announce the mint ONLY on a confirmed write — a swallowed
          // write failure followed by a MINTED line would leave the
          // operator believing an epoch landed that never did
          // an epoch mint proved >= 3 internally-stable passes: mint the
          // sweep-total companion from this window regardless of the
          // probe-vs-old-epoch ratio (the old epoch is what's being
          // replaced) — unless a query failed, which voids the total
          val mintMeta = bestPassTotal match {
            case Some(t) =>
              Map("_sweep_total" -> t, "_sweep_total_n" -> nOk.toDouble)
            case None => committedMeta
          }
          if (Bench.writeBaselineFile(fresh, Some(oldEpoch + 1),
              mintMeta.toSeq))
            System.err.println(s"[bench] epoch ${oldEpoch + 1} baseline " +
              s"MINTED (${fresh.size} queries; probes " + probeSpreads
                .map { case (n, r) => f"$n spread $r%.2f" }.mkString(", ") +
              s"); epoch $oldEpoch preserved")
        } catch { case e: Throwable =>
          System.err.println(s"[bench] epoch mint write failed: ${e.getMessage}")
        }
      }
    }
    def r3(v: Double): String =
      if (v < 0) "-1"
      else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def triple(t: Option[(Double, Double, Double)]): String = t match {
      case Some((mn, md, mx)) => s"[${r3(mn)},${r3(md)},${r3(mx)}]"
      case None => "[-1,-1,-1]"
    }
    // Full-named per-query spread map first (for humans reading the
    // complete log), and the same JSON to BENCH_SPREAD.json so a judged
    // sweep has the untruncated per-query spread regardless of the
    // consumer's tail window.
    val qsFull = results.map { case (k, v) => s"\"" + k + "\":" + triple(v) }
      .mkString("{", ",", "}")
    val stableJson = stableMin.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // [adjudicated, baseline] per regressed query — empty when the round
    // holds the line, which is the gate a reader checks first
    val regJson = regressions.sortBy(_._1)
      .map { case (k, v, b) => s"\"" + k + "\":[" + r3(v) + "," + r3(b) + "]" }
      .mkString("{", ",", "}")
    val suppJson = suppressed.sortBy(_._1)
      .map { case (k, v, b) => s"\"" + k + "\":[" + r3(v) + "," + r3(b) + "]" }
      .mkString("{", ",", "}")
    // the NORMALIZED (box-speed-adjusted) value of every flagged or
    // suppressed query, so the artifact records what the gate actually
    // compared — a reader re-adjudicating a suppressed candidate on an
    // idle box knows the number it must beat
    val normJson = (regressions ++ suppressed).map(_._1).distinct.sorted
      .flatMap(k => adjMap.get(k).map(v => s"\"" + k + "\":" + r3(v / scale)))
      .mkString("{", ",", "}")
    val probeJson = probeRatios.headOption match {
      case Some((n, r)) => s"""{"name":"$n","ratio":${r3(r)}}"""
      case None => "null"
    }
    val probesJson = probeRatios.map { case (n, r) =>
      s"""{"name":"$n","ratio":${r3(r)}}""" }.mkString("[", ",", "]")
    val alertsJson = probeAlerts.map { case (n, r) =>
      s"\"" + n + "\":" + r3(r) }.mkString("{", ",", "}")
    // The HEADLINE total-vs-total comparison: this sweep's min-total vs
    // the committed same-window companion (a total one real near-idle
    // window produced), comparable only when the query set size matches.
    // The sum-of-per-query-mins ratio is a FOOTNOTE: that denominator is
    // a lower envelope no single sweep attains, so its ratio drifts up
    // mechanically as entries tighten even on identical code.
    val baseSweepTotal = committedMeta.get("_sweep_total").filter(_ > 0)
    val baseSweepN = committedMeta.get("_sweep_total_n").map(_.toInt)
    // totals-vs-totals, like for like: the numerator is this window's
    // best SINGLE-PASS total (same construction as the committed
    // companion), not the per-query min-envelope (r17 ADVICE)
    val vsSweepTotal: Option[Double] = for {
      t <- baseSweepTotal; n <- baseSweepN; num <- bestPassTotal
      if only.isEmpty && n == nOk
    } yield num / t
    val sweepJson =
      s""""best_pass_total":${bestPassTotal.map(r3).getOrElse("null")},""" +
      s""""baseline_sweep_total":${baseSweepTotal.map(r3).getOrElse("null")},""" +
      s""""baseline_sweep_n":${baseSweepN.map(_.toString).getOrElse("null")},""" +
      s""""vs_sweep_total":${vsSweepTotal.map(r3).getOrElse("null")}"""
    val fullLine =
      s"""{"metric":"total_full","value":${r3(minTotal)},"med_total":${r3(medTotal)},"max_total":${r3(maxTotal)},"passes":$passesN,"unit":"sec",$sweepJson,"queries":$qsFull,"stable_min":$stableJson,"regressions":$regJson,"normalized":$normJson,"contended":$contended,"probe":$probeJson,"probes":$probesJson,"probe_alerts":$alertsJson,"suppressed":$suppJson,"sf":"$sfDir"}"""
    println(fullLine)
    // FULL sweeps only: a filtered dev run (SPARK_GRAFT_BENCH_ONLY) must
    // never clobber the committed full-sweep artifact with a 1-query file
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_SPREAD.json"), fullLine + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_SPREAD.json write failed: ${e.getMessage}")
      }
    // The consumer of this output keeps only the LAST ~2000 characters and
    // parses the JSON line out of that window. Three things have broken
    // that in the past: (a) a full per-query map at 250 queries is ~4 KB,
    // so the line's opening brace fell outside the window even with short
    // keys (r17's committed artifact read parsed:null); (b) Spark
    // shutdown WARNs landed after the line and pushed it out entirely;
    // (c) front-clipping ate the summary fields. So: silence logging,
    // stop Spark FIRST, and print one SMALL line — summary totals plus
    // only the 12 most expensive queries (the tail that moves the total)
    // — that fits the window whole. The complete per-query spread lives
    // in BENCH_SPREAD.json (written above) and in the full-named line
    // earlier in the log.
    org.apache.log4j.LogManager.getRootLogger.setLevel(org.apache.log4j.Level.OFF)
    try spark.stop() catch { case _: Throwable => () }
    val qsShort = (results.collect { case (k, Some((mn, _, _))) => (k, mn) }
      .sortBy(-_._2).take(12).sortBy(_._1)
      .map { case (k, mn) => s"\"" + k.takeWhile(_ != '_') + "\":" + r3(mn) } ++
      failed.map(k => s"\"" + k.takeWhile(_ != '_') + "\":-1"))
      .mkString("{", ",", "}")
    val noisiest = results
      .collect { case (k, Some(t)) => (k, t) }
      .sortBy { case (_, (mn, _, mx)) => mn - mx } // widest absolute spread first
      .take(5)
      .map { case (k, t) => s"\"" + k.takeWhile(_ != '_') + "\":" + triple(Some(t)) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","n_queries":$nOk,"n_failed":${failed.size},"queries":$qsShort,"queries_full":"BENCH_SPREAD.json","sf":"$sfDir","unit":"sec","value":${r3(minTotal)},"med_total":${r3(medTotal)},"max_total":${r3(maxTotal)},"passes":$passesN,$sweepJson,"noisiest":$noisiest}""")
  }
}
