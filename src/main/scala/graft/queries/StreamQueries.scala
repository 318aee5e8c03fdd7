package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.catalog.SceneCatalog
import graft.ext.Multimodal
import graft.functions.Portable._
import graft.streaming.EventsStream

/** Streaming, multimodal and catalog-source operators as driver queries.
  * The streaming entries run REAL Structured Streaming queries (memory
  * sink, AvailableNow trigger, drained synchronously) whose final tables
  * are checked against the same batch DuckDB oracle — stream/batch parity
  * is the assertion.
  */
object StreamQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked tumbling-window rollup, streaming — oracle is the batch
    // hourly rollup (q21's shape through window() instead of date_trunc).
    "q40_stream_rollup" -> ((s, d) =>
      EventsStream.hourlyRollupStreaming(s, d)),

    // Stateful flatMapGroupsWithState per-user totals (exact cents state).
    "q41_stream_user_totals" -> ((s, d) =>
      EventsStream.perUserTotalsStreaming(s, d)),

    // Streaming exact dedup: every event staged TWICE, deduped by
    // event_id within the watermark — oracle is the single-copy batch
    // per-user distinct count (stream/batch parity).
    "q59_stream_dedup" -> ((s, d) =>
      EventsStream.dedupStreaming(s, d)),

    // Streaming sessionization (session_window, 4 h gap) — oracle is the
    // batch gaps-and-islands rollup with the same >= gap rule.
    "q67_stream_sessions" -> ((s, d) =>
      EventsStream.sessionizeStreaming(s, d)),

    // Stream-stream inner join (click → purchase within 1 h, watermarked
    // both sides) — oracle is the equivalent batch interval self-join.
    "q78_stream_join" -> ((s, d) =>
      EventsStream.clickPurchaseJoinStreaming(s, d)),

    // Stream-static dimension enrichment + windowless rollup — oracle is
    // the batch join-aggregate.
    "q79_stream_enrich" -> ((s, d) =>
      EventsStream.enrichedRollupStreaming(s, d)),

    // STREAMING quantile monitoring with bounded state: the q248
    // register sketch as the streaming aggregation state (≤ ~900 cells
    // per decade per event type, no matter how many events flow), batch
    // rank-walk read-out at the SketchGrid probes — oracle is the
    // identical register arithmetic replayed over the raw events
    // (stream/batch parity; counts are order-free, so micro-batch
    // boundaries cannot move a single cell).
    "q250_stream_quantile_sketch" -> ((s, d) =>
      EventsStream.quantileSketchStreaming(s, d)),

    // Streaming drift ALERTING — q249's register-drift table composed
    // with q250's register-as-streaming-state: one register per day
    // maintained inside the stream (bounded state per window), the
    // reference register is the per-day registers re-aggregated
    // (mergeability — no second data pass), and days whose worst probe
    // gap exceeds the threshold raise the alert flag. Oracle replays
    // the identical register arithmetic per day over the raw events.
    "q252_stream_drift_alert" -> ((s, d) =>
      EventsStream.driftAlertStreaming(s, d)),

    // Stream-stream LEFT OUTER join: unmatched clicks emit (click, NULL)
    // on watermark expiry — the state-eviction semantics the inner join
    // never exercises. Oracle is the batch LEFT JOIN with the identical
    // interval condition (stream/batch parity incl. the null rows).
    "q181_stream_left_join" -> ((s, d) =>
      EventsStream.clickPurchaseLeftJoinStreaming(s, d)),

    // Streaming incremental dedup: the q135 daily-ingest relation driven
    // by a real file stream — per micro-batch the new docs shingle, probe
    // the static banded index, exact-verify, and commit to a versioned
    // table under the batch's txn id (exactly-once). Oracle is q135's —
    // stream/batch parity over the SAME shared probe/verify definitions.
    "q150_stream_incr_dedup" -> ((s, d) =>
      graft.streaming.DocsStream.incrementalDedupStreaming(s, d)),

    // Streaming CDC apply: the q97 changelog through a file stream, each
    // micro-batch an atomic upsert+delete mergeInto commit on a versioned
    // customer base (txn-exactly-once, stats-bounded rewrite). Oracle is
    // q97's — stream/batch parity.
    "q158_stream_cdc_apply" -> ((s, d) =>
      graft.streaming.CdcStream.cdcApplyStreaming(s, d)),

    // Video frame extraction over REAL multi-frame containers: each
    // "video" document becomes an animated GIF (frame pixels a closed
    // form of (media_id, frame, pixel) — the oracle's no-codec side),
    // the Spark side must round-trip it through the JDK's actual GIF
    // encoder AND decoder — frameStage walks the container's frame
    // directory, samples every 2nd frame, and checksums the DECODED
    // pixels, so a codec bug (frame order, palette, dims) breaks the
    // hash. Batch-iterating mapPartitions kernel (the sanctioned
    // custom-kernel slot); the id list repartitions before the
    // CPU-bound encode/decode so all cores work; payload bytes are
    // born and die inside one task — nothing binary ever shuffles.
    "q83_media_frames" -> ((s, d) => {
      import s.implicits._
      import graft.ext.Multimodal
      val vids = documents(s, d)
        .filter(col("doc_id") % 3 === 2 && length(col("text")) >= 16)
        .select(col("doc_id"), floor(length(col("text")) / 16).cast("long"))
        .as[(Long, Long)]
        .repartition(32)
      val media = vids.mapPartitions(_.map { case (mid, nf) =>
        Multimodal.MediaRow(mid, "video", Multimodal.syntheticVideo(mid, nf)) })
      Multimodal.frameStage(s, media, everyK = 2).toDF()
        .select(col("media_id"), col("n_frames"), col("frame_idx"),
          col("checksum"))
    }),

    // Perceptual image near-dup: synthetic PNGs with constructed
    // near-duplicate pairs (doc_id pairs share a texture, the odd twin
    // has 3 flipped pixels) → REAL codec decode → 32×32 gray → DCT
    // pHash → 4-band Hamming LSH → popcount verify ≤ 3. Pigeonhole
    // guarantees recall (dist < bands ⇒ some 16-bit slice equal), so the
    // image corpus is never all-paired — the visual twin of the MinHash
    // dedup family, with the same banded shape. No SQL oracle (DuckDB
    // cannot decode PNG): the driver records the rows-only check, and
    // PHashSpec carries the ground-truth assertions (constructed pairs
    // found, brightness/contrast invariance, cross-group distances).
    "q174_phash_neardup" -> ((s, d) => {
      import s.implicits._
      // the id list reads as ONE parquet split — spread it before the
      // CPU-bound encode/decode kernel or 31 cores idle (the shuffle
      // moves only the ids, never image bytes)
      val media = documents(s, d).select(col("doc_id")).as[Long]
        .repartition(64)
        .mapPartitions(_.map(id => Multimodal.MediaRow(id, "image",
          Multimodal.syntheticImage(id / 2, (id % 2).toInt))))
      val hashed = Multimodal.pHashStage(s, media)
      Multimodal.pHashNearDup(hashed).orderBy(col("a"), col("b"))
    }),

    // pHash near-dup, ORACLE-VERIFIABLE half (the q174 split): the real
    // JDK codec decode lands 32×32 grays in a parquet stage
    // (Multimodal.writeGrayStage — the one step no SQL engine replays);
    // from that boundary on the ENTIRE pipeline — 2-D DCT as two 1-D
    // passes over the 1e-9-scaled integer basis, non-DC-mean threshold
    // as the integer compare 63·c_i > Σc, 4×16-bit band keys, banded
    // equi-join, popcount verify ≤ 3 — is fixed-point arithmetic both
    // engines compute bit-identically. Ranges by construction: |C9|≤1e9,
    // g4≤2.55e6 → row-pass terms ≤2.6e15, 32-term sums ≤8.5e16 (long);
    // the column pass crosses into DECIMAL(38,0) (≤2.7e27; HUGEINT on
    // the DuckDB side). Same banded-LSH scale shape as q174: the image
    // corpus is never all-paired, candidates only from shared 16-bit
    // slices (pigeonhole: dist ≤ 3 < 4 bands ⇒ some slice equal).
    "q186_phash_math" -> ((s, d) => {
      val stage = Multimodal.writeGrayStage(s, documents(s, d), d)
      val g = s.read.parquet(stage)
      // DCT → threshold → band keys as ONE precompiled kernel
      // (PHashKeysExpr): bit-identical to the 8+64 decimal HOF
      // aggregates the DuckDB oracle still spells out, without their
      // ~2.5 s/run Catalyst-analysis + janino tax (the q163
      // MomentAggregator lesson; PERF.md round 9/10)
      val keyed = g.select(col("media_id"),
          graft.functions.PHashKeysExpr.of(col("g4")).as("ks"))
        .select(col("media_id"),
          element_at(col("ks"), 1).as("k0"),
          element_at(col("ks"), 2).as("k1"),
          element_at(col("ks"), 3).as("k2"),
          element_at(col("ks"), 4).as("k3"))
        .localCheckpoint() // materialize ONCE before the 2-sided band join
      val banded = keyed.select(col("media_id"), col("k0"), col("k1"),
        col("k2"), col("k3"),
        posexplode(array(col("k0"), col("k1"), col("k2"), col("k3")))
          .as(Seq("band", "key")))
      val l = banded.select(col("band"), col("key"), col("media_id").as("a"),
        col("k0").as("a0"), col("k1").as("a1"), col("k2").as("a2"), col("k3").as("a3"))
      val r = banded.select(col("band"), col("key"), col("media_id").as("b"),
        col("k0").as("b0"), col("k1").as("b1"), col("k2").as("b2"), col("k3").as("b3"))
      l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          (bit_count(col("a0").bitwiseXOR(col("b0"))) +
           bit_count(col("a1").bitwiseXOR(col("b1"))) +
           bit_count(col("a2").bitwiseXOR(col("b2"))) +
           bit_count(col("a3").bitwiseXOR(col("b3")))).cast("long").as("dist"))
        .distinct()
        .filter(col("dist") <= 3)
        .orderBy(col("a"), col("b"))
    }),

    "q42_media_meta" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(s, documents(s, d))
      Multimodal.decodeStage(s, media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes").cast("long").as("n_bytes"),
                col("width").cast("long").as("width"),
                col("height").cast("long").as("height"), col("checksum"))
    }),

    // F5 asset pick over a real MAP<STRING,STRING> column with mixed-case
    // keys and a missing-nir variant (dropped, download_landsat_stac.py:150-151).
    // The four key-set variants are plan-time constants: the map is built
    // ONCE per row from pre-lowered constant key arrays (no per-row
    // lowerKeys pass) and the preference coalesce is resolved at plan time
    // via pickStatic — one element_at per band instead of 14.
    "q43_asset_pick_map" -> ((s, d) => {
      val v = (col("o_orderkey") % 4).cast("int")
      val rHref = concat(lit("href_"), col("o_orderkey"), lit("_r"))
      val nHref = concat(lit("href_"), col("o_orderkey"), lit("_n"))
      val variantKeys = Seq(
        0 -> Seq("red", "nir08"),
        1 -> Seq("SR_B3", "SR_B5"),
        2 -> Seq("B03", "B05"),
        3 -> Seq("red"))
      // constant (foldable) pre-lowered key arrays per variant
      val keys = when(v === 0, array(variantKeys(0)._2.map(k => lit(k.toLowerCase)): _*))
        .when(v === 1, array(variantKeys(1)._2.map(k => lit(k.toLowerCase)): _*))
        .when(v === 2, array(variantKeys(2)._2.map(k => lit(k.toLowerCase)): _*))
        .otherwise(array(variantKeys(3)._2.map(k => lit(k.toLowerCase)): _*))
      val vals = when(v === 3, array(rHref)).otherwise(array(rHref, nHref))
      orders(s, d)
        .select(col("o_orderkey"), (col("o_orderkey") % 4).cast("int").as("v"),
                map_from_arrays(keys, vals).as("lassets"))
        .select(col("o_orderkey"),
                SceneCatalog.pickStatic(col("lassets"), col("v"), variantKeys,
                  SceneCatalog.RedKeys).as("red_href"),
                SceneCatalog.pickStatic(col("lassets"), col("v"), variantKeys,
                  SceneCatalog.NirKeys).as("nir_href"))
        .filter(col("red_href").isNotNull && col("nir_href").isNotNull)
    }),
  )

  def oracle: Map[String, String] = Map(
    // stream/batch parity: the streaming incremental dedup must equal the
    // batch q135 relation, so it shares q135's oracle verbatim
    "q150_stream_incr_dedup" ->
      RetrievalQueries.oracle("q135_incremental_dedup"),
    // stream/batch parity: the streamed CDC apply must equal the batch
    // changelog fold, so it shares q97's oracle verbatim
    "q158_stream_cdc_apply" ->
      TrainQueries.oracle("q97_cdc_apply"),
    "q40_stream_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q41_stream_user_totals" ->
      """SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY user_id""",
    "q59_stream_dedup" ->
      """SELECT user_id, CAST(count(DISTINCT event_id) AS BIGINT) AS n_events
         FROM events GROUP BY user_id""",
    "q78_stream_join" ->
      """SELECT c.user_id AS user_id,
                c.event_id AS click_id,
                p.event_id AS purchase_id,
                epoch_ns(p.ts) // 1000000000 - epoch_ns(c.ts) // 1000000000 AS lag_s
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR""",
    "q79_stream_enrich" ->
      """SELECT n_name, event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN nation ON user_id % 25 = n_nationkey
         GROUP BY n_name, event_type""",
    "q250_stream_quantile_sketch" -> {
      import graft.queries.StatQueries.{sketchWSql, sketchCellSql,
        sketchMidSql, SketchGrid}
      val pList = SketchGrid.map(p => s"$p::DOUBLE").mkString("[", ", ", "]")
      s"""WITH xi AS (
            SELECT event_type,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
            FROM events),
          cells AS (
            SELECT event_type, ${sketchCellSql("x", "w")} AS cell,
                   count(*)::BIGINT AS cnt
            FROM (SELECT event_type, x, ${sketchWSql("x")} AS w FROM xi)
            GROUP BY 1, 2),
          cum AS (
            SELECT event_type, cell, cnt,
                   sum(cnt) OVER (PARTITION BY event_type ORDER BY cell) AS cum
            FROM cells),
          grid AS (
            SELECT event_type, n, n_cells, p,
                   CAST(ceil(p * n::DOUBLE) AS BIGINT) AS rank_r
            FROM (SELECT event_type, sum(cnt)::BIGINT AS n,
                         count(*)::BIGINT AS n_cells
                  FROM cells GROUP BY 1),
                 (SELECT unnest($pList) AS p))
          SELECT g.event_type, g.p, g.rank_r,
                 ${sketchMidSql("c.cell", "200.0")} AS est_value,
                 g.n_cells
          FROM grid g JOIN cum c
            ON g.event_type = c.event_type AND c.cum >= g.rank_r
            AND c.cum - c.cnt < g.rank_r"""
    },
    "q252_stream_drift_alert" -> {
      import graft.queries.StatQueries.{sketchWSql, sketchCellSql,
        sketchMidSql, DriftGrid}
      val pList = DriftGrid.map(p => s"$p::DOUBLE").mkString("[", ", ", "]")
      s"""WITH xi AS (
            SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS k,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
            FROM events),
          cells AS (
            SELECT k, ${sketchCellSql("x", "w")} AS cell,
                   count(*)::BIGINT AS cnt
            FROM (SELECT k, x, ${sketchWSql("x")} AS w FROM xi)
            GROUP BY 1, 2),
          allr AS (
            SELECT k, cell, cnt FROM cells
            UNION ALL
            SELECT '__ref__' AS k, cell, sum(cnt)::BIGINT AS cnt
            FROM cells GROUP BY 2),
          cum AS (
            SELECT k, cell, cnt,
                   sum(cnt) OVER (PARTITION BY k ORDER BY cell) AS cum
            FROM allr),
          grid AS (
            SELECT k, n, p, CAST(ceil(p * n::DOUBLE) AS BIGINT) AS r
            FROM (SELECT k, sum(cnt)::BIGINT AS n FROM allr GROUP BY 1),
                 (SELECT unnest($pList) AS p)),
          ests AS (
            SELECT g.k, g.p, ${sketchMidSql("c.cell", "200.0")} AS est
            FROM grid g JOIN cum c
              ON g.k = c.k AND c.cum >= g.r AND c.cum - c.cnt < g.r),
          gaps AS (
            SELECT d.k, d.p, d.est AS est_day, r.est AS est_ref,
                   abs(d.est - r.est) AS gap
            FROM ests d JOIN ests r ON r.k = '__ref__' AND d.p = r.p
            WHERE d.k <> '__ref__')
          SELECT k AS day, p, est_day, est_ref, gap,
                 max(gap) OVER (PARTITION BY k) AS max_gap,
                 (max(gap) OVER (PARTITION BY k) >
                  ${graft.streaming.EventsStream.DriftAlertGap}) AS alert
          FROM gaps"""
    },
    "q181_stream_left_join" ->
      """SELECT c.user_id AS user_id,
                c.event_id AS click_id,
                p.event_id AS purchase_id,
                epoch_ns(p.ts) // 1000000000 - epoch_ns(c.ts) // 1000000000 AS lag_s
         FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
         LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR""",
    // session_window parity: a new session starts when the gap is >= 4 h
    // (streaming session windows [t, t+gap) merge only on strict overlap)
    "q67_stream_sessions" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN pts IS NULL
                         OR epoch_ns(ts) - epoch_ns(pts) >= 14400000000000
                       THEN 1 ELSE 0 END AS is_new
           FROM (SELECT user_id, event_id, ts,
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS pts
                 FROM events)),
         sess AS (
           SELECT user_id, ts,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM flagged)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                min(epoch_ns(ts) // 1000000000) AS start_s,
                max(epoch_ns(ts) // 1000000000) AS end_s
         FROM sess GROUP BY user_id, sid""",
    "q83_media_frames" ->
      // the Spark side checksums PIXELS DECODED from a real GIF round
      // trip; the oracle reproduces them from the synthetic frames'
      // closed form (frame f, pixel p of media m = (m*131+f*31+p*7)%256)
      // — agreement proves the codec walk was lossless and in order
      """SELECT media_id, n_frames, frame_idx,
                list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 64),
                  p -> ((media_id*131 + frame_idx*31 + p*7) % 256)::BIGINT)),
                  (a, b) -> (a*31 + b) % 1000003) AS checksum
         FROM (
           SELECT media_id, n_frames, unnest(range(0, n_frames, 2)) AS frame_idx
           FROM (
             SELECT doc_id AS media_id, length(text) // 16 AS n_frames
             FROM documents
             WHERE doc_id % 3 = 2 AND length(text) >= 16))""",
    "q42_media_meta" -> {
      val h = charFoldSql("text")
      s"""SELECT doc_id AS media_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
                 octet_length(encode(text))::BIGINT AS n_bytes,
                 (64 + h % 577)::BIGINT AS width,
                 (64 + (h * 7) % 419)::BIGINT AS height,
                 h AS checksum
          FROM (SELECT doc_id, text, $h AS h FROM documents)"""
    },
    "q43_asset_pick_map" ->
      """SELECT o_orderkey,
                'href_' || o_orderkey || '_r' AS red_href,
                'href_' || o_orderkey || '_n' AS nir_href
         FROM orders WHERE o_orderkey % 4 <> 3""",
    // Post-decode pHash math over the decoded-pixel stage the Spark side
    // writes (Multimodal.writeGrayStage): the SAME 1e-9 integer DCT
    // basis (dctC9 — shared-constant discipline), the same fixed-point
    // passes, the same banded join. Lambda variable names are unique per
    // nesting level (ry/rx/ra/rb…, the NOTES.md collision rule).
    "q186_phash_math" -> {
      val c9 = graft.ext.Multimodal.dctC9
      def cu(u: Int) = c9(u).mkString("[", ", ", "]")
      val stage = graft.ext.Multimodal.lastGrayStagePath
      val rDefs = (0 until 8).map { u =>
        s"""list_transform(range(0, 32), rx ->
           |  list_reduce(list_transform(range(0, 32), ry ->
           |    (${cu(u)})[ry+1] * g4[32*ry + rx + 1]),
           |  (ra, rb) -> ra + rb)) AS r$u""".stripMargin
      }.mkString(",\n")
      val cfExprs = (for (u <- 0 until 8; v <- 0 until 8) yield
        s"""list_reduce(list_transform(range(0, 32), cx ->
           |  (${cu(v)})[cx+1]::HUGEINT * r$u[cx+1]::HUGEINT),
           |(ca, cb) -> ca + cb)""".stripMargin
      ).mkString("[", ",\n", "]")
      val keyExprs = (0 until 4).map { b =>
        s"""list_reduce(list_transform(range(0, 16), kk ->
           |  bt[16*$b + kk + 1] * (1::BIGINT << kk)),
           |(ka, kb) -> ka + kb)""".stripMargin
      }.mkString("[", ",\n", "]")
      s"""WITH g AS (SELECT media_id, g4
                     FROM parquet_scan('$stage/*.parquet')),
          r AS (SELECT media_id, $rDefs FROM g),
          cf AS (SELECT media_id, $cfExprs AS cf FROM r),
          th AS (SELECT media_id, cf,
                        list_reduce(cf, (sa, sb) -> sa + sb) - cf[1] AS s63
                 FROM cf),
          bits AS (SELECT media_id,
                          list_transform(range(0, 64), bi ->
                            CASE WHEN 63 * cf[bi+1] > s63
                                 THEN 1::BIGINT ELSE 0::BIGINT END) AS bt
                   FROM th),
          keys AS (SELECT media_id, $keyExprs AS ks FROM bits),
          banded AS (SELECT media_id, ks, bb.band AS band,
                            ks[bb.band+1] AS key
                     FROM keys, range(0, 4) bb(band)),
          pairs AS (SELECT DISTINCT l.media_id AS a, r2.media_id AS b,
                           (bit_count(xor(l.ks[1], r2.ks[1])) +
                            bit_count(xor(l.ks[2], r2.ks[2])) +
                            bit_count(xor(l.ks[3], r2.ks[3])) +
                            bit_count(xor(l.ks[4], r2.ks[4])))::BIGINT AS dist
                    FROM banded l JOIN banded r2
                      ON l.band = r2.band AND l.key = r2.key
                     AND l.media_id < r2.media_id)
          SELECT a, b, dist FROM pairs WHERE dist <= 3"""
    },
  )
}
