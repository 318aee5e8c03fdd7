package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sink.VersionedTable
import graft.streaming.EventsStream

/** Lakehouse maintenance queries over [[graft.sink.VersionedTable]] — the
  * operations that keep a 100 TB table-format deployment usable: derived
  * tables refreshed from the change feed instead of recomputed.
  *
  * The reference loads results into Postgres tables and refreshes summary
  * rows by re-running the aggregate (`/root/reference/src/load/load_postgres
  * .py` upserts whole-table results); at warehouse scale the equivalent is
  * incremental view maintenance — this family exercises that path against
  * the engine's own commit protocol.
  */
object LakehouseQueries {

  /** Per-user event rollup, the MV shape q160 maintains. Sums are carried
    * as DECIMAL partials (associative exactly — an incremental merge of
    * partials must equal a from-scratch recompute bit-for-bit; double
    * sums would differ in the last bits by addition order). */
  private def mvOf(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Incremental materialized-view refresh from the change data feed:
    // a per-user rollup MV is bootstrapped at table version v1, the base
    // table then takes a copy-on-write MERGE (updates double the value of
    // every event_id % 5 == 0 row; inserts add the event_id % 3 == 0
    // rows), and the MV is refreshed WITHOUT rescanning the base —
    // changesBetween(v1, v2) opens only the file-set difference, each
    // added row contributes (+1, +value) and each removed row (−1,
    // −value), and merging those signed partials into the MV's own
    // DECIMAL partials reproduces the full recompute exactly (SUM/COUNT
    // are abelian-group aggregates — the classic incremental
    // view-maintenance result, Blakeley et al., SIGMOD '86).
    //
    // At 100 TB: refresh cost ∝ (delta files read + MV size), never the
    // base table. A day's merge against a key-local region rewrites a few
    // files; the diff reads exactly those, and the MV — at most one row
    // per user — absorbs the signed partials in one shuffle of
    // delta-sized input. The bootstrap scan of v1 happens once per MV
    // lifetime, not per refresh.
    "q160_incr_mv_refresh" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val work = EventsStream.scratchDir("graft_mv")
      val root = work.resolve("base").toString
      val mvRoot = work.resolve("mv").toString

      // v1: the base table before the day's changes
      val base = ev.filter(col("event_id") % 3 =!= 0)
      val v1 = VersionedTable.create(s, root, base)
      // bootstrap the MV from v1 and commit it as its own versioned table
      VersionedTable.create(s, mvRoot,
        mvOf(VersionedTable.read(s, root, Some(v1))))

      // v2: one copy-on-write MERGE — updates (matched keys replaced with
      // doubled value) + inserts (new keys) in a single commit
      val ups = base.filter(col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
      val ins = ev.filter(col("event_id") % 3 === 0)
      val v2 = VersionedTable.mergeInto(s, root, ups.unionByName(ins),
        Seq("event_id"))

      // refresh: signed partials from the file-set diff only
      val (addedRows, removedRows) = VersionedTable.changesBetween(s, root, v1, v2)
      val plus = addedRows.select(col("user_id"), lit(1L).as("cnt"),
        col("value").cast("decimal(18,2)").as("sv"))
      val minus = removedRows.select(col("user_id"), lit(-1L).as("cnt"),
        (-col("value").cast("decimal(18,2)")).as("sv"))
      val mv = VersionedTable.read(s, mvRoot)
        .select(col("user_id"), col("cnt"), col("sv"))
      val refreshed = mv.unionByName(plus).unionByName(minus)
        .groupBy(col("user_id"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("sv")).as("sv"))
        .filter(col("cnt") > 0)
        .select(col("user_id"), col("cnt").as("n_events"),
          col("sv").cast("decimal(18,2)").as("sv"))
      VersionedTable.overwrite(s, mvRoot,
        refreshed.select(col("user_id"), col("n_events").as("cnt"), col("sv")))

      VersionedTable.read(s, mvRoot)
        .select(col("user_id"), col("cnt").as("n_events"),
          col("sv").cast("double").as("sum_value"))
    }),

    // The versioned table's SQL face end-to-end: orders is committed as a
    // graft-versioned table clustered by o_orderdate (range-partitioned
    // files ⇒ narrow disjoint [lo, hi] manifest stats), registered with
    // CREATE TABLE ... USING, and queried through plain SQL. The pushed
    // o_orderdate range reaches the relation as Catalyst Filters, which
    // the provider converts to the manifest stat domain (timestamps →
    // epoch micros) and prunes: only files overlapping the half-year
    // window are opened; Spark's parquet scan then row-group-prunes
    // within them. At 100 TB the WHERE touches ~1/13 of the files
    // before any footer is read — catalog-level skipping, not scan-level.
    // VersionedSourceSpec asserts the file counts; this query gates the
    // RESULT through the full staged round-trip.
    "q166_versioned_sql" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_vsql")
      val root = work.resolve("orders").toString
      Tables.orders(s, d)
        .repartitionByRange(8, col("o_orderdate"))
        .write.format("graft-versioned").save(root)
      s.sql("DROP TABLE IF EXISTS graft_orders_v")
      s.sql(s"CREATE TABLE graft_orders_v USING `graft-versioned` " +
        s"OPTIONS (path '$root')")
      try s.sql(
        """SELECT o_orderpriority,
                  count(*) AS n_orders,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS total_price
           FROM graft_orders_v
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate <  TIMESTAMP '1996-07-01'
           GROUP BY o_orderpriority""").localCheckpoint()
      finally s.sql("DROP TABLE IF EXISTS graft_orders_v")
    }),

    // The versioned table as a first-class STREAMING source, gated
    // end-to-end: documents commit in three id-striped versions, the
    // commit log is drained through readStream.format("graft-versioned")
    // with maxVersionsPerTrigger=1 (offset = version; three rate-limited
    // micro-batches, not one big first batch), and the accumulated feed
    // must aggregate to exactly the batch table — stream/batch parity of
    // the table feed itself. At 100 TB each micro-batch reads only the
    // files its commit added (manifest diff — carried-over files never
    // open), so following the table costs per-commit delta, never table
    // size; admission control bounds a long backlog to N commits/batch.
    "q175_stream_table_feed" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val work = EventsStream.scratchDir("graft_feed")
      val root = work.resolve("docs").toString
      VersionedTable.create(s, root, docs.filter(col("doc_id") % 3 === 0))
      VersionedTable.append(s, root, docs.filter(col("doc_id") % 3 === 1))
      VersionedTable.append(s, root, docs.filter(col("doc_id") % 3 === 2))
      val sink = work.resolve("sink").toString
      val q = s.readStream.format("graft-versioned")
        .option("maxVersionsPerTrigger", "1").load(root)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(sink)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // The full source->sink loop under one format name: the three-commit
    // documents table is STREAMED (one commit per micro-batch) into a
    // second versioned table through the native streaming sink (each
    // micro-batch a txn-stamped commit), then the stream is re-run on a
    // FRESH checkpoint — every batch re-delivers and the txn ledger
    // refuses them all. The oracle sees the batch table: the round-trip
    // plus the replay must be invisible. At 100 TB this is the
    // incremental-ETL topology: table feeds table with per-commit cost
    // and exactly-once re-delivery, no foreachBatch boilerplate.
    "q184_stream_table_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val work = EventsStream.scratchDir("graft_rt")
      val src = work.resolve("src").toString
      VersionedTable.create(s, src, docs.filter(col("doc_id") % 3 === 0))
      VersionedTable.append(s, src, docs.filter(col("doc_id") % 3 === 1))
      VersionedTable.append(s, src, docs.filter(col("doc_id") % 3 === 2))
      val dst = work.resolve("dst").toString
      def drain(ckpt: String): Unit = {
        val q = s.readStream.format("graft-versioned")
          .option("maxVersionsPerTrigger", "1").load(src)
          .writeStream.format("graft-versioned").option("path", dst)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable() finally q.stop()
      }
      drain(work.resolve("ckpt1").toString)
      drain(work.resolve("ckpt2").toString) // full replay: ledger refuses all
      VersionedTable.read(s, dst)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // Multi-table transaction snapshot — the reference's staged-Postgres
    // atomicity (load_to_postgis.py:370-384) replayed through the
    // TxnCatalog: two derived tables (per-customer and per-month order
    // rollups) advance together through txn 1 (cut 1995) and txn 2
    // (cut 1997); then a stage-3 writer updates the per-customer table
    // AT THE TABLE LEVEL with the unfiltered corpus and "crashes" before
    // its catalog claim. The result reads the catalog snapshot — if the
    // torn write leaked, the by_cust line would carry full-corpus sums
    // while by_month still carries cut-1997 sums and the cross-table
    // invariant (equal order counts and totals from both tables) breaks
    // the oracle hash. At 100 TB the catalog claim is one small file
    // CAS; atomicity never touches data. Both output lines' totals are
    // DECIMAL partial sums (order-independent, exact).
    "q187_txn_snapshot" -> ((s, d) => {
      import graft.sink.TxnCatalog
      val dir = EventsStream.scratchDir("graft_txn_q187").toString
      val cat = s"$dir/_catalog"
      def stage(cut: String) = {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        Seq(
          "by_cust" -> o.groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("total")),
          "by_month" -> o.groupBy(date_trunc("month", col("o_orderdate"))
              .cast("date").as("month"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("rev")))
      }
      TxnCatalog.commitTables(s, cat, stage("1995-01-01"), n => s"$dir/$n")
      TxnCatalog.commitTables(s, cat, stage("1997-01-01"), n => s"$dir/$n")
      // the crash: stage 3 commits by_cust only, dies before the claim
      VersionedTable.overwrite(s, s"$dir/by_cust",
        Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total")))
      val a = TxnCatalog.read(s, cat, "by_cust")
      val b = TxnCatalog.read(s, cat, "by_month")
      a.agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_orders"),
          sum(col("total")).cast("double").as("total"))
        .select(lit("by_cust").as("src"), col("n_groups"), col("n_orders"),
          col("total"))
        .unionByName(
          b.agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_orders"),
              sum(col("rev")).cast("double").as("total"))
            .select(lit("by_month").as("src"), col("n_groups"),
              col("n_orders"), col("total")))
    }),

    // The transaction SQL FACE: q187's consistent-snapshot relation,
    // but read entirely through spark.sql over TxnCatalog.registerViews
    // — every table of the txn registered as a version-pinned temp view,
    // the `AT TXN n` time-travel UX with no custom parser. Same staged
    // crash as q187 (a table-level overwrite with the unfiltered corpus
    // lands AFTER txn 2 and before any claim): the views must serve the
    // txn's pins, not the tables' heads, or the cross-table invariant
    // in the output breaks the oracle hash.
    "q190_txn_sql_face" -> ((s, d) => {
      import graft.sink.TxnCatalog
      val dir = EventsStream.scratchDir("graft_txn_q190").toString
      val cat = s"$dir/_catalog"
      def stage(cut: String) = {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        Seq(
          "by_cust" -> o.groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("total")),
          "by_month" -> o.groupBy(date_trunc("month", col("o_orderdate"))
              .cast("date").as("month"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("rev")))
      }
      TxnCatalog.commitTables(s, cat, stage("1995-01-01"), n => s"$dir/$n")
      TxnCatalog.commitTables(s, cat, stage("1997-01-01"), n => s"$dir/$n")
      VersionedTable.overwrite(s, s"$dir/by_cust",
        Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total")))
      TxnCatalog.registerViews(s, cat, prefix = "q190")
      s.sql(
        """SELECT 'by_cust' AS src, CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(sum(n) AS BIGINT) AS n_orders,
                  CAST(sum(total) AS DOUBLE) AS total
           FROM q190_by_cust
           UNION ALL
           SELECT 'by_month' AS src, CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(sum(n) AS BIGINT) AS n_orders,
                  CAST(sum(rev) AS DOUBLE) AS total
           FROM q190_by_month""")
    }),

    // The multi-table transaction face from PURE SQL (CALL
    // graft.txn_apply / txn_snapshot): two derived tables staged from
    // temp views and published atomically, twice; the snapshot views
    // then read the newest consistent pair AND time-travel to txn 1's —
    // q190's K9 stage-ordering story with zero Scala in the driver
    // seat, the way a scheduler or BI tool would run it. The oracle
    // recomputes all four rollups from raw orders at both cuts.
    // CHECK constraints end to end: ADD validates the existing snapshot,
    // a conforming append lands, a violating batch is REFUSED atomically
    // (nothing commits, staged files swept — the 'refused' row proves
    // the gate fired: had the batch landed, head's count AND sum both
    // diverge from the oracle), DROP lifts the contract and the same
    // batch lands. At 100 TB this is schema-on-write data quality as a
    // table property — the writer-side gate that keeps a million-file
    // table free of the rows a downstream join would silently mangle.
    "q209_constraints" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ck_q209")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root,
        ev.filter(col("event_id") % 3 === 0).repartition(4))          // v1
      // the SQL DDL face (GraftSqlParser): real ALTER TABLE, same
      // committed contract as CALL graft.add_constraint
      s.sql(s"ALTER TABLE '$root' ADD CONSTRAINT val_cap " +
        "CHECK (value <= 1000000.0)")                                 // v2
      VersionedTable.append(s, root,
        ev.filter(col("event_id") % 3 === 1).repartition(2))          // v3
      val hot = ev.filter(col("event_id") % 3 === 2)
        .withColumn("value", col("value") + lit(2000000.0))
      val refused =
        try { VersionedTable.append(s, root, hot.repartition(2)); 0L }
        catch { case _: IllegalArgumentException => 1L }
      s.sql(s"CALL graft.drop_constraint('$root', 'val_cap')")        // v4
      VersionedTable.append(s, root, hot.repartition(2))              // v5
      import s.implicits._
      VersionedTable.read(s, root)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(lit("head").as("tag"), col("n"), col("sum_value"))
        .unionByName(Seq((refused,
            VersionedTable.constraintsOf(s, root).size.toLong))
          .toDF("n", "sum0")
          .select(lit("refused").as("tag"), col("n"),
            col("sum0").cast("double").as("sum_value")))
    }),

    // Column DEFAULT values end to end (the Iceberg-v3 initial+write
    // default recipe, metadata-only): `CALL graft.add_column` with a
    // DEFAULT makes every pre-existing row read 'backfill' instead of
    // NULL — no file rewritten, the manifest records which files
    // predate the column and the scan substitutes the literal for
    // exactly those — while the appended half carries an explicit
    // 'live'. The vectored DELETE then keys on the DEFAULTED column
    // (source = 'backfill' AND returnflag 'R'): it can only hit the
    // right rows if the DML pass substitutes too. The grouped rollup
    // seals both halves. At 100 TB, backfilling a provenance column on
    // a million-file corpus is one JSON commit instead of a rewrite.
    "q212_default_values" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dflt_q212")
      val root = work.resolve("li").toString
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity"), col("l_returnflag"))
      VersionedTable.create(s, root,
        li.filter(col("l_orderkey") % 2 === 0).repartition(4))        // v1
      s.sql(s"CALL graft.add_column('$root', 'source', 'STRING', " +
        "'''backfill''')")                                            // v2
      VersionedTable.append(s, root,
        li.filter(col("l_orderkey") % 2 === 1)
          .withColumn("source", lit("live")).repartition(2))          // v3
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("source") === "backfill" && col("l_returnflag") === "R")  // v4
      VersionedTable.read(s, root)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"))
    }),

    // MERGE with SCHEMA EVOLUTION end to end (the Delta
    // withSchemaEvolution recipe): the table starts WITHOUT
    // o_orderpriority; a CDC-style source re-prices every third order
    // and carries the new column. The evolve-merge adds the column
    // (metadata-only), updates matched rows (merge-on-read — matched
    // rows vectored away, source lands as new files), PRESERVES
    // nothing here (source carries every old column) and leaves
    // untouched rows reading NULL in the evolved column. The rollup
    // groups by the evolved column's presence: the merge's three row
    // classes (untouched, updated, none inserted) must reconstruct
    // exactly. At 100 TB: absorbing an upstream schema change is one
    // metadata commit + a delta-sized write, not a migration.
    "q215_merge_evolve" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_mev_q215")
      val root = work.resolve("ord").toString
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
      VersionedTable.create(s, root, o.repartition(4))                // v1
      val src = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderpriority"))
      VersionedTable.mergeIntoEvolve(s, root, src, Seq("o_orderkey"),
        vectored = true)                                              // +cols, merge
      VersionedTable.read(s, root)
        .groupBy(coalesce(col("o_orderpriority"), lit("none")).as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
    }),

    // TYPE WIDENING end to end (the Iceberg-v3 type-promotion recipe,
    // metadata-only): the table is created with INT quantities, `CALL
    // graft.alter_column_type` widens the column to BIGINT without
    // touching a file, the appended half lands as int64 — so the scan
    // upcasts int32 files NEXT TO native int64 files under one schema —
    // and the vectored DELETE keys on the widened column across both
    // physical layouts. The rollup seals it: values exact, stats (and
    // so the DML's file-pruning) still live in the shared long domain.
    // At 100 TB, un-breaking an overflowing INT key is one JSON commit
    // instead of a petabyte rewrite.
    "q214_type_widening" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_widen_q214")
      val root = work.resolve("li").toString
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast("int").as("qty"), col("l_returnflag"))
      VersionedTable.create(s, root,
        li.filter(col("l_orderkey") % 2 === 0).repartition(4))        // v1 int
      s.sql(s"CALL graft.alter_column_type('$root', 'qty', 'BIGINT')") // v2
      VersionedTable.append(s, root,
        li.filter(col("l_orderkey") % 2 === 1)
          .withColumn("qty", col("qty").cast("bigint"))
          .repartition(2))                                            // v3 long
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("qty") >= 45L)                                            // v4
      VersionedTable.read(s, root)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
    }),

    // PARTITION TRANSFORMS end to end (the Iceberg partition-transform
    // recipe): identity-partitioning a timestamp is useless (one dir
    // per microsecond), so the layout evolves to days(ts) + bucket(8,
    // user_id) — synthetic `_p_…` directories whose SOURCE columns
    // stay in the data files with footer stats intact. The 'range'
    // face reads a 3-day window through stats pruning (day-clustered
    // files make the window prune to ~3/N of the data); the 'point'
    // face fetches one user through bucket pruning (the driver hashes
    // the probe with the same xxhash64 the writer used and opens ~1/8
    // of the bucketed files). Both faces still apply the exact filter
    // — pruning is coarse, never wrong. At 100 TB this is the
    // difference between a point lookup scanning 12.5% vs 100% of a
    // million files, with zero index maintenance.
    "q213_partition_transforms" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_pxform_q213")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root,
        ev.filter(col("event_id") % 2 === 0).repartition(4))          // v1 flat
      s.sql(s"CALL graft.set_partition_layout('$root', " +
        "'days(ts), bucket(4, user_id)')")                            // v2
      // align the pre-write shuffle with the LAYOUT's own directory
      // expressions: each (day, bucket) cell lands in one task, so the
      // hive write emits ~one file per cell instead of (tasks x cells)
      // small files — the at-scale discipline for transform layouts
      // (footer-metadata cost is per file; this is the 9s -> ~3s fix)
      val cells = Seq("days(ts)", "bucket(4, user_id)").map(e =>
        graft.sink.Layout.writeExpr(graft.sink.Layout.parse(e),
          ev.schema))
      VersionedTable.append(s, root,
        ev.filter(col("event_id") % 2 === 1)
          .repartition(cells: _*))                                    // v3
      // window bounds: day-truncated min(ts) + [2 days, 5 days) — a
      // 1-row driver scalar, then micros (the RangePreds stat domain)
      val t0 = VersionedTable.read(s, root)
        .agg(date_trunc("day", min(col("ts")))).first().getTimestamp(0)
      val dayU = 86400L * 1000000L
      val lo = t0.getTime * 1000L + 2 * dayU
      val hi = t0.getTime * 1000L + 5 * dayU
      val range = VersionedTable.readWhere(s, root,
          Map("ts" -> (Some(lo), Some(hi - 1))))
        .filter(unix_micros(col("ts")).between(lo, hi - 1))
        .groupBy(col("event_type").as("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(lit("range").as("face"), col("k"), col("n"),
          col("sum_value"))
      val point = VersionedTable.readBucketEq(s, root, "user_id", 7L)
        .filter(col("user_id") === 7L)
        .groupBy(col("user_id").cast("string").as("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .select(lit("point").as("face"), col("k"), col("n"),
          col("sum_value"))
      range.unionByName(point)
    }),

    // PARTITION EVOLUTION end to end: the table starts unpartitioned,
    // `CALL graft.set_partition_layout` re-clusters FUTURE writes by
    // event_type as a metadata-only commit, the second half lands under
    // the new hive layout, and a merge-on-read delete then spans BOTH
    // layouts (vectors attach per file regardless of where its
    // partition values live — data pages or directory names). The
    // grouped rollup reads the mixed snapshot; any mis-resolved
    // partition value or mis-applied vector shifts a group off the
    // oracle. At 100 TB this is re-clustering for a new query pattern
    // with one JSON commit: old files keep pruning on their footer
    // stats, new files on their degenerate dir stats, and compaction
    // migrates stragglers gradually instead of a multi-day rewrite.
    "q211_partition_evolution" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_pevo_q211")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root,
        ev.filter(col("event_id") % 2 === 0).repartition(4))        // v1 flat
      s.sql(s"CALL graft.set_partition_layout('$root', 'event_type')") // v2
      VersionedTable.append(s, root,
        ev.filter(col("event_id") % 2 === 1).repartition(2))        // v3 hive
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("value") < lit(10.0))                                   // v4 DVs
      VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // Named refs + write-audit-publish end to end, all through the SQL
    // face: a tag pins the training snapshot (v1), a branch stages the
    // next delivery AWAY from readers — the branch carries the table's
    // CHECK constraint, so the audit gate fires THERE (the violating
    // 1997 batch is refused on the branch; main never sees a byte of
    // it) — and the publish is ONE metadata-only fast-forward commit
    // adopting the branch head by reference. Then the hostile cleanup:
    // drop_branch (published files must survive under the marker
    // protocol) and expire keep_last=1 (the tag must pin v1's manifest
    // AND files). The result reads head (through branch-owned files —
    // proves the drop swept nothing main references) and the tag
    // (proves retention honored the pin); 'audit' carries main's
    // row count DURING staging plus refused+live-constraint counts.
    // At 100 TB: branch, tag, publish, drop are all O(1) metadata —
    // the delivery pipeline revalidates and publishes without touching
    // or copying a single data file.
    "q210_wap" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_wap_q210")
      val root = work.resolve("ord").toString
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      VersionedTable.create(s, root,
        o.filter(year(col("o_orderdate")) <= 1995).repartition(4))  // v1
      s.sql(s"CALL graft.create_tag('$root', 'train-v1')")
      s.sql(s"CALL graft.add_constraint('$root', 'price_pos', " +
        "'o_totalprice > 0.0')")                                    // v2
      s.sql(s"CALL graft.create_branch('$root', 'wap')")
      val bRoot = VersionedTable.branchRoot(root, "wap")
      VersionedTable.append(s, bRoot,
        o.filter(year(col("o_orderdate")) === 1996).repartition(2)) // stage
      val refused =                                                 // audit
        try {
          VersionedTable.append(s, bRoot,
            o.filter(year(col("o_orderdate")) === 1997)
              .withColumn("o_totalprice", -col("o_totalprice"))
              .repartition(2))
          0L
        } catch { case _: IllegalArgumentException => 1L }
      val mainPre = VersionedTable.read(s, root).count()
      s.sql(s"CALL graft.fast_forward('$root', 'wap')")             // v3
      s.sql(s"CALL graft.drop_branch('$root', 'wap')")
      s.sql(s"CALL graft.expire('$root', 1, 0)")
      val nChecks = VersionedTable.constraintsOf(s, root).size.toLong
      def snap(df: DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
          .select(lit(tag).as("tag"), col("n"), col("sum_price"))
      import s.implicits._
      snap(VersionedTable.read(s, root), "head")
        .unionByName(snap(
          VersionedTable.readTag(s, root, "train-v1"), "tag_train_v1"))
        .unionByName(Seq((mainPre, (refused + nChecks).toDouble))
          .toDF("n", "sum_price")
          .select(lit("audit").as("tag"), col("n"), col("sum_price")))
    }),

    // REPLACE WHERE: the partition-aligned reload. The table is hive-
    // partitioned by order year, so every 1996 file is PROVABLY inside
    // the replaced region from its partition stats alone — the require
    // pins the metadata-only path: the reload drops those files UNREAD
    // and lands only the recomputed slice. At 100 TB: "recompute
    // yesterday" costs new-files + manifest arithmetic, zero old bytes
    // moved, one atomic commit (readers never see the slice missing).
    "q216_replace_where" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_rpw_q216")
      val root = work.resolve("ord").toString
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), year(col("o_orderdate")).as("yr"))
      VersionedTable.create(s, root, o.repartition(4), partitionBy = Seq("yr"))
      val preds: VersionedTable.RangePreds =
        Map("yr" -> (Some(1996), Some(1996)))
      require(VersionedTable.replaceContainedFiles(s, root, preds).nonEmpty,
        "q216: the 1996 partition files must drop unread (metadata-only)")
      // the recomputed slice: even keys only, price doubled
      VersionedTable.replaceWhere(s, root,
        o.filter(col("yr") === 1996 && col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .repartition(2),
        preds)
      VersionedTable.read(s, root).groupBy(col("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    }),

    // IDENTITY column: surrogate keys assigned shuffle-free from the
    // manifest high-water mark. The output proves the contract with
    // data-derivable aggregates (counts, uniqueness, the >= start
    // bound) because the values themselves are deliberately sparse —
    // uniqueness without density is what keeps assignment
    // embarrassingly parallel at 100 TB (no row_number barrier).
    "q217_identity" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_idc_q217")
      val root = work.resolve("docs").toString
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      VersionedTable.create(s, root,
        docs.filter(col("doc_id") % 3 === 0).repartition(2))
      VersionedTable.addIdentityColumn(s, root, "rid", start = 1000L)
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") % 3 =!= 0).repartition(4))
      VersionedTable.read(s, root).agg(
        count(lit(1)).as("n"),
        count(col("rid")).as("n_assigned"),
        countDistinct(col("rid")).as("n_distinct"),
        min(when(col("rid").isNotNull,
          (col("rid") >= 1000L).cast("int"))).as("all_ge_start"))
    }),

    // GENERATED ALWAYS AS (expr): the derived column is metadata at add
    // time (historical files compute it at read), materialized by
    // writes, and validated null-safe on every staged file. The final
    // aggregate groups by the generated column across both populations.
    "q218_generated" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_gen_q218")
      val root = work.resolve("ord").toString
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate"))
      VersionedTable.create(s, root,
        o.filter(col("o_orderkey") % 2 === 0).repartition(3))
      VersionedTable.addGeneratedColumn(s, root, "yr", "int",
        "year(o_orderdate)")
      // the append does NOT supply yr — computed at write; the old
      // files compute it at read
      VersionedTable.append(s, root,
        o.filter(col("o_orderkey") % 2 === 1).repartition(2))
      VersionedTable.read(s, root).groupBy(col("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    }),

    // APPLY CHANGES: the stateful CDC fold. The changelog lands in TWO
    // out-of-order calls (even sequences first, then odd — so half the
    // keys see their newest row arrive BEFORE older ones), then a
    // deletes-only batch. The persisted sequence column is what q97's
    // pure-query fold cannot have: cross-batch regression protection.
    // At 100 TB: an out-of-order partitioned CDC feed folds in at
    // delta cost — stale-guard join reads only the key-pruned slice.
    "q219_apply_changes" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_cdc_q219")
      val root = work.resolve("cust").toString
      VersionedTable.create(s, root,
        Tables.customer(s, d).select(col("c_custkey").as("k"),
          // `when` without otherwise (non-foldable condition) is
          // NULLABLE — the table's seq must accept the merge source
          when(col("c_custkey").isNotNull, lit(0L)).as("seq"),
          col("c_acctbal").cast("double").as("bal"))
          .repartition(4))
      val chg = Tables.orders(s, d).select(col("o_custkey").as("k"),
        col("o_orderkey").as("seq"), col("o_totalprice").as("bal"))
      // out-of-order delivery: even seqs, then odd
      VersionedTable.applyChanges(s, root,
        chg.filter(col("seq") % 2 === 0), Seq("k"), "seq")
      VersionedTable.applyChanges(s, root,
        chg.filter(col("seq") % 2 === 1), Seq("k"), "seq")
      // late deletes with a sequence beyond every order — derived from
      // the data (a 1-row driver scalar), never a magic constant a
      // larger scale factor could outgrow
      val maxSeq = Tables.orders(s, d)
        .agg(max(col("o_orderkey"))).head.getLong(0)
      VersionedTable.applyChanges(s, root,
        Tables.customer(s, d).filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("k"),
            (lit(maxSeq) + col("c_custkey")).as("seq"),
            lit(0.0).as("bal"), lit(true).as("del")),
        Seq("k"), "seq", deleteCol = Some("del"))
      VersionedTable.read(s, root).groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double").as("sum_bal"),
          sum(col("seq")).as("sum_seq"))
    }),

    // The CDC REPLICATION pipeline end to end: a source table's change
    // feed streams version-by-version into foreachBatch, each batch
    // collapses update pairs (delete+insert at one commit version) to
    // their net effect and folds into the TARGET via applyChanges —
    // sequence = the CDF commit version, txn = the batch id, so the
    // pipeline is exactly-once under checkpoint loss AND regression-safe
    // under out-of-order redelivery. The target converges to the
    // source's final live state. At 100 TB: replication cost is
    // delta-sized per version (CDF admission) and the apply's
    // stale-guard reads only the key-pruned slice of the target.
    "q220_cdc_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      val work = EventsStream.scratchDir("graft_cdcp_q220")
      val src = work.resolve("src").toString
      val dst = work.resolve("dst").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, src, ev.filter(col("event_id") % 3 =!= 0)
        .repartitionByRange(2, col("event_id")))                       // v1
      VersionedTable.append(s, src, ev.filter(col("event_id") % 3 === 0)) // v2
      VersionedTable.mergeInto(s, src,
        ev.filter(col("event_id") % 5 === 0)
          .withColumn("value", col("value") * 2), Seq("event_id"))     // v3
      VersionedTable.deleteWhereVectored(s, src, Map.empty,
        col("event_id") % 7 === 0)                                     // v4
      // target: source schema + the persisted sequence column
      VersionedTable.create(s, dst,
        ev.limit(0).withColumn("seq",
          when(col("event_id").isNotNull, lit(0L))))
      // two versions per batch: still multi-batch (txn idempotence is
      // exercised) at half the micro-batch machinery cost; a netted
      // span carries its head version, which the seq-guard orders
      // correctly (q219 owns the fine-grained out-of-order semantics)
      val q = s.readStream.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "2").load(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val collapsed = batch
            .withColumn("__ins",
              (col("_change_type") === "insert").cast("int"))
            .withColumn("__rn", row_number().over(
              Window.partitionBy(col("event_id"))
                .orderBy(col("_commit_version").desc, col("__ins").desc)))
            .filter(col("__rn") === 1)
            .select(col("event_id"), col("user_id"), col("value"),
              col("_commit_version").cast("long").as("seq"),
              (col("__ins") === 0).as("del"))
          VersionedTable.applyChanges(s, dst, collapsed, Seq("event_id"),
            "seq", deleteCol = Some("del"), txn = Some(1000000L + id))
          ()
        }
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      VersionedTable.read(s, dst).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    }),

    // SET NOT NULL: the tighten is PROVEN from recorded per-file null
    // counts (zero-scan — the created files' footers say nulls=0), the
    // schema-on-write gate then refuses a DECLARED-nullable append
    // outright (before any values are read — the contract that makes
    // NOT NULL trustworthy at 100 TB), and a coalesce-asserted
    // non-nullable frame lands. 'refused' audits that the gate fired:
    // a leak would also shift n and sum off the oracle.
    "q221_not_null" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_nn_q221")
      val root = work.resolve("ord").toString
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      VersionedTable.create(s, root,
        o.filter(col("o_orderkey") % 2 === 0).repartition(3))
      s.sql(s"CALL graft.alter_column_nullability('$root', 'o_totalprice', " +
        "false)")
      val refused =
        try {
          VersionedTable.append(s, root,
            o.filter(col("o_orderkey") % 2 === 1)) // declared nullable
          0L
        } catch { case _: IllegalArgumentException => 1L }
      VersionedTable.append(s, root,
        o.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_totalprice",
            coalesce(col("o_totalprice"), lit(0.0)))) // asserted non-null
      VersionedTable.read(s, root)
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .select(col("n"), col("sum_price"), lit(refused).as("refused"))
    }),

    // BATCH table_changes: the whole history as per-version row deltas
    // with EXACT _commit_version stamps — v1 the snapshot-as-inserts,
    // v2 an append, v3 a CoW merge (its update pairs net to remove-old
    // + insert-new at ONE version), v4 a vectored delete (removed rows
    // carry their pre-delete values). Cost = sum of per-version deltas.
    "q222_table_changes" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_tc_q222")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, root, ev.filter(col("event_id") % 2 === 0)
        .repartitionByRange(2, col("event_id")))                      // v1
      VersionedTable.append(s, root, ev.filter(col("event_id") % 2 === 1)) // v2
      VersionedTable.mergeInto(s, root,
        ev.filter(col("event_id") % 5 === 0)
          .withColumn("value", col("value") * 2), Seq("event_id"))    // v3
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 7 === 0)                                    // v4
      s.read.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load(root)
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    }),

    // STABLE ROW IDS (Delta row tracking / Iceberg v3 row lineage): the
    // engine-owned _row_id is enabled on an EXISTING table (metadata add
    // + one backfill rewrite), then the table takes a CoW update (ids
    // must travel with the rewritten rows), a merge WITHOUT the column
    // (matched keys preserve their ids via the key-pruned lookup join;
    // inserts get fresh band-assigned ones) and a compact (full
    // rewrite). The aggregate proves the contract against the v1
    // snapshot via time travel: every original key's id is UNCHANGED
    // through all three rewrites, every inserted key's id is new, and
    // the id set stays unique. At 100 TB this is what lets a CDF
    // consumer pair an update's delete/insert images — identity without
    // a natural key, surviving arbitrary file rewrites.
    "q223_row_tracking" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_rowtrack_q223")
      val root = work.resolve("cust").toString
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_acctbal").cast("double").as("bal"))
      VersionedTable.create(s, root, c.repartition(3))
      VersionedTable.enableRowTracking(s, root)
      val v1 = VersionedTable.currentVersion(s, root).get
      VersionedTable.updateWhereVectored(s, root, Map.empty,
        col("k") % 5 === 0, Map("bal" -> (col("bal") + lit(100.0))))
      // merge source deliberately LACKS _row_id: matched keys (k%7==0)
      // must come back with their old ids, shifted keys are inserts
      val src = c.filter(col("k") % 7 === 0)
        .select(col("k"), (col("bal") * 2).as("bal"))
        .unionByName(c.filter(col("k") % 13 === 0)
          .select((col("k") + 10000000L).as("k"), col("bal")))
      VersionedTable.mergeIntoVectored(s, root, src, Seq("k"))
      VersionedTable.compact(s, root, targetBytes = 1L << 30)
      val base = VersionedTable.read(s, root, Some(v1))
        .select(col("k"), col(VersionedTable.RowIdCol).as("id0"))
      val fin = VersionedTable.read(s, root)
        .select(col("k"), col(VersionedTable.RowIdCol).as("id1"))
      fin.join(base, Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("id0") === col("id1"), 1)).as("n_stable"),
          count(when(col("id0").isNull, 1)).as("n_fresh"),
          countDistinct(col("id1")).as("n_distinct"))
    }),

    // VACUUM with a DRY RUN face: retention planned from manifests +
    // one listing, deleting NOTHING — the report then provably equals
    // what the real sweep removes (same retentionPlan, by construction
    // AND by this oracle: v1 stays time-travel-readable after the dry
    // run, and the file/manifest counts match the committed history
    // shape exactly). At 100 TB an operator sizes a GC from the report
    // (counts + bytes) before any byte moves — the Delta VACUUM DRY RUN
    // workflow over graft's pinned-retention rules (txn/tag/clone
    // protection shared with expire, never re-implemented).
    "q224_vacuum" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_vac_q224")
      val root = work.resolve("t").toString
      val n = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("k"),
          col("n_name").as("name"))
      VersionedTable.create(s, root, n.coalesce(1))                  // v1
      VersionedTable.overwrite(s, root, Tables.region(s, d)
        .select(col("r_regionkey").cast("long").as("k"),
          col("r_name").as("name"))
        .coalesce(1))                                                // v2
      VersionedTable.append(s, root,
        n.filter(col("k") % 5 === 0)
          .select((col("k") + 100L).as("k"), col("name"))
          .coalesce(1))                                              // v3
      val rep = s.sql(s"CALL graft.vacuum('$root', 1, true, 0)")
        .select(col("kind"), col("bytes")).collect()
      // dry run deleted NOTHING: v1 still time-travels
      val v1Rows = VersionedTable.read(s, root, Some(1)).count()
      VersionedTable.vacuum(s, root, keepLast = 1, dryRun = false)
      import s.implicits._
      Seq((rep.count(_.getString(0) == "manifest").toLong,
        rep.count(_.getString(0) == "data").toLong,
        rep.forall(_.getLong(1) > 0L),
        v1Rows,
        VersionedTable.read(s, root).count()))
        .toDF("n_manifests", "n_data", "bytes_positive", "v1_rows",
          "rows_after")
    }),

    // The SQL DDL face end to end (GraftSqlParser): five ALTER forms +
    // OPTIMIZE run as REAL SQL statements over a quoted-path graft
    // table — each executing the same committed DDL as its CALL
    // procedure — and the final aggregate is fully DuckDB-predictable:
    // the defaulted column substitutes for pre-existing rows, the
    // generated column computes at read over history, the constraint
    // refuses the violating append (counted), the rename re-keys, and
    // the compacted layout changes no answer.
    "q225_sql_ddl" -> ((s, d) => {
      import s.implicits._
      val work = EventsStream.scratchDir("graft_sqlddl_q225")
      val root = work.resolve("sup").toString
      val sup = Tables.supplier(s, d).select(col("s_suppkey").as("k"),
        col("s_acctbal").cast("double").as("bal"))
      VersionedTable.create(s, root, sup.repartition(2))
      s.sql(s"ALTER TABLE '$root' ADD COLUMN tier STRING DEFAULT 'std'")
      s.sql(s"ALTER TABLE '$root' ADD COLUMN bal2 DOUBLE " +
        "GENERATED ALWAYS AS (bal * 2)")
      s.sql(s"ALTER TABLE '$root' ADD CONSTRAINT bal_cap " +
        "CHECK (bal < 1e9)")
      val refused =
        try {
          VersionedTable.append(s, root, Seq((0L, 2e9, "x", 4e9))
            .toDF("k", "bal", "tier", "bal2").coalesce(1)); 0L
        } catch { case _: IllegalArgumentException => 1L }
      s.sql(s"ALTER TABLE '$root' RENAME COLUMN tier TO grade")
      s.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('owner' = 'etl')")
      s.sql(s"OPTIMIZE '$root'")
      VersionedTable.read(s, root).groupBy(col("grade"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal2").cast("decimal(18,2)")).cast("double")
            .as("sum_bal2"))
        .select(col("grade"), col("n"), col("sum_bal2"),
          lit(refused).as("refused"))
    }),

    // METADATA-ONLY histogram (the zone-map equi-width construction):
    // three range-disjoint files (thresholds derived from the data, so
    // every SF produces non-empty files), then CALL-equivalent
    // histogramOf spreads each file's rows uniformly over its recorded
    // [lo, hi] into 8 global buckets — zero data scanned. The oracle
    // replays the identical spread formula from the same three ranges,
    // so the hash proves the implementation, not just the shape. This
    // is the CBO input q172's sketch estimate complements: selectivity
    // of a range predicate ≈ its buckets' mass, exact under the
    // range-clustered layouts compact(clusterBy)/zorder produce.
    "q226_histogram" -> ((s, d) => {
      import s.implicits._
      val work = EventsStream.scratchDir("graft_hist_q226")
      val root = work.resolve("cust").toString
      val c = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("k"),
          col("c_acctbal").cast("double").as("bal"))
      val mk = c.agg(max(col("k"))).head.getLong(0)
      val (t1, t2) = (mk / 5, mk / 2)
      VersionedTable.create(s, root,
        c.filter(col("k") <= t1).coalesce(1))
      VersionedTable.append(s, root,
        c.filter(col("k") > t1 && col("k") <= t2).coalesce(1))
      VersionedTable.append(s, root,
        c.filter(col("k") > t2).coalesce(1))
      VersionedTable.histogramOf(s, root, "k", 8)
        .toDF("bucket", "lo", "hi", "est_rows")
        .select(col("bucket"), round(col("lo"), 6).as("lo"),
          round(col("hi"), 6).as("hi"),
          round(col("est_rows"), 6).as("est_rows"))
    }),

    // The SQL DML face end to end: CTAS, INSERT INTO, UPDATE and DELETE
    // run as REAL SQL over a quoted-path graft table (GraftSqlParser) —
    // CTAS creates the versioned table from a query, the UPDATE is the
    // vectored CoW (WHERE's col-literal conjuncts become manifest
    // pruning bounds via rangePredsOf), the DELETE is merge-on-read.
    // Every mutation is DuckDB-replayable, so the final aggregate
    // hash-gates the whole statement chain.
    "q227_sql_dml" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dml_q227")
      val root = work.resolve("ord").toString
      s.sql(s"CREATE TABLE '$root' AS SELECT o_orderkey AS k, " +
        s"CAST(o_totalprice AS DOUBLE) AS price " +
        s"FROM parquet.`$d/orders.parquet`")
      s.sql(s"INSERT INTO '$root' SELECT o_orderkey + 10000000 AS k, " +
        s"CAST(50.0 AS DOUBLE) AS price FROM parquet.`$d/orders.parquet` " +
        "WHERE o_orderkey % 13 = 0")
      s.sql(s"UPDATE '$root' SET price = price + 100.0 WHERE k % 10 = 0")
      s.sql(s"DELETE FROM '$root' WHERE k % 7 = 0")
      VersionedTable.read(s, root)
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          count(when(col("k") >= 10000000L, 1)).as("n_inserted"))
    }),

    // The NAMED-TABLE catalog face end to end (graft.catalog
    // .GraftCatalog as a DSv2 TableCatalog + GraftNamedTableReads):
    // CTAS by name through Spark's OWN grammar, INSERT INTO by name
    // (V1 write bridge → committed append), UPDATE/DELETE by name
    // (GraftSqlParser named targets → vectored CoW / MoR), time travel
    // by name (VERSION AS OF through catalog loadTable), and a CALL
    // accepting the bare name — the reference's named-table surface
    // (load_to_postgis.py:140-149: SELECT id FROM ndvi_full WHERE …).
    // Every mutation is DuckDB-replayable, so the final aggregate
    // hash-gates the whole chain.
    "q228_named_catalog" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_named_q228")
      s.conf.set(graft.catalog.GraftNames.WarehouseConf, work.toString)
      s.sql(s"CREATE TABLE graft.cust_q228 AS SELECT c_custkey AS k, " +
        s"CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment AS seg " +
        s"FROM parquet.`$d/customer.parquet`")
      s.sql(s"INSERT INTO graft.cust_q228 " +
        s"SELECT c_custkey + 1000000, CAST(10.0 AS DOUBLE), 'SYNTH' " +
        s"FROM parquet.`$d/customer.parquet` WHERE c_custkey % 11 = 0")
      s.sql("UPDATE graft.cust_q228 SET bal = bal + 50.0 WHERE k % 10 = 0")
      s.sql("DELETE FROM graft.cust_q228 WHERE k % 13 = 0")
      // time travel by NAME: version 2 is the CTAS content (v1 is the
      // created empty table, v2 its population)
      val v2 = s.sql(
        "SELECT count(*) FROM graft.cust_q228 VERSION AS OF 2").head.getLong(0)
      // the CALL face takes the bare catalog name where it takes paths
      val commits = s.sql("CALL graft.history('cust_q228')").count()
      s.sql("SELECT seg, count(*) AS n, " +
        "CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal " +
        "FROM graft.cust_q228 GROUP BY seg")
        .withColumn("v2_rows", lit(v2))
        .withColumn("n_commits", lit(commits))
    }),

    // NAMESPACED catalog names (graft.<db>.<t> — the two-level face a
    // BI tool browses): CREATE NAMESPACE, CTAS + INSERT + DML through
    // the dotted spelling, SHOW TABLES scoped to the level (top never
    // lists namespaced tables), RENAME across namespaces moving the
    // managed directory, and the CALL face on the dotted name. Names
    // stay one O(1) link/dir resolution — a namespace is one warehouse
    // directory level. The final rollup + listing counts hash-gate it.
    "q243_namespaced_catalog" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ns_q243")
      s.conf.set(graft.catalog.GraftNames.WarehouseConf, work.toString)
      s.sql("CREATE NAMESPACE graft.bronze_q243")
      s.sql("CREATE NAMESPACE graft.silver_q243")
      s.sql(s"CREATE TABLE graft.bronze_q243.ord AS " +
        "SELECT CAST(o_orderkey AS BIGINT) AS k, " +
        "CAST(o_totalprice AS DOUBLE) AS price, o_orderpriority AS prio " +
        s"FROM parquet.`$d/orders.parquet`")
      s.sql("INSERT INTO graft.bronze_q243.ord " +
        "SELECT k + 100000000, price, 'SYNTH' " +
        "FROM graft.bronze_q243.ord WHERE k % 50 = 0")
      s.sql("UPDATE graft.bronze_q243.ord SET price = price + 10.0 " +
        "WHERE k % 20 = 0")
      s.sql("DELETE FROM graft.bronze_q243.ord WHERE k % 30 = 0")
      // promote: rename ACROSS namespaces (managed dir moves)
      s.sql("ALTER TABLE graft.bronze_q243.ord RENAME TO " +
        "graft.silver_q243.ord")
      val nBronze = s.sql("SHOW TABLES IN graft.bronze_q243").count()
      val nSilver = s.sql("SHOW TABLES IN graft.silver_q243").count()
      val commits = s.sql("CALL graft.history('silver_q243.ord')").count()
      s.sql("SELECT prio, count(*) AS n, " +
        "CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM graft.silver_q243.ord GROUP BY prio")
        .withColumn("n_bronze", lit(nBronze))
        .withColumn("n_silver", lit(nSilver))
        .withColumn("n_commits", lit(commits))
    }),

    // CONDITIONAL PARTIAL-ASSIGNMENT MERGE (the reference's K5
    // `ON CONFLICT … DO UPDATE SET <assignments>`,
    // load_to_postgis.py:260-269) through BOTH commit shapes on the
    // same source: the SQL face (`WHEN MATCHED AND cond THEN UPDATE
    // SET col = expr … WHEN NOT MATCHED THEN INSERT (cols) VALUES`)
    // lands merge-on-read (mergeIntoWhen → mergeIntoVectored), the
    // Scala face with vectored=false lands copy-on-write — matched
    // rows failing the condition stay untouched, inserts NULL-fill
    // unlisted columns, and the oracle replays the semantics once and
    // demands both paths hash-match it.
    "q229_merge_when" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_mw_q229")
      val sup = Tables.supplier(s, d).select(
        col("s_suppkey").cast("long").as("k"),
        col("s_acctbal").cast("double").as("bal"),
        col("s_nationkey").cast("long").as("nk"))
      val vec = work.resolve("vec").toString
      val cow = work.resolve("cow").toString
      Seq(vec, cow).foreach(r =>
        VersionedTable.create(s, r, sup.repartition(2)))
      // matched keys: multiples of 3 — even ones arrive RICHER (cond
      // true, update), odd ones POORER (cond false, untouched); new
      // keys (NEGATED — collision-free with the positive keyspace at
      // every SF) insert with nk unlisted → NULL
      val srcSql =
        s"""SELECT CAST(s_suppkey AS BIGINT) AS k,
                   CASE WHEN s_suppkey % 2 = 0
                        THEN CAST(s_acctbal AS DOUBLE) + 1000.0
                        ELSE CAST(s_acctbal AS DOUBLE) - 1000.0 END AS bal,
                   CAST(s_nationkey AS BIGINT) AS nk
            FROM parquet.`$d/supplier.parquet` WHERE s_suppkey % 3 = 0
            UNION ALL
            SELECT CAST(-s_suppkey - 1 AS BIGINT),
                   CAST(77.0 AS DOUBLE), CAST(7 AS BIGINT)
            FROM parquet.`$d/supplier.parquet` WHERE s_suppkey % 10 = 0"""
      s.sql(s"MERGE INTO '$vec' USING ($srcSql) ON (k) " +
        "WHEN MATCHED AND s.bal > t.bal THEN UPDATE SET bal = s.bal " +
        "WHEN NOT MATCHED THEN INSERT (k, bal) VALUES (s.k, s.bal)")
      VersionedTable.mergeIntoWhen(s, cow, s.sql(srcSql), Seq("k"),
        matchedCond = Some(col("s.bal") > col("t.bal")),
        set = Map("bal" -> col("s.bal")),
        insert = Some(Map("bal" -> col("s.bal"))), vectored = false)
      Seq("vec" -> vec, "cow" -> cow).map { case (tag, r) =>
        VersionedTable.read(s, r).agg(
          count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("sum_bal"),
          count(when(col("nk").isNull, 1)).as("n_null_nk"))
          .select(lit(tag).as("path"), col("n"), col("sum_bal"),
            col("n_null_nk"))
      }.reduce(_ unionByName _)
    }),

    // STREAMING CDF ROW-ID PAIRING (the q223 ledger's streaming twin):
    // a row-tracked table's change feed streams per micro-batch, and
    // each UPDATE's delete/insert images pair by (_row_id,
    // _commit_version) INSIDE the batch — stable ids make the old→new
    // join exact with no key heuristics. Pairs land in a result table
    // with per-batch txn idempotence; a deliberate replay of batch 0's
    // txn after the stream proves exactly-once (a leak would shift the
    // totals off the oracle). Delete-only images (the v6 delete) and
    // the snapshot-as-inserts batch pair with nothing.
    "q230_stream_rowid_pairs" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val work = EventsStream.scratchDir("graft_ridp_q230")
      val src = work.resolve("src").toString
      val dst = work.resolve("pairs").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, src, ev.limit(0))
      VersionedTable.enableRowTracking(s, src)
      VersionedTable.append(s, src,
        ev.repartitionByRange(2, col("event_id")))
      VersionedTable.updateWhereVectored(s, src, Map.empty,
        col("event_id") % 4 === 0,
        Map("value" -> (col("value") + 1000.0)))
      VersionedTable.updateWhereVectored(s, src, Map.empty,
        col("event_id") % 6 === 0,
        Map("value" -> (col("value") * 2.0)))
      VersionedTable.deleteWhereVectored(s, src, Map.empty,
        col("event_id") % 9 === 0)
      VersionedTable.create(s, dst, ev.limit(0).select(
        when(col("event_id").isNotNull, lit(0L)).as("ver"),
        col("event_id"),
        col("value").as("old_value"),
        col("value").as("new_value")))
      // ONE version per trigger — pairing is PER-VERSION semantics; a
      // multi-version span NETS (insert-then-update collapses to the
      // final insert, no delete image), which is q220's domain.
      // IDENTICAL-IMAGE updates (value*2 of 0.0, +1000 of NULL) are
      // CDC-INVISIBLE by the feed's documented exceptAll contract —
      // their delete/insert images cancel like a compaction rewrite's —
      // so the oracle counts only rows whose image actually changed
      // (caught live at sf0.1: event 63606, value 0.0, the one row the
      // sweep's 16666-vs-16667 diff pointed at; the manifest's DV delta
      // proves the engine vectored and re-added all 16667).
      val usedTxns = scala.collection.mutable.ArrayBuffer[Long]()
      val q = s.readStream.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val del = batch.filter(col("_change_type") === "delete")
            .select(col("_row_id").as("rid"),
              col("_commit_version").cast("long").as("ver"),
              col("event_id"), col("value").as("old_value"))
          val ins = batch.filter(col("_change_type") === "insert")
            .select(col("_row_id").as("rid2"),
              col("_commit_version").cast("long").as("ver2"),
              col("value").as("new_value"))
          val pairs = del.join(ins,
              col("rid") === col("rid2") && col("ver") === col("ver2"))
            .select(col("ver"), col("event_id"), col("old_value"),
              col("new_value"))
          val txn = 3100000L + id
          usedTxns.synchronized { usedTxns += txn }
          // appendTxn = the idempotent streaming-sink entry point (the
          // ledger check lives here, not in the raw append)
          VersionedTable.appendTxn(s, dst, pairs, txn)
          ()
        }
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      // exactly-once: replaying a committed batch txn is a no-op —
      // were it applied, ver -1 rows would land and break every total
      val vBefore = VersionedTable.currentVersion(s, dst).get
      VersionedTable.appendTxn(s, dst,
        ev.limit(1).select(lit(-1L).as("ver"), col("event_id"),
          col("value").as("old_value"), col("value").as("new_value")),
        usedTxns.head)
      val replayed = (VersionedTable.currentVersion(s, dst).get - vBefore)
        .toLong
      // versions normalize to STEPS (ver - min ver): the pairing
      // contract is per-update-image, not tied to absolute version
      // numbers (which depend on enableRowTracking's commit count)
      val pairsDf = VersionedTable.read(s, dst)
      val minVer = pairsDf.agg(min(col("ver"))).head.getLong(0)
      pairsDf.groupBy((col("ver") - lit(minVer)).as("step"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("new_value") - col("old_value"))
            .cast("decimal(18,2)")).cast("double").as("sum_delta"))
        .select(col("step"), col("n_pairs"), col("sum_delta"),
          lit(replayed).as("replayed"))
    }),

    // CALL graft.files + graft.file_stats — the Iceberg files
    // metadata-table analog: per-file rows / DV-aware live rows /
    // bytes / DV cardinality / bloom presence and per-(file, column)
    // [lo, hi] + null count + exact sum, ALL from the manifest + one
    // listing, zero data scanned. Three range-disjoint files, a bloom
    // + sums index (which upgrades every file's stats to live-exact),
    // then a vectored delete touching only file 1 (its stats refresh
    // to DV-survivor-exact values); the oracle recomputes
    // every number from the same three ranges, so the hash proves the
    // report IS the data's truth, not just its shape.
    "q231_files_report" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_files_q231")
      val root = work.resolve("cust").toString
      val c = Tables.customer(s, d).select(
        col("c_custkey").cast("long").as("k"),
        col("c_acctbal").cast("double").as("bal"))
      val mk = c.agg(max(col("k"))).head.getLong(0)
      val (t1, t2) = (mk / 5, mk / 2)
      VersionedTable.create(s, root, c.filter(col("k") <= t1).coalesce(1))
      VersionedTable.append(s, root,
        c.filter(col("k") > t1 && col("k") <= t2).coalesce(1))
      VersionedTable.append(s, root, c.filter(col("k") > t2).coalesce(1))
      s.sql(s"CALL graft.index_bloom('$root', 'k')")
      s.sql(s"CALL graft.index_sums('$root', 'k')")
      VersionedTable.deleteWhereVectored(s, root,
        Map("k" -> (Some(1L): Option[Any], Some(t1): Option[Any])),
        col("k") % 5 === 0 && col("k") <= t1)
      val fr = s.sql(s"CALL graft.files('$root')")
      val st = s.sql(s"CALL graft.file_stats('$root', 'k')")
      fr.join(st, "file")
        .select(col("rows"), col("live_rows"), col("dv_card"),
          (col("bytes") > 0L).as("has_bytes"),
          (col("bloom_cols") === "k").as("bloomed"),
          col("lo").cast("long").as("lo_k"),
          col("hi").cast("long").as("hi_k"),
          col("nulls"), col("live"), col("sum"))
    }),

    // ORDERED MULTI-CLAUSE MERGE (Delta's WHEN MATCHED evaluation
    // rule, the reference's K5 generalized): three matched clauses —
    // richer rows update (first condition wins), collapsed rows
    // delete, everything else tagged — plus the not-matched insert,
    // through BOTH commit shapes on one source; the oracle replays the
    // first-match-wins semantics once and both paths hash-match it.
    "q232_merge_multi" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_mm_q232")
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_totalprice").cast("double").as("price"))
        .withColumn("status", when(col("k").isNotNull, lit("base")))
      val vec = work.resolve("vec").toString
      val cow = work.resolve("cow").toString
      Seq(vec, cow).foreach(r =>
        VersionedTable.create(s, r, o.repartition(2)))
      val srcSql =
        s"""SELECT CAST(o_orderkey AS BIGINT) AS k,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(o_totalprice AS DOUBLE) * 2.0
                        WHEN o_orderkey % 5 = 0
                        THEN CAST(o_totalprice AS DOUBLE) * 0.25
                        ELSE CAST(o_totalprice AS DOUBLE) END AS price
            FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT CAST(-o_orderkey - 1 AS BIGINT), CAST(55.0 AS DOUBLE)
            FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 10 = 0"""
      s.sql(s"MERGE INTO '$vec' USING ($srcSql) ON (k) " +
        "WHEN MATCHED AND s.price > t.price THEN UPDATE SET " +
        "price = s.price, status = 'up' " +
        "WHEN MATCHED AND s.price < t.price * 0.5 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET status = 'meh' " +
        "WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price)")
      VersionedTable.mergeIntoWhenMulti(s, cow, s.sql(srcSql), Seq("k"),
        Seq(
          (Some(col("s.price") > col("t.price")): Option[org.apache.spark.sql.Column]) ->
            (VersionedTable.MatchedUpdate(Map(
              "price" -> col("s.price"),
              "status" -> lit("up"))): VersionedTable.MatchedAction),
          (Some(col("s.price") < col("t.price") * 0.5): Option[org.apache.spark.sql.Column]) ->
            (VersionedTable.MatchedDelete: VersionedTable.MatchedAction),
          (None: Option[org.apache.spark.sql.Column]) ->
            (VersionedTable.MatchedUpdate(Map(
              "status" -> lit("meh"))): VersionedTable.MatchedAction)),
        insert = Some(Map("price" -> col("s.price"))), vectored = false)
      Seq("vec" -> vec, "cow" -> cow).map { case (tag, r) =>
        VersionedTable.read(s, r).groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("price").cast("decimal(18,2)")).cast("double")
              .as("sum_price"))
          .select(lit(tag).as("path"), col("status"), col("n"),
            col("sum_price"))
      }.reduce(_ unionByName _)
    }),

    // FULL three-family MERGE grammar (Delta's clause set): ordered
    // conditional WHEN MATCHED, ordered conditional WHEN NOT MATCHED
    // inserts, and WHEN NOT MATCHED BY SOURCE delete/update — through
    // BOTH commit shapes on one source; the oracle replays the
    // per-family first-match-wins semantics once and both paths
    // hash-match it.
    "q233_merge_full" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_mf_q233")
      val o = Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_totalprice").cast("double").as("price"))
        .withColumn("status", when(col("k").isNotNull, lit("base")))
      val vec = work.resolve("vec").toString
      val cow = work.resolve("cow").toString
      Seq(vec, cow).foreach(r =>
        VersionedTable.create(s, r, o.repartition(2)))
      val srcSql =
        s"""SELECT CAST(o_orderkey AS BIGINT) AS k,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(o_totalprice AS DOUBLE) * 2.0
                        ELSE CAST(o_totalprice AS DOUBLE) * 0.5 END AS price
            FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT CAST(-o_orderkey - 1 AS BIGINT),
                   CASE WHEN o_orderkey % 20 = 0
                        THEN CAST(155.0 AS DOUBLE)
                        ELSE CAST(55.0 AS DOUBLE) END
            FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 10 = 0"""
      s.sql(s"MERGE INTO '$vec' USING ($srcSql) ON (k) " +
        "WHEN MATCHED AND s.price > t.price THEN UPDATE SET " +
        "price = s.price, status = 'up' " +
        "WHEN MATCHED THEN UPDATE SET status = 'down' " +
        "WHEN NOT MATCHED AND s.price > 100.0 THEN INSERT " +
        "(k, price, status) VALUES (s.k, s.price, 'big') " +
        "WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price) " +
        "WHEN NOT MATCHED BY SOURCE AND t.k % 7 = 0 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE AND t.k % 5 = 0 THEN UPDATE SET " +
        "status = 'stale'")
      import org.apache.spark.sql.Column
      import VersionedTable.{MatchedAction, MatchedDelete, MatchedUpdate}
      VersionedTable.mergeIntoWhenFull(s, cow, s.sql(srcSql), Seq("k"),
        matched = Seq(
          (Some(col("s.price") > col("t.price")): Option[Column]) ->
            (MatchedUpdate(Map("price" -> col("s.price"),
              "status" -> lit("up"))): MatchedAction),
          (None: Option[Column]) ->
            (MatchedUpdate(Map("status" -> lit("down"))): MatchedAction)),
        notMatched = Seq(
          (Some(col("s.price") > 100.0): Option[Column]) ->
            Map("k" -> col("s.k"), "price" -> col("s.price"),
              "status" -> lit("big")),
          (None: Option[Column]) ->
            Map[String, Column]("price" -> col("s.price"))),
        bySource = Seq(
          (Some(col("t.k") % 7 === 0): Option[Column]) ->
            (MatchedDelete: MatchedAction),
          (Some(col("t.k") % 5 === 0): Option[Column]) ->
            (MatchedUpdate(Map("status" -> lit("stale"))): MatchedAction)),
        vectored = false)
      Seq("vec" -> vec, "cow" -> cow).map { case (tag, r) =>
        VersionedTable.read(s, r).groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("price").cast("decimal(18,2)")).cast("double")
              .as("sum_price"))
          .select(lit(tag).as("path"), col("status"), col("n"),
            col("sum_price"))
      }.reduce(_ unionByName _)
    }),

    // Plain CREATE TABLE DDL (contracts en bloc: NOT NULL, GENERATED,
    // CHECK), INSERT through the contract, DELETE, RESTORE TO VERSION
    // AS OF undoing it, and the SHOW CREATE script re-creating the
    // shape on a fresh path — the oracle replays both tables' final
    // states (restored = the full slice with the generated column;
    // re-created = the k%3 slice through the same contracts).
    "q234_create_restore" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_cr_q234")
      val a = work.resolve("a").toString
      val b = work.resolve("b").toString
      s.sql(s"""CREATE TABLE '$a' (
          k BIGINT,
          price DOUBLE,
          cat STRING,
          dbl DOUBLE GENERATED ALWAYS AS (k * 2.0),
          CONSTRAINT price_pos CHECK (price >= 0))""")
      val srcSql =
        s"""SELECT CAST(o_orderkey AS BIGINT) AS k,
                   CAST(o_totalprice AS DOUBLE) AS price,
                   o_orderpriority AS cat
            FROM parquet.`$d/orders.parquet`"""
      s.sql(s"INSERT INTO '$a' $srcSql")                     // v2
      s.sql(s"DELETE FROM '$a' WHERE k % 2 = 0")             // v3
      s.sql(s"RESTORE TABLE '$a' TO VERSION AS OF 2")        // v4
      val script = s.sql(s"SHOW CREATE TABLE '$a'")
        .collect().map(_.getString(0)).toSeq
      script.map(_.replace(s"'$a'", s"'$b'")).foreach(s.sql(_))
      s.sql(s"INSERT INTO '$b' $srcSql WHERE o_orderkey % 3 = 0")
      Seq("restored" -> a, "recreated" -> b).map { case (tag, r) =>
        VersionedTable.read(s, r).groupBy(col("cat"))
          .agg(count(lit(1)).as("n"),
            sum(col("price").cast("decimal(18,2)")).cast("double")
              .as("sum_price"),
            sum(col("dbl").cast("decimal(18,1)")).cast("double")
              .as("sum_dbl"))
          .select(lit(tag).as("tab"), col("cat"), col("n"),
            col("sum_price"), col("sum_dbl"))
      }.reduce(_ unionByName _)
    }),

    // COPY INTO — idempotent batch file ingest: three staged source
    // files land across three statements (2 loaded, then a no-op
    // replay, then 1 incremental); the manifest `loads` ledger is the
    // dedup state. The oracle replays the slice arithmetic and the
    // per-step loaded counts.
    "q235_copy_into" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ci_q235")
      val root = work.resolve("t").toString
      val in = work.resolve("in")
      java.nio.file.Files.createDirectories(in)
      def stageFile(name: String, modulo: Int): Unit = {
        val tmp = work.resolve(s"stage_$name").toString
        Tables.orders(s, d).filter(col("o_orderkey") % 3 === modulo)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_totalprice").cast("double").as("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          in.resolve(s"$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      s.sql(s"CREATE TABLE '$root' (k BIGINT, v DOUBLE)")
      stageFile("a", 0); stageFile("b", 1)
      val steps = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      def copy(): Unit = {
        val r = s.sql(s"COPY INTO '$root' FROM '$in'").head()
        steps += ((steps.size.toLong, r.getInt(1).toLong))
      }
      copy()                       // loads a + b
      copy()                       // replay: no-op
      stageFile("c", 2)
      copy()                       // loads only c
      import s.implicits._
      val stepDf = steps.toSeq.toDF("step", "files_loaded")
      val agg = VersionedTable.read(s, root)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_v"))
      stepDf.crossJoin(agg)
    }),

    // Streaming through CATALOG NAMES: readStream.table("graft.t")
    // swaps to the V1 versioned source (resolution-rule bridge), and
    // the drained stream must reproduce the table exactly — two
    // commits (CTAS populate + INSERT) delivered as the initial
    // snapshot plus a version delta. Oracle = the plain batch rollup.
    "q236_stream_named" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ns_q236")
      s.conf.set(graft.catalog.GraftNames.WarehouseConf,
        work.resolve("wh").toString)
      s.sql(s"CREATE TABLE graft.ord_q236 AS " +
        "SELECT CAST(o_orderkey AS BIGINT) AS k, " +
        "CAST(o_totalprice AS DOUBLE) AS price, o_orderpriority AS prio " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft.ord_q236 " +
        "SELECT CAST(o_orderkey AS BIGINT), " +
        "CAST(o_totalprice AS DOUBLE), o_orderpriority " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 2 = 1")
      val out = work.resolve("out").toString
      val q = s.readStream.table("graft.ord_q236")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(out).groupBy(col("prio"))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
    }),

    // SQL inspection statements: DESCRIBE HISTORY (per-version op +
    // DV-aware live/deleted rows), DESCRIBE DETAIL (one summary row),
    // CALL graft.loads (the COPY INTO ledger) — after a known
    // create → insert → vectored delete → copy-into construction the
    // oracle replays every number from orders arithmetic.
    "q237_describe_sql" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_desc_q237")
      val root = work.resolve("t").toString
      val in = work.resolve("in")
      java.nio.file.Files.createDirectories(in)
      s.sql(s"CREATE TABLE '$root' (k BIGINT, v DOUBLE)")       // v1
      s.sql(s"INSERT INTO '$root' SELECT CAST(o_orderkey AS BIGINT) AS k," +
        s" CAST(o_totalprice AS DOUBLE) AS v " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 2 = 0") // v2
      s.sql(s"DELETE FROM '$root' WHERE k % 5 = 0")             // v3
      locally { // stage the %7 slice as one source file, then COPY INTO
        val tmp = work.resolve("stage").toString
        Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_totalprice").cast("double").as("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, in.resolve("seven.parquet"))
      }
      s.sql(s"COPY INTO '$root' FROM '$in'")                    // v4
      val hist = s.sql(s"DESCRIBE HISTORY '$root'")
        .select(col("version").cast("long").as("version"), col("op"),
          col("n_live_rows").as("live"),
          col("n_deleted_rows").as("deleted"))
      val detail = s.sql(s"DESCRIBE DETAIL '$root'").head()
      val loads = s.sql(s"CALL graft.loads('$root')").count()
      import s.implicits._
      hist.unionByName(Seq(
        (99L, "detail", detail.getLong(3), loads))
        .toDF("version", "op", "live", "deleted"))
    }),

    // CREATE OR REPLACE TABLE (wholesale shape replacement at
    // version+1, contracts reset, old versions readable) + positional
    // INSERT (column list): the swapped (price, k) list exercises the
    // binding, the replace swaps the schema for a rollup, and time
    // travel still reads the pre-replace shape. Oracle replays both.
    "q238_replace_insert" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ri_q238")
      val root = work.resolve("t").toString
      s.sql(s"CREATE TABLE '$root' (k BIGINT, price DOUBLE)")      // v1
      s.sql(s"INSERT INTO '$root' (price, k) " +
        "SELECT CAST(o_totalprice AS DOUBLE), CAST(o_orderkey AS BIGINT) " +
        s"FROM parquet.`$d/orders.parquet` WHERE o_orderkey % 3 = 0") // v2
      s.sql(s"CREATE OR REPLACE TABLE '$root' AS " +
        "SELECT o_orderpriority AS cat, count(*) AS n, " +
        "CAST(sum(CAST(CAST(o_totalprice AS DOUBLE) AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS total " +
        s"FROM parquet.`$d/orders.parquet` GROUP BY 1")             // v3
      val newShape = VersionedTable.read(s, root)
        .select(col("cat"), col("n").cast("long").as("n"), col("total"))
      val old = VersionedTable.read(s, root, Some(2))
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .select(lit("v2").as("cat"), col("n"), col("total"))
      newShape.unionByName(old)
    }),

    // Per-commit operation metrics (Delta's operationMetrics analog)
    // from manifest pairs, zero data scanned: create → append →
    // vectored delete (DV growth) → vectored update (vector + re-add)
    // → compact (net-zero rewrite that folds the vectors in). The
    // oracle replays every count from orders arithmetic. File counts
    // are machine-dependent (split sizing) and spec-pinned instead.
    "q239_op_metrics" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_om_q239")
      val root = work.resolve("t").toString
      s.sql(s"CREATE TABLE '$root' (k BIGINT, v DOUBLE)")       // v1
      VersionedTable.append(s, root,
        Tables.orders(s, d).select(
          col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("v")).coalesce(2)) // v2
      s.sql(s"DELETE FROM '$root' WHERE k % 5 = 0")             // v3
      s.sql(s"UPDATE '$root' SET v = v + 1.0 WHERE k % 7 = 0")  // v4
      s.sql(s"OPTIMIZE '$root'")                                // v5
      import s.implicits._
      VersionedTable.operationMetrics(s, root)
        .map { case (v, op, _, _, ra, rr, dv) => (v.toLong, op, ra, rr, dv) }
        .toDF("version", "op", "rows_added", "rows_removed",
          "dv_rows_deleted")
    }),

    // COPY INTO from a NON-parquet landing zone: FILEFORMAT = CSV /
    // JSON read SCHEMA-ON-READ against the table's declared schema
    // (CSV positionally in declared order + FORMAT_OPTIONS header,
    // JSON by field name) — the formats a real ingest directory
    // actually receives (the reference's loaders rescan a raw landing
    // dir, load_to_postgis.py:173-174). Same loads-ledger idempotence
    // as parquet: replay is a no-op, a late file loads incrementally.
    // The oracle replays the slice arithmetic and per-step counts.
    "q240_copy_formats" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_cf_q240")
      def stage(sub: String, fmt: String, name: String, modulo: Int): Unit = {
        val tmp = work.resolve(s"stage_${sub}_$name").toString
        val df = Tables.orders(s, d)
          .filter(col("o_orderkey") % 3 === modulo)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_totalprice").cast("double").as("v"),
            col("o_orderpriority").as("prio"))
          .coalesce(1)
        if (fmt == "csv")
          df.write.mode("overwrite").option("header", "true").csv(tmp)
        else df.write.mode("overwrite").json(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(s".$fmt")).get
        val dest = work.resolve(sub).resolve(s"$name.$fmt")
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(part.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val csvRoot = work.resolve("t_csv").toString
      val jsonRoot = work.resolve("t_json").toString
      s.sql(s"CREATE TABLE '$csvRoot' (k BIGINT, v DOUBLE, prio STRING)")
      s.sql(s"CREATE TABLE '$jsonRoot' (k BIGINT, v DOUBLE, prio STRING)")
      val steps =
        scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      def copy(tag: String, root: String, in: String, clause: String,
               step: Long): Unit = {
        val r = s.sql(s"COPY INTO '$root' FROM '$in' $clause").head()
        steps += ((tag, step, r.getInt(1).toLong))
      }
      val csvClause =
        "FILEFORMAT = CSV FORMAT_OPTIONS ('header' = 'true')"
      stage("in_csv", "csv", "a", 0); stage("in_csv", "csv", "b", 1)
      val inCsv = work.resolve("in_csv").toString
      copy("csv", csvRoot, inCsv, csvClause, 0)       // loads a + b
      copy("csv", csvRoot, inCsv, csvClause, 1)       // replay: no-op
      stage("in_csv", "csv", "c", 2)
      copy("csv", csvRoot, inCsv, csvClause, 2)       // loads only c
      stage("in_json", "json", "a", 0); stage("in_json", "json", "b", 2)
      val inJson = work.resolve("in_json").toString
      copy("json", jsonRoot, inJson, "FILEFORMAT = JSON", 0)
      copy("json", jsonRoot, inJson, "FILEFORMAT = JSON", 1) // no-op
      import s.implicits._
      val stepDf = steps.toSeq.toDF("tab", "step", "files_loaded")
      def agg(tag: String, root: String) =
        stepDf.filter(col("tab") === tag).crossJoin(
          VersionedTable.read(s, root)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("v").cast("decimal(18,2)")).cast("double")
                .as("sum_v")))
      agg("csv", csvRoot).unionByName(agg("json", jsonRoot))
    }),

    // Streaming from a WALL-CLOCK bound (startingTimestamp, Delta
    // parity): the stream starts at the first version committed at or
    // after the bound — resolved from in-commit stamps, so a backup-
    // restore that mangles file mtimes changes nothing. Built mid-
    // history (v2's exact stamp → v2 and v3 stream, v1 never does),
    // drained exactly-once with AvailableNow, then replayed on the
    // same checkpoint to prove the drain is idempotent. Oracle = the
    // batch rollup of the v2+v3 slices.
    "q241_stream_from_ts" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_sts_q241")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root, ev.filter(col("event_id") % 3 === 0)) // v1
      // two commits landing in the same millisecond share a monotonized
      // stamp, and an equal-stamp bound resolves to the EARLIER version
      // ("at or after" is genuinely ambiguous on ties) — v1 would then
      // re-deliver. Wait out v1's stamp so v2's is strictly greater and
      // the v2-boundary below is deterministic.
      val ts1 = VersionedTable.commitTimestamps(s, root).toMap.apply(1)
      while (System.currentTimeMillis() <= ts1) Thread.sleep(1)
      VersionedTable.append(s, root, ev.filter(col("event_id") % 3 === 1)) // v2
      VersionedTable.append(s, root, ev.filter(col("event_id") % 3 === 2)) // v3
      val ts2 = VersionedTable.commitTimestamps(s, root).toMap.apply(2)
      require(ts1 < ts2, s"v2's stamp must strictly follow v1's ($ts1, $ts2)")
      val out = work.resolve("out").toString
      def drainOnce(): Unit = {
        val q = s.readStream.format("graft-versioned")
          .option("startingTimestamp", ts2.toString).load(root)
          .writeStream.outputMode("append").format("parquet")
          .option("path", out)
          .option("checkpointLocation", work.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      drainOnce()
      drainOnce() // replay on the same checkpoint: no re-delivery
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    }),

    "q208_sql_txn" -> ((s, d) => {
      val dir = EventsStream.scratchDir("graft_txnsql_q208").toString
      val cat = s"$dir/cat"
      def stage(cut: String): Unit = {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
          .createOrReplaceTempView("q208_src_cust")
        o.groupBy(col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
          .createOrReplaceTempView("q208_src_prio")
        s.sql(s"CALL graft.txn_apply('$cat', 'by_cust,by_prio', " +
          "'q208_src_cust,q208_src_prio')")
      }
      stage("1995-01-01")                                   // txn 1
      stage("1997-01-01")                                   // txn 2
      s.sql(s"CALL graft.txn_snapshot('$cat', 'q208c')")    // newest pair
      s.sql(s"CALL graft.txn_snapshot('$cat', 'q208o', 1)") // txn-1 pair
      s.sql(
        """SELECT 'cur_cust' AS tag, CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(sum(n) AS BIGINT) AS n_orders,
                  CAST(sum(total) AS DOUBLE) AS total
           FROM q208c_by_cust
           UNION ALL
           SELECT 'cur_prio', CAST(count(*) AS BIGINT),
                  CAST(sum(n) AS BIGINT), CAST(sum(rev) AS DOUBLE)
           FROM q208c_by_prio
           UNION ALL
           SELECT 'old_cust', CAST(count(*) AS BIGINT),
                  CAST(sum(n) AS BIGINT), CAST(sum(total) AS DOUBLE)
           FROM q208o_by_cust
           UNION ALL
           SELECT 'old_prio', CAST(count(*) AS BIGINT),
                  CAST(sum(n) AS BIGINT), CAST(sum(rev) AS DOUBLE)
           FROM q208o_by_prio""")
    }),

    // Cross-table exactly-once streaming: each micro-batch dedups
    // against the base (at-least-once landing: a duplicate slice file),
    // appends the base, incrementally merges the per-user MV (decimal
    // partials), and publishes BOTH through ONE TxnCatalog claim — a
    // catalog reader can never see a base its MV hasn't caught up to.
    // The stream then re-runs on a FRESH checkpoint (full re-delivery):
    // table txn ledgers + no-op txn elision make the replay invisible.
    // Oracle: the MV must equal the plain batch rollup of events.
    "q189_txn_stream_mv" -> ((s, d) =>
      EventsStream.txnMvStreaming(s, d)),

    // Merge-on-read DELETE via deletion vectors, oracle-gated end to end:
    // lineitem lands range-clustered by l_orderkey, then takes TWO
    // overlapping vectored deletes — each commits row-position sidecars,
    // never rewriting a data file (the spec asserts the file set; here the
    // HASH asserts the semantics). The result reads all three snapshots:
    // v1 (pre-delete — time travel must still see every row through the
    // version-pinned sidecars), v2 (first delete applied), v3 (merged
    // vectors). At 100 TB this is the only affordable shape for scattered
    // deletes (GDPR erasure, bad-batch retraction): write cost ∝ deleted
    // positions, and the range-stat pruning bounds even the delete's scan
    // to the l_orderkey-matching files. NULL semantics ride the same IS
    // TRUE delete-set rule as the CoW path.
    "q191_dv_delete" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dv_q191")
      val root = work.resolve("li").toString
      val li = Tables.lineitem(s, d)
      VersionedTable.create(s, root,
        li.repartitionByRange(8, col("l_orderkey")))                  // v1
      VersionedTable.deleteWhereVectored(s, root,
        Map("l_orderkey" -> (Some(1000L), Some(20000L))),
        col("l_orderkey").between(1000, 20000) && col("l_quantity") <= 10) // v2
      VersionedTable.deleteWhereVectored(s, root,
        Map("l_orderkey" -> (Some(15000L), Some(40000L))),
        col("l_orderkey").between(15000, 40000) &&
          col("l_returnflag") === "A")                                // v3
      def snap(v: Int, tag: String) =
        VersionedTable.read(s, root, Some(v))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
          .select(lit(tag).as("tag"), col("n"), col("revenue"))
      snap(1, "v1").unionByName(snap(2, "v2_after_d1"))
        .unionByName(snap(3, "v3_after_d2"))
    }),

    // The deletion vector through the CHANGE FEED and compaction: a
    // vectored delete moves no file, yet changesBetween must report the
    // vanished rows as removals (the vector DELTA, read at position
    // granularity — the diff stays delta-sized, never table-sized), and a
    // subsequent compaction must MATERIALIZE the vector (rewrite the
    // survivors, drop the sidecar) without changing what readers see.
    // The output hashes both: the CDC-removed rows' rollup and the
    // post-compaction head — equal to the delete set and its complement
    // computed straight from events by the oracle.
    "q192_dv_cdc" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dv_q192")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root,
        ev.repartitionByRange(4, col("user_id")))                     // v1
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_type") === "click" && col("user_id") % 7 === 0)    // v2
      val (_, removed) = VersionedTable.changesBetween(s, root, 1, 2)
      val removedAgg = removed
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(lit("removed").as("tag"), col("n"), col("sum_value"))
      VersionedTable.compact(s, root, targetBytes = Long.MaxValue / 4) // materialize
      val headAgg = VersionedTable.read(s, root)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(lit("head").as("tag"), col("n"), col("sum_value"))
      headAgg.unionByName(removedAgg)
    }),

    // Merge-on-read MERGE — the CDC apply whose write cost ignores key
    // locality: a CoW merge rewrites every file the source's key range
    // touches, so a key-SCATTERED CDC batch (the usual case) rewrites
    // nearly the whole table; mergeIntoVectored instead vectors the
    // matched rows away (position sidecars) and lands the source as new
    // files — O(source + matched positions) written, zero target
    // rewrites. One commit carries upserts (value doubled for
    // event_id % 5 = 0), inserts (the % 3 = 0 rows held out of the
    // base) and deletes (% 11 = 0 keys) atomically; the oracle
    // recomputes the post-merge state from raw events — the MoR and CoW
    // results must be indistinguishable.
    "q193_dv_merge" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dv_q193")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val base = ev.filter(col("event_id") % 3 =!= 0)
      VersionedTable.create(s, root,
        base.repartitionByRange(4, col("event_id")))
      val ups = base.filter(col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
      val ins = ev.filter(col("event_id") % 3 === 0)
      val dels = base
        .filter(col("event_id") % 11 === 0 && col("event_id") % 5 =!= 0)
        .select(col("event_id"))
      VersionedTable.mergeIntoVectored(s, root, ups.unionByName(ins),
        Seq("event_id"), Some(dels))
      VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // The CHANGE-DATA-FEED streaming read (readChangeFeed=true): the
    // versioned table streamed as its own CHANGELOG — inserts AND
    // deletes as typed rows — across an append, a copy-on-write merge
    // and a vectored delete, one commit per micro-batch. The drained
    // feed is FOLDED by sign (+insert / −delete, decimal partials) and
    // must reproduce the final table state exactly: the oracle
    // recomputes that state from raw events, so a feed that loses a
    // delete, re-delivers a compaction rewrite, or mis-types a row
    // breaks the hash. At 100 TB each batch reads only the commit's
    // file-set difference + vector deltas (carried rewrites cancel and
    // deliver nothing) — the changelog costs per-commit delta, never
    // table size.
    "q194_cdf_stream" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val work = EventsStream.scratchDir("graft_cdf_q194")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      val base = ev.filter(col("event_id") % 3 =!= 0)
      VersionedTable.create(s, root, base.filter(col("event_id") % 3 === 1)
        .repartitionByRange(2, col("event_id")))                      // v1
      VersionedTable.append(s, root, base.filter(col("event_id") % 3 === 2)) // v2
      val ups = base.filter(col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
      val ins = ev.filter(col("event_id") % 3 === 0)
      VersionedTable.mergeInto(s, root, ups.unionByName(ins), Seq("event_id")) // v3 CoW
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 7 === 0)                                    // v4 MoR
      val sink = work.resolve("sink").toString
      val q = s.readStream.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(root)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(sink)
        .select(col("user_id"),
          when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)).as("sgn"),
          col("value").cast("decimal(18,2)").as("v"))
        .groupBy(col("user_id"))
        .agg(sum(col("sgn")).as("n_events"),
          sum(col("sgn") * col("v")).cast("double").as("sum_value"))
        .filter(col("n_events") > 0)
    }),

    // Metadata-only aggregates ([[graft.plans.MetaAggregates]]): the
    // manifest records per-file row counts, footer [lo, hi] and null
    // counts, and DV cardinalities — so a global COUNT(*)/COUNT(col)/
    // MIN/MAX over a snapshot collapses to a LocalRelation read from one
    // small JSON (at 100 TB: no scan job at all, the lakehouse analog of
    // Spark's OptimizeMetadataOnlyQuery). Both snapshots here hash
    // against the oracle's recomputation from raw events, and BOTH are
    // answered entirely from metadata (MetaAggregateSpec pins the
    // zero-relation plan): the v2 side from footer stats, the v3 side —
    // which carries deletion vectors — from the survivor-exact LIVE
    // stats its vectored delete re-derived in the same distributed pass
    // that wrote the sidecars (ColStat.live), so count(*), count(col)
    // AND min/max all stay manifest arithmetic under merge-on-read
    // deletes. The hash proves the refreshed stats are exact.
    "q195_meta_agg" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_meta_q195")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          when(col("event_id") % 4 =!= 0, col("user_id")).as("v_null"))
      VersionedTable.create(s, root,
        ev.filter(col("event_id") % 3 =!= 0)
          .repartitionByRange(4, col("event_id")))                    // v1
      VersionedTable.append(s, root, ev.filter(col("event_id") % 3 === 0)) // v2
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 7 === 0)                                    // v3
      def snap(v: Int, tag: String) =
        s.read.format("graft-versioned").option("versionAsOf", v.toString)
          .load(root)
          .agg(count(lit(1)).as("n"), count(col("v_null")).as("n_nonnull"),
            min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
          .select(lit(tag).as("tag"), col("n"), col("n_nonnull"),
            col("lo"), col("hi"))
      snap(2, "v2_full").unionByName(snap(3, "v3_after_delete"))
    }),

    // The filtered + grouped metadata path: a partition-bucketed events
    // table answers the partition-dashboard query — WHERE over the
    // partition column decided per file, GROUP BY over it grouping whole
    // files, COUNT/COUNT(col)/MIN/MAX per group from per-file row
    // counts, footer null counts and [lo, hi] — without opening one data
    // file (MetaAggregateSpec pins zero relations in the plan). The
    // oracle recomputes everything from raw events, so the metadata
    // arithmetic is hash-gated, not just plan-gated.
    "q196_meta_filter_group" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_meta_q196")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"),
          (col("user_id") % 8).cast("int").as("bucket"),
          when(col("event_id") % 6 =!= 0, col("event_id")).as("e_null"))
      VersionedTable.create(s, root, ev, partitionBy = Seq("bucket"))
      s.read.format("graft-versioned").load(root)
        .filter(col("bucket").between(2, 6))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), count(col("e_null")).as("n_nonnull"),
          min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
    }),

    // DESCRIBE HISTORY, oracle-gated: a four-commit lifecycle (create,
    // append, vectored delete, compaction) read back ENTIRELY from
    // manifests — operation labels, file counts, exact live rows (per-
    // file nrows minus DV cardinalities), vectored-away rows. The
    // oracle recomputes every number from raw events; the compaction row
    // proves the vectors materialized (deleted back to 0, one file).
    // At 100 TB the audit trail costs one small JSON read per version.
    "q197_history" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_hist_q197")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, root,
        ev.filter(col("event_id") % 2 === 0).repartition(4))          // v1
      VersionedTable.append(s, root,
        ev.filter(col("event_id") % 2 === 1).repartition(2))          // v2
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 5 === 0)                                    // v3
      VersionedTable.compact(s, root, targetBytes = Long.MaxValue / 4) // v4
      VersionedTable.describeHistory(s, root)
        .select(col("version"), col("op"), col("n_files"),
          col("n_live_rows"), col("n_deleted_rows"))
    }),

    // The SQL MAINTENANCE face end-to-end (GraftCatalog, a Spark 4
    // ProcedureCatalog): a table's whole upkeep lifecycle — merge-on-read
    // DELETE with a SQL predicate string, OPTIMIZE, index build — driven
    // purely by CALL statements, then the post-maintenance state AND the
    // version ledger are hash-gated against the oracle's recomputation.
    // The reference runs its maintenance through psql scripts; this is
    // the same UX where every statement commits a manifest version.
    "q198_sql_maintenance" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_call_q198")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root, ev.repartition(4))               // v1
      s.sql(s"CALL graft.delete_where('$root', 'event_id % 7 = 0', true)") // v2
      s.sql(s"CALL graft.compact('$root', ${Long.MaxValue / 4})")     // v3
      s.sql(s"CALL graft.index_bloom('$root', 'event_type')")         // v4
      val rollup = VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("event_type").as("tag"), col("n"), col("sum_value"))
      val meta = s.sql(s"CALL graft.history('$root')")
        .agg(max(col("version")).cast("bigint").as("n"),
          max(col("n_live_rows")).cast("double").as("sum_value"))
        .select(lit("_versions").as("tag"), col("n"), col("sum_value"))
      rollup.unionByName(meta)
    }),

    // The MoR DML face end-to-end through SQL (CALL graft.merge_into):
    // a CoW merge (updates keyed on event_id, source handed over as a
    // temp view) then a VECTORED merge whose batch both updates scattered
    // keys and inserts brand-new ones — the CDC-apply shape where
    // copy-on-write would rewrite nearly every file and merge-on-read
    // writes none. The final rollup recomputes from raw events in the
    // oracle, so both merge semantics (replace-by-key + insert) and the
    // vectored read path are hash-gated; the _versions row pins the
    // lifecycle length and the final live-row count.
    "q199_sql_merge" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_merge_q199")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root, ev.repartition(4))               // v1
      ev.filter(col("event_id") % 10 === 0)
        .withColumn("event_type", lit("upd"))
        .withColumn("value", col("value") + lit(1000.0))
        .createOrReplaceTempView("q199_src_cow")
      s.sql(s"CALL graft.merge_into('$root', 'q199_src_cow', 'event_id', false)") // v2
      ev.filter(col("event_id") % 10 === 5)
        .withColumn("event_type", lit("u2"))
        .withColumn("value", col("value") - lit(500.0))
        .unionByName(ev.filter(col("event_id") % 100 === 3)
          .select((col("event_id") + lit(1000000000L)).as("event_id"),
            lit("ins").as("event_type"), col("value")))
        .createOrReplaceTempView("q199_src_mor")
      s.sql(s"CALL graft.merge_into('$root', 'q199_src_mor', 'event_id', true)")  // v3
      val rollup = VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("event_type").as("tag"), col("n"), col("sum_value"))
      val meta = s.sql(s"CALL graft.history('$root')")
        .agg(max(col("version")).cast("bigint").as("n"),
          max(col("n_live_rows")).cast("double").as("sum_value"))
        .select(lit("_versions").as("tag"), col("n"), col("sum_value"))
      rollup.unionByName(meta)
    }),

    // Index maintenance after a wide vectored delete (CALL graft.reindex):
    // blooms built pre-delete stay sound-but-stale over-approximations
    // forever (a vector never shrinks an index), so key lookups keep
    // opening files whose only matching rows were deleted; reindex
    // rebuilds the touched files' blooms from SURVIVING rows in one
    // metadata commit — no data rewrite. The query then runs the real
    // lookup path (bloomCandidateFiles over a 30-key probe set →
    // readSubset → exact filter) and hashes against the oracle's plain
    // recompute, proving the rebuilt index never prunes a live match;
    // GraftCatalogSpec pins the precision gain (deleted-key files now
    // excluded).
    "q200_reindex_lookup" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_reidx_q200")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, root, ev.repartition(4, col("user_id"))) // v1
      s.sql(s"CALL graft.index_bloom('$root', 'user_id')")              // v2
      s.sql(s"CALL graft.delete_where('$root', 'user_id % 3 = 0', true)") // v3
      s.sql(s"CALL graft.reindex('$root', 'user_id')")                  // v4
      val keys = s.range(0, 30).select(col("id").cast("string").as("k"))
      val files = VersionedTable.bloomCandidateFiles(s, root, "user_id", keys)
      VersionedTable.readSubset(s, root, files)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // Metadata-only min/max over a TIMESTAMP column: the commit records
    // the parquet logical annotation as the stat's unit (ColStat.unit =
    // "ts-micros"), which is what makes an INT64 bound provably epoch
    // micros — so min(ts)/max(ts) answer from the manifest, and stay
    // answerable AFTER a vectored delete through the survivor-exact
    // live stats. Both snapshots hash against the oracle's recompute
    // from raw events (epoch_us both sides); MetaAggregateSpec pins the
    // zero-relation plans.
    "q201_meta_ts" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_meta_q201")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"))
      VersionedTable.create(s, root,
        ev.repartitionByRange(4, col("event_id")))                      // v1
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 5 === 0)                                      // v2
      def snap(v: Int, tag: String) =
        s.read.format("graft-versioned").option("versionAsOf", v.toString)
          .load(root)
          .agg(count(lit(1)).as("n"), min(col("ts")).as("mn"),
            max(col("ts")).as("mx"), count(col("ts")).as("n_ts"))
          .select(lit(tag).as("tag"), col("n"),
            unix_micros(col("mn")).as("lo_us"),
            unix_micros(col("mx")).as("hi_us"), col("n_ts"))
      snap(1, "v1_full").unionByName(snap(2, "v2_after_delete"))
    }),

    // Merge-on-read UPDATE through SQL (CALL graft.update_where): rows
    // matching the predicate vector away and re-land with the SET
    // assignments applied over the OLD row — one commit, no target file
    // rewrites (the scattered-predicate shape where copy-on-write would
    // rewrite nearly every file at 100 TB). The rollup and the version
    // ledger hash against the raw recompute; DeletionVectorSpec pins
    // old-row SET semantics (swap) and the carried file set.
    "q204_sql_update" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_update_q204")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root, ev.repartition(4))               // v1
      s.sql(s"CALL graft.update_where('$root', 'event_id % 6 = 0', " +
        "'value = value + 50 ; event_type = concat(event_type, ''_u'')')") // v2
      val rollup = VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("event_type").as("tag"), col("n"), col("sum_value"))
      val meta = s.sql(s"CALL graft.history('$root')")
        .agg(max(col("version")).cast("bigint").as("n"),
          max(col("n_live_rows")).cast("double").as("sum_value"))
        .select(lit("_versions").as("tag"), col("n"), col("sum_value"))
      rollup.unionByName(meta)
    }),

    // The disjoint-file conflict taxonomy, end to end: a streaming-style
    // APPEND lands inside a vectored DELETE's commit window (the race is
    // injected deterministically through the commit seam), and BOTH
    // commit — the delete loses the version CAS, proves the interleaved
    // append's file footprint disjoint from its own, rebases its
    // vectors onto the new head, and publishes on top. Semantics are
    // snapshot-at-read (the WriteSerializable shape): appended rows are
    // NOT subject to the delete's predicate even where they match it —
    // the 'raced_matching' row counts exactly those survivors. At
    // 100 TB this is what lets continuous ingest and GDPR erasure run
    // concurrently instead of the DML starving on refuse-and-rescan.
    "q205_concurrent_dml" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_ccd_q205")
      val root = work.resolve("li").toString
      val li = Tables.lineitem(s, d)
      VersionedTable.create(s, root,
        li.filter(col("l_orderkey") <= 30000)
          .repartitionByRange(4, col("l_orderkey")))                  // v1
      // The race seam is a process-global one-shot consumed by the NEXT
      // commitDelta anywhere; clear it in a finally so a failure before
      // (or inside) the delete can't leak the racer into an unrelated
      // table's commit window.
      VersionedTable.raceBeforePublish = () =>
        VersionedTable.append(s, root,
          li.filter(col("l_orderkey") > 30000).repartition(2))        // v2 races in
      val v =
        try VersionedTable.deleteWhereVectored(s, root,
          Map("l_orderkey" -> (None, Some(30000L))),
          col("l_quantity") <= 5)                                     // rebases to v3
        finally VersionedTable.raceBeforePublish = VersionedTable.NoRaceHook
      require(v == 3, s"the delete must rebase onto the raced append, got v$v")
      def agg(df: DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
          .select(lit(tag).as("tag"), col("n"), col("revenue"))
      val head = VersionedTable.read(s, root)
      agg(head, "head")
        .unionByName(agg(head.filter(
          col("l_orderkey") > 30000 && col("l_quantity") <= 5),
          "raced_matching"))
        .unionByName(agg(VersionedTable.read(s, root, Some(2)), "v2_appended"))
    }),

    // Field-id column mapping, end to end through the SQL faces: RENAME
    // COLUMN is a metadata-only commit (zero data files move — the spec
    // pins the file set; here the HASH pins the semantics), a
    // merge-on-read DELETE then runs against the NEW name, an append
    // writes under it (physically landing on the frozen original name),
    // and time travel still reads the pre-rename version under ITS
    // name. At 100 TB a rename without mapping is a full-table rewrite;
    // with it, an O(1) catalog commit — the same class as add_column.
    "q206_column_mapping" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_cm_q206")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      VersionedTable.create(s, root, ev.repartition(4))               // v1
      s.sql(s"CALL graft.rename_column('$root', 'value', 'amount')")  // v2
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("amount") < 10.0 && col("event_type") === "view")         // v3
      VersionedTable.append(s, root,
        ev.filter(col("event_id") % 1000 === 0)
          .withColumnRenamed("value", "amount").repartition(1))       // v4
      def agg(df: DataFrame, vcol: String, tag: String) =
        df.agg(count(lit(1)).as("n"),
          sum(col(vcol).cast("decimal(18,2)")).cast("double").as("sum_amount"))
          .select(lit(tag).as("tag"), col("n"), col("sum_amount"))
      agg(VersionedTable.read(s, root), "amount", "head")
        .unionByName(agg(VersionedTable.read(s, root, Some(1)), "value",
          "v1_time_travel"))
        .unionByName(agg(VersionedTable.read(s, root, Some(3))
          .filter(col("event_type") === "view"), "amount", "v3_views"))
    }),

    // Metadata-only SUM: per-file exact sums attached by
    // CALL graft.index_sums (wrapping Long addition is associative, so
    // Σ per-file sums is BIT-EXACTLY the scan's non-ANSI sum at any
    // partitioning), then a vectored delete whose refresh pass keeps the
    // sums survivor-exact — so the partition dashboard
    // (bucket, count(*), sum(event_id)) answers from the manifest with
    // zero scans EVEN AFTER merge-on-read deletes (MetaAggregateSpec
    // pins the plan). Parquet footers record no sums; this is the index
    // that closes the one aggregate footer stats can't. The oracle
    // recomputes everything from raw events.
    "q202_meta_sums" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_meta_q202")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), (col("user_id") % 8).cast("int").as("bucket"))
      VersionedTable.create(s, root, ev, partitionBy = Seq("bucket"))   // v1
      s.sql(s"CALL graft.index_sums('$root', 'event_id')")              // v2
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 9 === 0)                                      // v3
      // count, exact sum AND integral avg all answer from the manifest
      // with zero scans (avg = exact long total ÷ live count — sound
      // here because the snapshot's worst-case Σ|v| is far under 2^53,
      // where the scan's double buffer is exact on any addition order;
      // MetaAggregateSpec pins both the plan and the refusal past the
      // bound)
      s.read.format("graft-versioned").load(root)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"),
          avg(col("event_id")).as("avg_id"))
    }),

    // Metadata aggregates over MONEY: decimal(12,2) sums index as exact
    // unscaled longs (CALL graft.index_sums now takes decimal columns),
    // a vectored delete refreshes them survivor-exact, and the grouped
    // dashboard (bucket, count, sum, avg) answers from the MANIFEST with
    // zero scans (MetaAggregateSpec pins the plan) — including avg,
    // whose decimal division runs through Spark's own Average evaluate
    // expression so precision/rounding are bit-identical to a scan.
    // count(DISTINCT bucket) rides the same metadata (per-file
    // single-valued partition values). The oracle recomputes everything
    // from raw events; avg surfaces as exact micros (×10⁶ of the
    // 6-decimal quotient) so DuckDB's integer arithmetic can reproduce
    // Spark's HALF_UP decimal division exactly.
    "q207_meta_decimal" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_dec_q207")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"),
          col("value").cast("decimal(12,2)").as("amount"),
          (col("user_id") % 4).cast("int").as("bucket"))
      VersionedTable.create(s, root, ev, partitionBy = Seq("bucket"))     // v1
      s.sql(s"CALL graft.index_sums('$root', 'amount')")                  // v2
      VersionedTable.deleteWhereVectored(s, root, Map.empty,
        col("event_id") % 7 === 0)                                        // v3
      val t = s.read.format("graft-versioned").load(root)
      val grouped = t.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("amount")).cast("double").as("sum_amount"),
          (avg(col("amount")) * lit(1000000)).cast("long").as("avg_micros"))
        .select(col("bucket").cast("long").as("bucket"), col("n"),
          col("sum_amount"), col("avg_micros"))
      val global = t.agg(countDistinct(col("bucket")).as("n"))
        .select(lit(-1L).as("bucket"), col("n"),
          lit(null).cast("double").as("sum_amount"),
          lit(null).cast("long").as("avg_micros"))
      grouped.unionByName(global)
    }),

    // OPTIMIZE…ZORDER as a commit (CALL graft.zorder): a deliberately
    // scattered events table is rewritten Morton-ordered on
    // (event_id, user_id), then the 2-D box query runs through the
    // versioned relation — its result must hash-match the raw recompute
    // (clustering may never change answers), while ZOrderSpec pins the
    // layout property itself (per-file ranges narrow on BOTH dimensions;
    // the box and each single-dimension predicate prune files). At
    // 100 TB this is the difference between opening one zone and
    // scanning the table for multi-column dashboards.
    "q203_zorder_prune" -> ((s, d) => {
      val work = EventsStream.scratchDir("graft_zorder_q203")
      val root = work.resolve("ev").toString
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
      VersionedTable.create(s, root, ev.repartition(8))               // v1
      s.sql(s"CALL graft.zorder('$root', 'event_id,user_id', 32768)") // v2
      s.read.format("graft-versioned").load(root)
        .filter(col("event_id").between(100, 900) &&
          col("user_id").between(5, 40)) // in-domain at every test SF
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // File-level HLL registers as a queryable index: a key-partitioned
    // history (4 hash-disjoint user files + an appended batch whose keys
    // are ALL repeats) is indexed with per-file registers; the skip
    // decision (hllRelevantFiles) proves the repeat files register-
    // dominated, and the distinct-user ESTIMATE is computed from ONLY
    // the surviving files — by the pointwise-max algebra that subset
    // reproduces the full register set bit-identically, which is exactly
    // what the oracle gate checks (DuckDB computes the same estimate
    // from the raw events, file boundaries drop out). The exact count
    // rides along as the error audit (q151/q121 discipline). At 100 TB
    // the registers make per-partition distinct-count dashboards a
    // manifest read: files × 64 bytes, no data scan.
    "q188_hll_file_skip" -> ((s, d) => {
      import graft.ext.Sketches._
      val m = HllBuckets
      val work = EventsStream.scratchDir("graft_q188").toString
      val root = s"$work/users"
      val ev = Tables.events(s, d).select(col("user_id"))
      VersionedTable.create(s, root, ev.repartition(4, col("user_id")))
      VersionedTable.append(s, root,
        ev.filter(col("user_id") % 2 === 0).repartition(2, col("user_id")))
      VersionedTable.indexHll(s, root, Seq("user_id"))
      val relevant = VersionedTable.hllRelevantFiles(s, root, "user_id").get
      val regs = hllRegisters(
        VersionedTable.readSubset(s, root, relevant), col("user_id"))
      val harmonic =
        aggregate(col("rs"), lit(0.0), (acc, rr) =>
          acc + lit(1.0) /
            call_function("shiftleft", lit(1L), rr("mx").cast("int")).cast("double")) +
          (lit(m) - col("nb")).cast("double")
      val est = regs
        .agg(sort_array(collect_list(struct(col("bucket"), col("mx")))).as("rs"),
             count(lit(1)).as("nb"))
        .select((hllAlphaM2 / harmonic).as("eraw"),
          (lit(m) - col("nb")).as("nv"))
        .select(round(when(col("eraw") <= 2.5 * m && col("nv") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("nv").cast("double")))
          .otherwise(col("eraw")), 6).as("est"))
      val exact = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.crossJoin(exact) // [bounded: 1 row each]
        .select(col("est"), col("n_exact"),
          round(abs(col("est") - col("n_exact").cast("double")) /
            nullif(col("n_exact"), lit(0L)).cast("double"), 6).as("err"))
    })
  )

  def oracle: Map[String, String] = Map(
    // Full recompute over the post-merge state — the refreshed MV must
    // equal it exactly (decimal partials are associative).
    "q160_incr_mv_refresh" ->
      """WITH base AS (SELECT * FROM events WHERE event_id % 3 <> 0),
           ups AS (SELECT event_id, ts, user_id, event_type,
                          value * 2 AS value, props
                   FROM events WHERE event_id % 3 <> 0 AND event_id % 5 = 0),
           ins AS (SELECT * FROM events WHERE event_id % 3 = 0),
           srcu AS (SELECT * FROM ups UNION ALL SELECT * FROM ins),
           v2 AS (SELECT * FROM srcu
                  UNION ALL
                  SELECT * FROM base
                  WHERE event_id NOT IN (SELECT event_id FROM srcu))
         SELECT user_id, count(*)::BIGINT AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM v2 GROUP BY 1""",

    // The staged versioned round-trip must be invisible to the result.
    "q166_versioned_sql" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-07-01'
         GROUP BY 1""",

    // The three-commit streamed feed must re-assemble the batch table.
    "q175_stream_table_feed" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents GROUP BY 1""",

    // Source->sink round-trip + full replay must be invisible.
    "q184_stream_table_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS sum_chars
         FROM documents GROUP BY 1""",

    // The snapshot must be txn 2's CONSISTENT state of both tables: the
    // cut-1997 rollups, untouched by the crashed table-level overwrite.
    "q187_txn_snapshot" ->
      """WITH o AS (SELECT * FROM orders
                    WHERE o_orderdate < TIMESTAMP '1997-01-01'),
           a AS (SELECT o_custkey, count(*)::BIGINT AS n,
                        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
                 FROM o GROUP BY 1),
           b AS (SELECT date_trunc('month', o_orderdate)::DATE AS month,
                        count(*)::BIGINT AS n,
                        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                 FROM o GROUP BY 1)
         SELECT 'by_cust' AS src, count(*)::BIGINT AS n_groups,
                sum(n)::BIGINT AS n_orders, sum(total)::DOUBLE AS total
         FROM a
         UNION ALL
         SELECT 'by_month' AS src, count(*)::BIGINT AS n_groups,
                sum(n)::BIGINT AS n_orders, sum(rev)::DOUBLE AS total
         FROM b""",

    // Same consistent snapshot as q187, through the SQL face.
    "q190_txn_sql_face" ->
      """WITH o AS (SELECT * FROM orders
                    WHERE o_orderdate < TIMESTAMP '1997-01-01'),
           a AS (SELECT o_custkey, count(*)::BIGINT AS n,
                        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
                 FROM o GROUP BY 1),
           b AS (SELECT date_trunc('month', o_orderdate)::DATE AS month,
                        count(*)::BIGINT AS n,
                        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                 FROM o GROUP BY 1)
         SELECT 'by_cust' AS src, count(*)::BIGINT AS n_groups,
                sum(n)::BIGINT AS n_orders, sum(total)::DOUBLE AS total
         FROM a
         UNION ALL
         SELECT 'by_month' AS src, count(*)::BIGINT AS n_groups,
                sum(n)::BIGINT AS n_orders, sum(rev)::DOUBLE AS total
         FROM b""",

    // The four pinned-view rollups recomputed from raw orders at both
    // cuts — the current pair from the 1997 cut, the time-traveled pair
    // from the 1995 cut.
    "q209_constraints" ->
      // the oracle recomputes the FINAL table assuming the violating
      // batch was refused exactly once and landed only after the drop;
      // 'refused' carries (1, live-constraint-count 0) as literals —
      // any enforcement failure shifts head's n AND sum off the oracle
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
              head AS (
                SELECT value FROM ev WHERE event_id % 3 = 0
                UNION ALL SELECT value FROM ev WHERE event_id % 3 = 1
                UNION ALL SELECT value + 2000000.0 FROM ev WHERE event_id % 3 = 2)
         SELECT 'head' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM head
         UNION ALL
         SELECT 'refused', 1::BIGINT, 0.0""",

    // The defaulted table must equal the rollup where every even-key
    // row carries 'backfill' and every odd-key row 'live', minus the
    // deleted (backfill, R) slice — substitution and the DML both
    // invisible in the result.
    "q212_default_values" ->
      """WITH li AS (SELECT l_orderkey, l_quantity, l_returnflag
                     FROM lineitem),
              tagged AS (
                SELECT l_quantity, l_returnflag, 'backfill' AS source
                FROM li WHERE l_orderkey % 2 = 0
                UNION ALL
                SELECT l_quantity, l_returnflag, 'live'
                FROM li WHERE l_orderkey % 2 = 1),
              surv AS (SELECT * FROM tagged
                       WHERE NOT (source = 'backfill' AND l_returnflag = 'R'))
         SELECT source, count(*)::BIGINT AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_qty
         FROM surv GROUP BY 1""",

    // The evolved, vector-deleted table must equal the plain rollup of
    // surviving events — layouts and vectors invisible in the result.
    // Survivor rule mirrors the delete set: deleted where the predicate
    // IS TRUE, so NULL values survive.
    // The evolved, merged table must equal the rollup where every third
    // order is re-priced and prioritized and the rest read NULL.
    "q215_merge_evolve" ->
      """WITH cur AS (
           SELECT o_totalprice, NULL AS o_orderpriority
           FROM orders WHERE o_orderkey % 3 <> 0
           UNION ALL
           SELECT o_totalprice * 2, o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0)
         SELECT COALESCE(o_orderpriority, 'none') AS prio,
                count(*)::BIGINT AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM cur GROUP BY 1""",

    // The widened, vector-deleted table must equal the plain rollup of
    // surviving quantities — the physical int32/int64 split invisible.
    "q214_type_widening" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
                sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
         FROM lineitem
         WHERE CAST(l_quantity AS BIGINT) < 45
         GROUP BY 1""",

    // Both pruned faces recomputed from raw events: the layouts and
    // the pruning decisions must be invisible in the result.
    "q213_partition_transforms" ->
      """WITH b AS (SELECT date_trunc('day', min(ts)) AS t0 FROM events),
              win AS (SELECT e.* FROM events e, b
                      WHERE e.ts >= b.t0 + INTERVAL 2 DAY
                        AND e.ts <  b.t0 + INTERVAL 5 DAY)
         SELECT 'range' AS face, event_type AS k, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM win GROUP BY 1, 2
         UNION ALL
         SELECT 'point', CAST(user_id AS VARCHAR), count(*)::BIGINT,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events WHERE user_id = 7 GROUP BY 1, 2""",

    "q211_partition_evolution" ->
      """SELECT event_type, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (value < 10.0) OR value IS NULL
         GROUP BY 1""",

    // The WAP pipeline's three faces recomputed from raw orders: head =
    // v1 (≤1995) plus the audited 1996 delivery (the violating 1997
    // batch refused on the branch, so it contributes NOTHING); the tag
    // re-reads v1 exactly, even after expire keep_last=1; 'audit' pins
    // (main's count during staging, refused=1 + live constraints=1).
    "q210_wap" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice,
                           o_orderdate FROM orders),
              v1 AS (SELECT * FROM o WHERE year(o_orderdate) <= 1995),
              a96 AS (SELECT * FROM o WHERE year(o_orderdate) = 1996),
              head AS (SELECT * FROM v1 UNION ALL SELECT * FROM a96)
         SELECT 'head' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM head
         UNION ALL
         SELECT 'tag_train_v1', count(*)::BIGINT,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM v1
         UNION ALL
         SELECT 'audit', (SELECT count(*) FROM v1)::BIGINT, 2.0""",

    "q216_replace_where" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice,
                              CAST(year(o_orderdate) AS INT) AS yr
                       FROM orders),
              fin AS (SELECT yr, o_totalprice FROM base WHERE yr <> 1996
                      UNION ALL
                      SELECT yr, o_totalprice * 2 FROM base
                      WHERE yr = 1996 AND o_orderkey % 2 = 0)
         SELECT yr, count(*)::BIGINT AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM fin GROUP BY yr""",

    "q217_identity" ->
      """WITH d AS (SELECT doc_id FROM documents),
              a AS (SELECT count(*)::BIGINT AS na FROM d
                    WHERE doc_id % 3 <> 0)
         SELECT (SELECT count(*) FROM d)::BIGINT AS n,
                na AS n_assigned, na AS n_distinct,
                1 AS all_ge_start
         FROM a""",

    "q218_generated" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
                count(*)::BIGINT AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM orders GROUP BY yr""",

    "q222_table_changes" ->
      """WITH ev AS (SELECT event_id, value FROM events),
              v3s AS (SELECT event_id,
                             CASE WHEN event_id % 5 = 0 THEN value * 2
                                  ELSE value END AS value
                      FROM ev),
              chg AS (
                SELECT 1::BIGINT AS _commit_version,
                       'insert' AS _change_type, value
                FROM ev WHERE event_id % 2 = 0
                UNION ALL
                SELECT 2, 'insert', value FROM ev WHERE event_id % 2 = 1
                UNION ALL
                SELECT 3, 'delete', value FROM ev
                WHERE event_id % 5 = 0
                  AND value IS DISTINCT FROM value * 2
                UNION ALL
                SELECT 3, 'insert', value * 2 FROM ev
                WHERE event_id % 5 = 0
                  AND value IS DISTINCT FROM value * 2
                UNION ALL
                SELECT 4, 'delete', value FROM v3s WHERE event_id % 7 = 0)
         SELECT _commit_version, _change_type, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_value
         FROM chg GROUP BY 1, 2""",

    "q239_op_metrics" ->
      """WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
              c_all AS (SELECT count(*) AS n FROM o),
              c5    AS (SELECT count(*) AS n FROM o WHERE k % 5 = 0),
              upd   AS (SELECT count(*) AS n FROM o
                        WHERE k % 7 = 0 AND NOT k % 5 = 0),
              live  AS (SELECT (SELECT n FROM c_all) - (SELECT n FROM c5)
                          AS n)
         SELECT 1::BIGINT AS version, 'create' AS op,
                0::BIGINT AS rows_added, 0::BIGINT AS rows_removed,
                0::BIGINT AS dv_rows_deleted
         UNION ALL
         SELECT 2, 'append', (SELECT n FROM c_all), 0, 0
         UNION ALL
         SELECT 3, 'delete-vectored', 0, 0, (SELECT n FROM c5)
         UNION ALL
         SELECT 4, 'update-vectored', (SELECT n FROM upd), 0,
                (SELECT n FROM upd)
         UNION ALL
         SELECT 5, 'compact', (SELECT n FROM live), (SELECT n FROM live),
                0""",

    "q238_replace_insert" ->
      """SELECT o_orderpriority AS cat, count(*) AS n,
                CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                  AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1
         UNION ALL
         SELECT 'v2', count(*),
                CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                  AS DECIMAL(18,2))) AS DOUBLE)
         FROM orders WHERE o_orderkey % 3 = 0""",

    "q237_describe_sql" ->
      """WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
              c_even AS (SELECT count(*) AS n FROM o WHERE k % 2 = 0),
              c_ten  AS (SELECT count(*) AS n FROM o WHERE k % 10 = 0),
              c_sev  AS (SELECT count(*) AS n FROM o WHERE k % 7 = 0)
         SELECT 1::BIGINT AS version, 'create' AS op,
                0::BIGINT AS live, 0::BIGINT AS deleted
         UNION ALL
         SELECT 2, 'append', (SELECT n FROM c_even), 0
         UNION ALL
         SELECT 3, 'delete-vectored',
                (SELECT n FROM c_even) - (SELECT n FROM c_ten),
                (SELECT n FROM c_ten)
         UNION ALL
         SELECT 4, 'copy-into',
                (SELECT n FROM c_even) - (SELECT n FROM c_ten)
                  + (SELECT n FROM c_sev),
                (SELECT n FROM c_ten)
         UNION ALL
         SELECT 99, 'detail',
                (SELECT n FROM c_even) - (SELECT n FROM c_ten)
                  + (SELECT n FROM c_sev),
                1""",

    "q236_stream_named" ->
      """SELECT o_orderpriority AS prio, count(*)::BIGINT AS n,
                CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                  AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1""",

    "q235_copy_into" ->
      """WITH agg AS (
              SELECT count(*)::BIGINT AS n_rows,
                     CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                       AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
              FROM orders),
              steps AS (
                SELECT 0::BIGINT AS step, 2::BIGINT AS files_loaded
                UNION ALL SELECT 1, 0
                UNION ALL SELECT 2, 1)
         SELECT s.step, s.files_loaded, a.n_rows, a.sum_v
         FROM steps s CROSS JOIN agg a""",

    "q243_namespaced_catalog" ->
      """WITH base AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(o_totalprice AS DOUBLE) AS price,
                     o_orderpriority AS prio
              FROM orders),
              ins AS (
                SELECT k + 100000000 AS k, price, 'SYNTH' AS prio
                FROM base WHERE k % 50 = 0),
              allr AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
              upd AS (SELECT k,
                        CASE WHEN k % 20 = 0 THEN price + 10.0
                             ELSE price END AS price, prio
                      FROM allr),
              del AS (SELECT * FROM upd WHERE k % 30 <> 0)
         SELECT prio, count(*)::BIGINT AS n,
                CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                0::BIGINT AS n_bronze, 1::BIGINT AS n_silver,
                5::BIGINT AS n_commits
         FROM del GROUP BY prio""",

    "q241_stream_from_ts" ->
      """SELECT event_type, count(*)::BIGINT AS n,
                CAST(sum(CAST(CAST(value AS DOUBLE)
                  AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id % 3 IN (1, 2)
         GROUP BY event_type""",

    "q240_copy_formats" ->
      """WITH csv_agg AS (
              SELECT count(*)::BIGINT AS n_rows,
                     CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                       AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
              FROM orders),
              json_agg AS (
                SELECT count(*)::BIGINT AS n_rows,
                       CAST(sum(CAST(CAST(o_totalprice AS DOUBLE)
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
                FROM orders WHERE o_orderkey % 3 IN (0, 2)),
              csv_steps AS (
                SELECT 'csv' AS tab, 0::BIGINT AS step, 2::BIGINT AS files_loaded
                UNION ALL SELECT 'csv', 1, 0
                UNION ALL SELECT 'csv', 2, 1),
              json_steps AS (
                SELECT 'json' AS tab, 0::BIGINT AS step, 2::BIGINT AS files_loaded
                UNION ALL SELECT 'json', 1, 0)
         SELECT s.tab, s.step, s.files_loaded, a.n_rows, a.sum_v
         FROM csv_steps s CROSS JOIN csv_agg a
         UNION ALL
         SELECT s.tab, s.step, s.files_loaded, a.n_rows, a.sum_v
         FROM json_steps s CROSS JOIN json_agg a""",

    "q234_create_restore" ->
      """WITH src AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(o_totalprice AS DOUBLE) AS price,
                     o_orderpriority AS cat
              FROM orders),
              agg_a AS (
                SELECT 'restored' AS tab, cat, count(*)::BIGINT AS n,
                       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_price,
                       CAST(sum(CAST(k * 2.0 AS DECIMAL(18,1))) AS DOUBLE)
                         AS sum_dbl
                FROM src GROUP BY cat),
              agg_b AS (
                SELECT 'recreated' AS tab, cat, count(*)::BIGINT AS n,
                       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_price,
                       CAST(sum(CAST(k * 2.0 AS DECIMAL(18,1))) AS DOUBLE)
                         AS sum_dbl
                FROM src WHERE k % 3 = 0 GROUP BY cat)
         SELECT * FROM agg_a UNION ALL SELECT * FROM agg_b""",

    "q233_merge_full" ->
      """WITH base AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(o_totalprice AS DOUBLE) AS price,
                     'base' AS status
              FROM orders),
              src AS (
                SELECT CAST(o_orderkey AS BIGINT) AS k,
                       CASE WHEN o_orderkey % 2 = 0
                            THEN CAST(o_totalprice AS DOUBLE) * 2.0
                            ELSE CAST(o_totalprice AS DOUBLE) * 0.5
                       END AS price
                FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT CAST(-o_orderkey - 1 AS BIGINT),
                       CASE WHEN o_orderkey % 20 = 0
                            THEN CAST(155.0 AS DOUBLE)
                            ELSE CAST(55.0 AS DOUBLE) END
                FROM orders WHERE o_orderkey % 10 = 0),
              m AS (
                SELECT b.k, b.price AS bp, s.price AS sp,
                       (s.k IS NOT NULL) AS hit
                FROM base b LEFT JOIN src s ON b.k = s.k),
              kept AS (
                SELECT k,
                       CASE WHEN hit AND sp > bp THEN sp
                            ELSE bp END AS price,
                       CASE WHEN hit AND sp > bp THEN 'up'
                            WHEN hit THEN 'down'
                            WHEN k % 5 = 0 THEN 'stale'
                            ELSE 'base' END AS status
                FROM m
                WHERE hit OR NOT (k % 7 = 0)),
              ins AS (
                SELECT s.k, s.price,
                       CASE WHEN s.price > 100.0 THEN 'big'
                            ELSE CAST(NULL AS VARCHAR) END AS status
                FROM src s LEFT JOIN base b ON s.k = b.k
                WHERE b.k IS NULL),
              fin AS (SELECT * FROM kept UNION ALL SELECT * FROM ins),
              agg AS (
                SELECT status, count(*)::BIGINT AS n,
                       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_price
                FROM fin GROUP BY status)
         SELECT 'vec' AS path, status, n, sum_price FROM agg
         UNION ALL
         SELECT 'cow', status, n, sum_price FROM agg""",

    "q232_merge_multi" ->
      """WITH base AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k,
                     CAST(o_totalprice AS DOUBLE) AS price,
                     'base' AS status
              FROM orders),
              src AS (
                SELECT CAST(o_orderkey AS BIGINT) AS k,
                       CASE WHEN o_orderkey % 2 = 0
                            THEN CAST(o_totalprice AS DOUBLE) * 2.0
                            WHEN o_orderkey % 5 = 0
                            THEN CAST(o_totalprice AS DOUBLE) * 0.25
                            ELSE CAST(o_totalprice AS DOUBLE)
                       END AS price
                FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT CAST(-o_orderkey - 1 AS BIGINT),
                       CAST(55.0 AS DOUBLE)
                FROM orders WHERE o_orderkey % 10 = 0),
              m AS (
                SELECT b.k, b.price AS bp, b.status AS bs, s.price AS sp,
                       (s.k IS NOT NULL) AS hit
                FROM base b LEFT JOIN src s ON b.k = s.k),
              kept AS (
                SELECT k,
                       CASE WHEN hit AND sp > bp THEN sp
                            ELSE bp END AS price,
                       CASE WHEN NOT hit THEN bs
                            WHEN sp > bp THEN 'up'
                            ELSE 'meh' END AS status
                FROM m
                WHERE NOT (hit AND NOT (sp > bp) AND sp < bp * 0.5)),
              ins AS (
                SELECT s.k, s.price, CAST(NULL AS VARCHAR) AS status
                FROM src s LEFT JOIN base b ON s.k = b.k
                WHERE b.k IS NULL),
              fin AS (SELECT * FROM kept UNION ALL SELECT * FROM ins),
              agg AS (
                SELECT status, count(*)::BIGINT AS n,
                       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_price
                FROM fin GROUP BY status)
         SELECT 'vec' AS path, status, n, sum_price FROM agg
         UNION ALL
         SELECT 'cow', status, n, sum_price FROM agg""",

    "q231_files_report" ->
      """WITH mx AS (SELECT max(c_custkey) AS mk FROM customer),
              t AS (SELECT mk // 5 AS t1, mk // 2 AS t2 FROM mx),
              base AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
              f AS (
                SELECT 1 AS fid, k, (k % 5 = 0) AS del
                FROM base, t WHERE k <= t1
                UNION ALL
                SELECT 2, k, false FROM base, t WHERE k > t1 AND k <= t2
                UNION ALL
                SELECT 3, k, false FROM base, t WHERE k > t2),
              agg AS (
                SELECT fid,
                       count(*)::BIGINT AS n_rows,
                       count(CASE WHEN NOT del THEN 1 END)::BIGINT
                         AS live_rows,
                       count(CASE WHEN del THEN 1 END)::BIGINT AS dv_card,
                       min(CASE WHEN NOT del THEN k END)::BIGINT AS lo_k,
                       max(CASE WHEN NOT del THEN k END)::BIGINT AS hi_k,
                       sum(CASE WHEN NOT del THEN k END)::BIGINT AS sum
                FROM f GROUP BY fid)
         SELECT n_rows AS "rows", live_rows, dv_card, true AS has_bytes,
                true AS bloomed, lo_k, hi_k, 0::BIGINT AS nulls,
                true AS live, sum
         FROM agg""",

    "q230_stream_rowid_pairs" ->
      """WITH ev AS (
              SELECT event_id, CAST(value AS DOUBLE) AS value FROM events),
              p0 AS (
                SELECT 0 AS step, count(*) AS n_pairs,
                       sum(CAST(1000.0 AS DECIMAL(18,2))) AS sum_delta
                FROM ev WHERE event_id % 4 = 0
                  AND (value + 1000.0) IS DISTINCT FROM value),
              p1 AS (
                SELECT 1 AS step, count(*) AS n_pairs,
                       sum(CAST(CASE WHEN event_id % 4 = 0
                                     THEN value + 1000.0 ELSE value END
                           AS DECIMAL(18,2))) AS sum_delta
                FROM ev WHERE event_id % 6 = 0
                  AND (CASE WHEN event_id % 4 = 0
                            THEN value + 1000.0 ELSE value END) * 2.0
                      IS DISTINCT FROM
                      (CASE WHEN event_id % 4 = 0
                            THEN value + 1000.0 ELSE value END)),
              u AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1)
         SELECT step::BIGINT AS step, n_pairs::BIGINT AS n_pairs,
                CAST(sum_delta AS DOUBLE) AS sum_delta,
                0::BIGINT AS replayed
         FROM u""",

    "q229_merge_when" ->
      """WITH base AS (
              SELECT CAST(s_suppkey AS BIGINT) AS k,
                     CAST(s_acctbal AS DOUBLE) AS bal,
                     CAST(s_nationkey AS BIGINT) AS nk
              FROM supplier),
              src AS (
                SELECT CAST(s_suppkey AS BIGINT) AS k,
                       CASE WHEN s_suppkey % 2 = 0
                            THEN CAST(s_acctbal AS DOUBLE) + 1000.0
                            ELSE CAST(s_acctbal AS DOUBLE) - 1000.0
                       END AS bal
                FROM supplier WHERE s_suppkey % 3 = 0
                UNION ALL
                SELECT CAST(-s_suppkey - 1 AS BIGINT),
                       CAST(77.0 AS DOUBLE)
                FROM supplier WHERE s_suppkey % 10 = 0),
              upd AS (
                SELECT b.k,
                       CASE WHEN s.k IS NOT NULL AND s.bal > b.bal
                            THEN s.bal ELSE b.bal END AS bal,
                       b.nk
                FROM base b LEFT JOIN src s ON b.k = s.k),
              ins AS (
                SELECT s.k, s.bal, CAST(NULL AS BIGINT) AS nk
                FROM src s LEFT JOIN base b ON s.k = b.k
                WHERE b.k IS NULL),
              fin AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
              agg AS (
                SELECT count(*)::BIGINT AS n,
                       CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_bal,
                       count(CASE WHEN nk IS NULL THEN 1 END)::BIGINT
                         AS n_null_nk
                FROM fin)
         SELECT 'vec' AS path, n, sum_bal, n_null_nk FROM agg
         UNION ALL
         SELECT 'cow', n, sum_bal, n_null_nk FROM agg""",

    "q228_named_catalog" ->
      """WITH base AS (
              SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bal,
                     c_mktsegment AS seg
              FROM customer
              UNION ALL
              SELECT c_custkey + 1000000, CAST(10.0 AS DOUBLE), 'SYNTH'
              FROM customer WHERE c_custkey % 11 = 0),
              upd AS (
                SELECT k, CASE WHEN k % 10 = 0 THEN bal + 50.0
                               ELSE bal END AS bal, seg
                FROM base),
              fin AS (SELECT * FROM upd WHERE k % 13 <> 0)
         SELECT seg, count(*)::BIGINT AS n,
                CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
                (SELECT count(*) FROM customer)::BIGINT AS v2_rows,
                5::BIGINT AS n_commits
         FROM fin GROUP BY seg""",

    "q227_sql_dml" ->
      """WITH base AS (
              SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price
              FROM orders
              UNION ALL
              SELECT o_orderkey + 10000000 AS k, CAST(50.0 AS DOUBLE)
              FROM orders WHERE o_orderkey % 13 = 0),
              upd AS (
                SELECT k, CASE WHEN k % 10 = 0 THEN price + 100.0
                               ELSE price END AS price
                FROM base),
              fin AS (SELECT * FROM upd WHERE k % 7 <> 0)
         SELECT count(*)::BIGINT AS n,
                CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price,
                count(CASE WHEN k >= 10000000 THEN 1 END)::BIGINT
                  AS n_inserted
         FROM fin""",

    "q226_histogram" ->
      """WITH mx AS (SELECT max(c_custkey) AS mk FROM customer),
              f AS (
                SELECT min(c_custkey)::DOUBLE AS flo,
                       max(c_custkey)::DOUBLE AS fhi,
                       count(*)::DOUBLE AS n
                FROM customer, mx WHERE c_custkey <= mk // 5
                UNION ALL
                SELECT min(c_custkey)::DOUBLE, max(c_custkey)::DOUBLE,
                       count(*)::DOUBLE
                FROM customer, mx
                WHERE c_custkey > mk // 5 AND c_custkey <= mk // 2
                UNION ALL
                SELECT min(c_custkey)::DOUBLE, max(c_custkey)::DOUBLE,
                       count(*)::DOUBLE
                FROM customer, mx WHERE c_custkey > mk // 2),
              g AS (SELECT min(flo) AS lo,
                           (max(fhi) - min(flo)) / 8 AS w FROM f),
              b AS (SELECT i::INT AS bucket, lo + w * i AS bl,
                           lo + w * (i + 1) AS bh
                    FROM g, range(8) t(i)),
              e AS (SELECT bucket, bl, bh,
                           sum(n * greatest(0, least(bh, fhi) -
                               greatest(bl, flo)) / (fhi - flo)) AS est
                    FROM b, f GROUP BY 1, 2, 3)
         SELECT bucket, round(bl, 6) AS lo, round(bh, 6) AS hi,
                round(est, 6) AS est_rows
         FROM e""",

    "q224_vacuum" ->
      """WITH nc AS (SELECT count(*) AS c FROM nation),
              rc AS (SELECT count(*) AS c FROM region),
              ac AS (SELECT count(*) AS c FROM nation
                     WHERE n_nationkey % 5 = 0)
         SELECT 2::BIGINT AS n_manifests, 1::BIGINT AS n_data,
                true AS bytes_positive, nc.c::BIGINT AS v1_rows,
                (rc.c + ac.c)::BIGINT AS rows_after
         FROM nc, rc, ac""",

    "q225_sql_ddl" ->
      """SELECT 'std' AS grade, count(*)::BIGINT AS n,
                CAST(sum(CAST(CAST(s_acctbal AS DOUBLE) * 2
                  AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal2,
                1::BIGINT AS refused
         FROM supplier GROUP BY 1""",

    "q223_row_tracking" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer),
              n AS (SELECT count(*) AS nc FROM c),
              ins AS (SELECT count(*) AS ni FROM c WHERE k % 13 = 0)
         SELECT (nc + ni)::BIGINT AS n_rows,
                nc::BIGINT AS n_stable,
                ni::BIGINT AS n_fresh,
                (nc + ni)::BIGINT AS n_distinct
         FROM n, ins""",

    "q221_not_null" ->
      """SELECT count(*)::BIGINT AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price,
                1::BIGINT AS refused
         FROM orders""",

    "q220_cdc_pipeline" ->
      """WITH fin AS (SELECT event_id, user_id,
                             CASE WHEN event_id % 5 = 0 THEN value * 2
                                  ELSE value END AS value
                      FROM events WHERE event_id % 7 <> 0)
         SELECT user_id, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_value
         FROM fin GROUP BY user_id""",

    "q219_apply_changes" ->
      """WITH chg AS (SELECT o_custkey AS k, o_orderkey AS seq,
                             o_totalprice AS bal FROM orders),
              win AS (SELECT k, seq, bal, row_number() OVER
                        (PARTITION BY k ORDER BY seq DESC) AS rn
                      FROM chg),
              fin0 AS (SELECT c_custkey AS k, 0::BIGINT AS seq,
                              CAST(c_acctbal AS DOUBLE) AS bal
                       FROM customer
                       WHERE c_custkey NOT IN (SELECT k FROM chg)
                       UNION ALL
                       SELECT k, seq, bal FROM win WHERE rn = 1),
              fin AS (SELECT * FROM fin0 WHERE k % 97 <> 0)
         SELECT k % 10 AS bucket, count(*)::BIGINT AS n,
                CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
                sum(seq)::BIGINT AS sum_seq
         FROM fin GROUP BY bucket""",

    "q208_sql_txn" ->
      """WITH cur AS (SELECT * FROM orders
                      WHERE o_orderdate < TIMESTAMP '1997-01-01'),
              old AS (SELECT * FROM orders
                      WHERE o_orderdate < TIMESTAMP '1995-01-01'),
              cc AS (SELECT o_custkey, count(*)::BIGINT AS n,
                            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
                     FROM cur GROUP BY 1),
              cp AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
                            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
                     FROM cur GROUP BY 1),
              oc AS (SELECT o_custkey, count(*)::BIGINT AS n,
                            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
                     FROM old GROUP BY 1),
              op AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
                            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
                     FROM old GROUP BY 1)
         SELECT 'cur_cust' AS tag, count(*)::BIGINT AS n_groups,
                sum(n)::BIGINT AS n_orders, sum(t)::DOUBLE AS total FROM cc
         UNION ALL
         SELECT 'cur_prio', count(*)::BIGINT, sum(n)::BIGINT,
                sum(t)::DOUBLE FROM cp
         UNION ALL
         SELECT 'old_cust', count(*)::BIGINT, sum(n)::BIGINT,
                sum(t)::DOUBLE FROM oc
         UNION ALL
         SELECT 'old_prio', count(*)::BIGINT, sum(n)::BIGINT,
                sum(t)::DOUBLE FROM op""",

    // The streamed, deduped, txn-committed MV must equal the one-shot
    // batch rollup — slices, duplicate delivery, replay and the catalog
    // all invisible in the result.
    "q189_txn_stream_mv" ->
      """SELECT user_id, count(*)::BIGINT AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1""",

    // Three snapshots of the vectored-delete history, recomputed from the
    // raw table: v1 = everything (time travel over the vectors), v2 =
    // first delete's survivors, v3 = both deletes'. NOT of a non-null
    // predicate matches the engine's IS-TRUE delete-set rule here.
    "q191_dv_delete" ->
      """WITH base AS (SELECT * FROM lineitem),
           v2 AS (SELECT * FROM base
                  WHERE NOT (l_orderkey BETWEEN 1000 AND 20000
                             AND l_quantity <= 10)),
           v3 AS (SELECT * FROM v2
                  WHERE NOT (l_orderkey BETWEEN 15000 AND 40000
                             AND l_returnflag = 'A'))
         SELECT 'v1' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM base
         UNION ALL
         SELECT 'v2_after_d1', count(*)::BIGINT,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM v2
         UNION ALL
         SELECT 'v3_after_d2', count(*)::BIGINT,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM v3""",

    // The CDC-removed rollup must equal the delete set; the post-
    // compaction head must equal its complement.
    "q192_dv_cdc" ->
      """SELECT 'head' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events
         WHERE NOT (event_type = 'click' AND user_id % 7 = 0)
         UNION ALL
         SELECT 'removed', count(*)::BIGINT,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events
         WHERE event_type = 'click' AND user_id % 7 = 0""",

    // Post-merge state recomputed from raw events: survivors of the base
    // (not upserted, not deleted) + the upserted/inserted source rows.
    "q193_dv_merge" ->
      """WITH base AS (SELECT event_id, user_id, event_type, value
                       FROM events WHERE event_id % 3 <> 0),
           ups AS (SELECT event_id, user_id, event_type, value * 2 AS value
                   FROM base WHERE event_id % 5 = 0),
           ins AS (SELECT event_id, user_id, event_type, value
                   FROM events WHERE event_id % 3 = 0),
           src AS (SELECT * FROM ups UNION ALL SELECT * FROM ins),
           kept AS (SELECT * FROM base
                    WHERE event_id NOT IN (SELECT event_id FROM src)
                      AND NOT (event_id % 11 = 0 AND event_id % 5 <> 0)),
           v2 AS (SELECT * FROM src UNION ALL SELECT * FROM kept)
         SELECT event_type, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM v2 GROUP BY 1""",

    // The folded changelog must equal the final table state, recomputed
    // from raw events: base (event_id % 3 in {1,2}) merged with the
    // doubled %5 upserts + %3=0 inserts, minus the %7 vectored deletes.
    "q194_cdf_stream" ->
      """WITH base AS (SELECT event_id, user_id, value
                       FROM events WHERE event_id % 3 <> 0),
           ups AS (SELECT event_id, user_id, value * 2 AS value
                   FROM base WHERE event_id % 5 = 0),
           ins AS (SELECT event_id, user_id, value
                   FROM events WHERE event_id % 3 = 0),
           src AS (SELECT * FROM ups UNION ALL SELECT * FROM ins),
           merged AS (SELECT * FROM src
                      UNION ALL
                      SELECT * FROM base
                      WHERE event_id NOT IN (SELECT event_id FROM src)),
           final AS (SELECT * FROM merged WHERE event_id % 7 <> 0)
         SELECT user_id, count(*)::BIGINT AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM final GROUP BY 1""",

    // Both snapshots recomputed from raw events: v2 = everything (the
    // engine answers it from the manifest alone), v3 = the %7 delete's
    // survivors (count from DV cardinalities; min/max/count(col) from
    // the scan the refusal falls back to).
    "q195_meta_agg" ->
      """WITH ev AS (SELECT event_id,
                            CASE WHEN event_id % 4 <> 0 THEN user_id END
                              AS v_null
                     FROM events)
         SELECT 'v2_full' AS tag, count(*)::BIGINT AS n,
                count(v_null)::BIGINT AS n_nonnull,
                min(event_id) AS lo, max(event_id) AS hi
         FROM ev
         UNION ALL
         SELECT 'v3_after_delete', count(*)::BIGINT,
                count(v_null)::BIGINT, min(event_id), max(event_id)
         FROM ev WHERE event_id % 7 <> 0""",

    // The partition dashboard recomputed from raw events — any drift in
    // the per-file row counts, null counts, bounds, or the per-file
    // WHERE decision breaks the hash.
    "q196_meta_filter_group" ->
      """WITH ev AS (SELECT event_id,
                            CAST(user_id % 8 AS INTEGER) AS bucket,
                            CASE WHEN event_id % 6 <> 0 THEN event_id END
                              AS e_null
                     FROM events)
         SELECT bucket, count(*)::BIGINT AS n,
                count(e_null)::BIGINT AS n_nonnull,
                min(event_id) AS lo, max(event_id) AS hi
         FROM ev WHERE bucket BETWEEN 2 AND 6
         GROUP BY 1""",

    // Every history number recomputed from raw events: the create holds
    // the evens, the append completes the corpus, the vectored delete
    // hides the %5 rows without moving files, the compaction
    // materializes (deleted falls back to 0 in one file).
    "q197_history" ->
      """WITH t AS (SELECT count(*) AS total,
                         count(*) FILTER (WHERE event_id % 2 = 0) AS evens,
                         count(*) FILTER (WHERE event_id % 5 = 0) AS dels
                  FROM events)
         SELECT CAST(1 AS INTEGER) AS version, 'create' AS op,
                CAST(4 AS BIGINT) AS n_files,
                CAST(evens AS BIGINT) AS n_live_rows,
                CAST(0 AS BIGINT) AS n_deleted_rows FROM t
         UNION ALL SELECT 2, 'append', 6, total, 0 FROM t
         UNION ALL SELECT 3, 'delete-vectored', 6, total - dels, dels FROM t
         UNION ALL SELECT 4, 'compact', 1, total - dels, 0 FROM t""",

    // Post-maintenance state + ledger recomputed from raw events: the
    // rollup over the %7 delete's survivors, and (_versions, 4, total)
    // where total is the FULL corpus count — max(n_live_rows) across the
    // history is v1's pre-delete count, which also pins that time travel
    // still sees it after compaction materialized the vectors.
    "q198_sql_maintenance" ->
      """SELECT event_type AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events WHERE event_id % 7 <> 0 GROUP BY 1
         UNION ALL
         SELECT '_versions', 4,
                CAST((SELECT count(*) FROM events) AS DOUBLE)""",

    // The merged table recomputed from scratch: %10==0 keys replaced by
    // the CoW batch, %10==5 keys by the vectored batch, %100==3 keys
    // re-inserted under offset ids; everything else untouched. The
    // _versions row pins (3 commits, final live count).
    "q199_sql_merge" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
              final AS (
                SELECT event_id, event_type, value FROM ev
                 WHERE event_id % 10 <> 0 AND event_id % 10 <> 5
                UNION ALL
                SELECT event_id, 'upd', value + 1000.0 FROM ev
                 WHERE event_id % 10 = 0
                UNION ALL
                SELECT event_id, 'u2', value - 500.0 FROM ev
                 WHERE event_id % 10 = 5
                UNION ALL
                SELECT event_id + 1000000000, 'ins', value FROM ev
                 WHERE event_id % 100 = 3)
         SELECT event_type AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM final GROUP BY 1
         UNION ALL
         SELECT '_versions', 3,
                CAST((SELECT count(*) FROM final) AS DOUBLE)""",

    // The bloom-pruned point-lookup path must return exactly the plain
    // recompute over survivors: pruning may only skip files with no
    // matching live row, never one that has any.
    "q200_reindex_lookup" ->
      """SELECT user_id, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events WHERE user_id % 3 <> 0 AND user_id < 30
         GROUP BY user_id""",

    // Timestamp bounds from metadata vs the raw recompute (epoch micros
    // both sides); the DV side exercises the live-stat path.
    "q201_meta_ts" ->
      """WITH ev AS (SELECT event_id, ts FROM events)
         SELECT 'v1_full' AS tag, count(*)::BIGINT AS n,
                min(epoch_us(ts))::BIGINT AS lo_us,
                max(epoch_us(ts))::BIGINT AS hi_us,
                count(ts)::BIGINT AS n_ts
         FROM ev
         UNION ALL
         SELECT 'v2_after_delete', count(*)::BIGINT,
                min(epoch_us(ts))::BIGINT, max(epoch_us(ts))::BIGINT,
                count(ts)::BIGINT
         FROM ev WHERE event_id % 5 <> 0""",

    // The updated table recomputed from scratch: %6==0 rows re-written
    // with both assignments applied over the OLD row, the rest
    // untouched; (_versions, 2, live count) pins the one-commit shape.
    "q204_sql_update" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
              final AS (
                SELECT event_type, value FROM ev WHERE event_id % 6 <> 0
                UNION ALL
                SELECT event_type || '_u', value + 50 FROM ev
                 WHERE event_id % 6 = 0)
         SELECT event_type AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM final GROUP BY 1
         UNION ALL
         SELECT '_versions', 2,
                CAST((SELECT count(*) FROM final) AS DOUBLE)""",

    // The money dashboard recomputed from raw events. avg_micros
    // reproduces Spark's HALF_UP decimal-division (scale 6) with pure
    // integer arithmetic: floor((2·cents·10⁴ + n) / (2n)) — exact for
    // the non-negative amounts here; sums compare as doubles of the
    // exact decimal totals.
    "q207_meta_decimal" ->
      """WITH ev AS (SELECT event_id,
                            CAST(value AS DECIMAL(12,2)) AS amount,
                            CAST(user_id % 4 AS BIGINT) AS bucket
                     FROM events),
              surv AS (SELECT * FROM ev WHERE event_id % 7 <> 0)
         SELECT bucket, count(*)::BIGINT AS n,
                CAST(sum(amount) AS DOUBLE) AS sum_amount,
                CAST((2 * CAST(sum(CAST(amount * 100 AS BIGINT)) AS BIGINT)
                        * 10000 + count(amount))
                     // (2 * count(amount)) AS BIGINT) AS avg_micros
         FROM surv GROUP BY 1
         UNION ALL
         SELECT -1, count(DISTINCT bucket)::BIGINT, NULL, NULL FROM surv""",

    // The rename lifecycle recomputed from raw events: head = survivors
    // of the post-rename delete plus the appended %1000 slice (under
    // either name — a rename changes no value); v1 = everything.
    "q206_column_mapping" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
              surv AS (SELECT * FROM ev
                       WHERE NOT (value < 10.0 AND event_type = 'view')),
              app AS (SELECT * FROM ev WHERE event_id % 1000 = 0),
              head AS (SELECT * FROM surv UNION ALL SELECT * FROM app)
         SELECT 'head' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_amount
         FROM head
         UNION ALL
         SELECT 'v1_time_travel', count(*)::BIGINT,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM ev
         UNION ALL
         SELECT 'v3_views', count(*)::BIGINT,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM surv WHERE event_type = 'view'""",

    // The interleaved lifecycle recomputed from raw lineitem under
    // snapshot-at-read semantics: head = base survivors ∪ ALL appended
    // rows (the racer's matching rows survive the delete);
    // 'raced_matching' counts exactly those survivors; v2 is the
    // pre-delete union the rebased history must still time-travel to.
    "q205_concurrent_dml" ->
      """WITH base AS (SELECT * FROM lineitem WHERE l_orderkey <= 30000),
              app AS (SELECT * FROM lineitem WHERE l_orderkey > 30000),
              head AS (SELECT * FROM base WHERE NOT (l_quantity <= 5)
                       UNION ALL SELECT * FROM app)
         SELECT 'head' AS tag, count(*)::BIGINT AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM head
         UNION ALL
         SELECT 'raced_matching', count(*)::BIGINT,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM app WHERE l_quantity <= 5
         UNION ALL
         SELECT 'v2_appended', count(*)::BIGINT,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM (SELECT * FROM base UNION ALL SELECT * FROM app)""",

    // The summed dashboard recomputed from raw survivors — any drift in
    // the per-file sums, the wrap-add equivalence, or the DV refresh
    // breaks the hash.
    "q202_meta_sums" ->
      // avg_id reproduces Spark's integral avg EXACTLY: one IEEE
      // division of the exact BIGINT total by the count (never DuckDB's
      // own avg, whose accumulation strategy is unspecified)
      """SELECT CAST(user_id % 8 AS INTEGER) AS bucket,
                count(*)::BIGINT AS n,
                CAST(sum(event_id) AS BIGINT) AS sum_id,
                CAST(sum(event_id) AS DOUBLE) / count(*) AS avg_id
         FROM events WHERE event_id % 9 <> 0
         GROUP BY 1""",

    // A physical-layout rewrite must be answer-invisible: the 2-D box
    // aggregate over the z-ordered table recomputed from raw events.
    "q203_zorder_prune" ->
      """SELECT user_id, count(*)::BIGINT AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events
         WHERE event_id BETWEEN 100 AND 900 AND user_id BETWEEN 5 AND 40
         GROUP BY user_id""",

    // The estimate from the register-relevant file subset must equal the
    // estimate from ALL the data (pointwise-max algebra: file boundaries
    // drop out) — so the oracle computes it straight from events with
    // the shared q121 construction.
    "q188_hll_file_skip" -> {
      import graft.ext.Sketches._
      val m = HllBuckets
      s"""WITH regs AS (
            SELECT bucket, max(rho) AS mx FROM (
              SELECT bucket, ${hllRhoSql("w")} AS rho FROM (
                SELECT h1 % $m AS bucket, ${hllMixSql("h1")} AS w FROM (
                  SELECT ${hllMixSql("h0")} AS h1 FROM (
                    SELECT ${hllHashSql("CAST(user_id AS VARCHAR)")} AS h0
                    FROM events))))
            GROUP BY 1),
          folded AS (
            SELECT list({'bucket': bucket, 'mx': mx} ORDER BY bucket) AS rs,
                   count(*)::BIGINT AS nb
            FROM regs),
          est AS (
            SELECT round(CASE WHEN eraw <= ${2.5 * m} AND nv > 0
                              THEN $m.0 * ln($m.0 / nv::DOUBLE)
                              ELSE eraw END, 6) AS est
            FROM (
              SELECT $hllAlphaM2Sql /
                       (list_reduce(list_prepend(0.0::DOUBLE,
                          list_transform(rs, rr ->
                            1.0::DOUBLE / ((1::BIGINT << rr.mx)::DOUBLE))),
                          (sa, sb) -> sa + sb)
                        + ($m - nb)::DOUBLE) AS eraw,
                     ($m - nb) AS nv
              FROM folded)),
          exact AS (SELECT count(DISTINCT user_id)::BIGINT AS n_exact
                    FROM events)
          SELECT est, n_exact,
                 round(abs(est - n_exact::DOUBLE) /
                   nullif(n_exact, 0)::DOUBLE, 6) AS err
          FROM est, exact"""
    }
  )
}
