package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.GraftNames
import graft.sink.VersionedTable

/** The named-table face: `graft.<name>` in vanilla Spark SQL through
  * the DSv2 TableCatalog (SELECT/INSERT/CTAS/ALTER/SHOW/DROP/RENAME,
  * time travel) plus the GraftSqlParser named targets for the forms
  * Spark cannot run against a custom catalog (UPDATE/DELETE/MERGE/
  * OPTIMIZE/VACUUM) — the reference's named-table UX
  * (load_to_postgis.py:140-149) without the quoted-path marker. */
class GraftNamedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String = {
    val w = Files.createTempDirectory("graft_named_wh").toString
    spark.conf.set(GraftNames.WarehouseConf, w)
    w
  }

  test("register_table binds a name; SELECT and INSERT INTO run through it") {
    val w = freshWarehouse()
    val root = Files.createTempDirectory("graft_named").resolve("t").toString
    VersionedTable.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    val reg = spark.sql(s"CALL graft.register_table('ndvi_full', '$root')")
      .collect()
    assert(reg.head.getString(0) == "ndvi_full")
    // vanilla SQL SELECT by NAME — and the plan is the DSv1 engine read
    assert(spark.sql("SELECT sum(k) FROM graft.ndvi_full").as[Long].head() == 3L)
    assert(spark.sql(
      "SELECT s FROM graft.ndvi_full WHERE k = 2").as[String].head() == "b")
    // the read executed through the DSv1 engine relation (stats-pruned
    // buildScan), not a V2 scan — GraftNamedTableReads did the swap
    assert(graft.sources.VersionedSource.lastScan.exists(_.root == root),
      s"named SELECT must run the engine read path; lastScan=" +
        graft.sources.VersionedSource.lastScan)
    // INSERT INTO by name = a committed engine append (V1 write bridge)
    spark.sql("INSERT INTO graft.ndvi_full SELECT 3L, 'c'")
    assert(VersionedTable.read(spark, root).count() == 3)
    assert(VersionedTable.currentVersion(spark, root).contains(2))
    // joins across named + ordinary relations resolve fine
    val j = spark.sql(
      """SELECT t.s FROM graft.ndvi_full t
        |JOIN (SELECT 3L AS k) u ON t.k = u.k""".stripMargin)
      .as[String].collect().toSeq
    assert(j == Seq("c"))
    // CALL procedures accept the registered name where they take a path
    val hist = spark.sql("CALL graft.history('ndvi_full')").collect()
    assert(hist.length == 2)
    // INSERT OVERWRITE = the engine overwrite
    spark.sql("INSERT OVERWRITE graft.ndvi_full SELECT 9L, 'z'")
    assert(VersionedTable.read(spark, root).select("k").as[Long].head() == 9L)
    spark.sql("CALL graft.unregister_table('ndvi_full')")
    assert(intercept[Exception](
      spark.sql("SELECT * FROM graft.ndvi_full").collect()) != null)
    // the DATA survives an unregister (link only)
    assert(VersionedTable.read(spark, root).count() == 1)
  }

  test("CTAS, time travel, SHOW TABLES, ALTER via Spark's grammar, RENAME, DROP") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.scenes AS SELECT id AS k, id * 2 AS v " +
      "FROM range(10)")
    assert(VersionedTable.currentVersion(spark, s"$w/scenes").nonEmpty)
    assert(spark.sql("SELECT sum(v) FROM graft.scenes").as[Long].head() == 90L)
    spark.sql("INSERT INTO graft.scenes SELECT 100L, 200L")
    // time travel through Spark's own grammar (catalog loadTable(v))
    assert(spark.sql("SELECT count(*) FROM graft.scenes VERSION AS OF 2")
      .as[Long].head() == 10L)
    assert(spark.sql("SELECT count(*) FROM graft.scenes").as[Long].head() == 11L)
    // SHOW TABLES sees it
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("scenes"))
    // ALTER through Spark's own parser → TableCatalog.alterTable
    spark.sql("ALTER TABLE graft.scenes ADD COLUMNS (note STRING)")
    assert(VersionedTable.schemaOf(spark, s"$w/scenes").fieldNames
      .contains("note"))
    spark.sql("ALTER TABLE graft.scenes RENAME COLUMN note TO remark")
    spark.sql("ALTER TABLE graft.scenes SET TBLPROPERTIES ('team' = 'etl')")
    // the manifest's properties surface through Spark's own grammar
    val props = spark.sql("SHOW TBLPROPERTIES graft.scenes").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("etl"), props.toString)
    spark.sql("ALTER TABLE graft.scenes DROP COLUMN remark")
    // RENAME TABLE moves the managed directory
    spark.sql("ALTER TABLE graft.scenes RENAME TO graft.scenes2")
    assert(spark.sql("SELECT count(*) FROM graft.scenes2").as[Long].head() == 11L)
    assert(!spark.catalog.tableExists("graft.scenes"))
    // DROP deletes the managed directory
    spark.sql("DROP TABLE graft.scenes2")
    assert(spark.sql("SHOW TABLES IN graft").collect().isEmpty)
    assert(!new java.io.File(s"$w/scenes2").exists())
  }

  test("namespaces: graft.db.t end to end — DDL, DML, SHOW, rename, drop") {
    val w = freshWarehouse()
    spark.sql("CREATE NAMESPACE graft.silver")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("silver"))
    // CTAS into the namespace → managed at <warehouse>/silver/t
    spark.sql("CREATE TABLE graft.silver.ev AS SELECT 1L AS k, 'a' AS s")
    assert(VersionedTable.currentVersion(spark, s"$w/silver/ev").nonEmpty,
      "namespaced managed table lives one directory level down")
    spark.sql("INSERT INTO graft.silver.ev SELECT 2L, 'b'")
    assert(spark.sql("SELECT sum(k) FROM graft.silver.ev")
      .as[Long].head() == 3L)
    // SHOW TABLES scopes to the namespace level — no cross-listing
    assert(spark.sql("SHOW TABLES IN graft.silver").collect()
      .map(_.getString(1)).toSeq == Seq("ev"))
    spark.sql("CREATE TABLE graft.top AS SELECT 1L AS k")
    assert(!spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("ev"),
      "top level never lists namespaced tables")
    // parser DML faces take the two-level spelling
    spark.sql("UPDATE graft.silver.ev SET s = 'z' WHERE k = 2")
    assert(spark.sql("SELECT s FROM graft.silver.ev WHERE k = 2")
      .as[String].head() == "z")
    spark.sql("DELETE FROM graft.silver.ev WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM graft.silver.ev")
      .as[Long].head() == 1L)
    // CALL procedures accept the dotted name where they take a path
    assert(spark.sql("CALL graft.history('silver.ev')").count() >= 3)
    // links register into namespaces too
    val ext = Files.createTempDirectory("graft_ns_ext").resolve("t").toString
    VersionedTable.create(spark, ext, Seq((5L, "e")).toDF("k", "s"))
    spark.sql(s"CALL graft.register_table('silver.linked', '$ext')")
    assert(spark.sql("SELECT k FROM graft.silver.linked")
      .as[Long].head() == 5L)
    assert(spark.sql("SHOW TABLES IN graft.silver").collect()
      .map(_.getString(1)).toSeq.sorted == Seq("ev", "linked"))
    // rename ACROSS namespaces moves the managed dir
    spark.sql("ALTER TABLE graft.silver.ev RENAME TO graft.gold.ev")
    assert(spark.sql("SELECT count(*) FROM graft.gold.ev")
      .as[Long].head() == 1L)
    assert(VersionedTable.currentVersion(spark, s"$w/silver/ev").isEmpty)
    // DROP NAMESPACE refuses while tables remain; CASCADE clears
    assert(intercept[Exception](
      spark.sql("DROP NAMESPACE graft.silver")).getMessage
      .contains("still holds"))
    spark.sql("DROP NAMESPACE graft.silver CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("silver"))
    assert(VersionedTable.currentVersion(spark, ext).nonEmpty,
      "dropping a namespace unbinds links, never deletes linked data")
    // three-level names refuse
    assert(intercept[Exception](
      spark.sql("CREATE TABLE graft.a.b.c (k BIGINT)")).getMessage
      .contains("namespace"))
  }

  test("a lost CREATE race undoes only its own artifacts: a concurrently nested table survives (r17 ADVICE)") {
    val w = freshWarehouse()
    // our CREATE commits at $w/racy (schema-only create + an insert so
    // the undo has real data files to sweep) ...
    spark.sql("CREATE TABLE graft.racy (k BIGINT)")
    spark.sql("INSERT INTO graft.racy SELECT 1L")
    // ... and a racer's nested `CREATE TABLE graft.racy.t` lands under
    // the same directory before our (simulated) lost-race undo runs —
    // the interleaving the recursive dropTable destroyed
    VersionedTable.create(spark, s"$w/racy/t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    graft.catalog.GraftCatalog.undoOwnCreate(spark, s"$w/racy")
    // our create is fully undone: no manifest, no stray data files
    assert(VersionedTable.currentVersion(spark, s"$w/racy").isEmpty,
      "the losing create's own commit must be gone")
    // the racer's nested table is INTACT — both its manifest and rows
    assert(VersionedTable.currentVersion(spark, s"$w/racy/t").nonEmpty,
      "the undo must not touch the racer's nested table")
    assert(VersionedTable.read(spark, s"$w/racy/t").count() == 2)
    // the directory survives as the namespace's directory (the racer's
    // own re-verify can truthfully report success)
    val f = new org.apache.hadoop.fs.Path(s"$w/racy")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$w/racy")))
    // with NOTHING nested, the same undo removes the directory whole
    spark.sql("CREATE TABLE graft.solo (k BIGINT)")
    graft.catalog.GraftCatalog.undoOwnCreate(spark, s"$w/solo")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$w/solo")),
      "an artifact-only root must be deleted entirely")
  }

  test("namespace guards: traversal names refuse, a typo'd namespace errors") {
    freshWarehouse()
    // CREATE NAMESPACE must enforce the same traversal guard every
    // other name-to-path join does — a backticked `..` would mkdir
    // OUTSIDE the warehouse
    assert(intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.`../evil`")).getMessage
      .contains("invalid namespace"))
    assert(intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.`my-db`")).getMessage
      .contains("invalid namespace"))
    // SHOW TABLES in a namespace that does not exist must ERROR, not
    // read as an empty namespace
    val e = intercept[Exception](
      spark.sql("SHOW TABLES IN graft.typo_db").collect())
    assert(e.getMessage.contains("SCHEMA_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("namespace"), e.getMessage)
  }

  test("a managed table root never doubles as a namespace: create/register/CREATE NAMESPACE all refuse") {
    val w = freshWarehouse()
    // a TOP-LEVEL MANAGED table named 'db'
    spark.sql("CREATE TABLE graft.db AS SELECT 1L AS k")
    assert(VersionedTable.currentVersion(spark, s"$w/db").nonEmpty)
    // CREATE TABLE graft.db.t would nest t INSIDE the table's root:
    // DROP TABLE graft.db would then recursively delete t's data while
    // SHOW TABLES IN graft.db throws — refuse up front
    val eCreate = intercept[Exception](
      spark.sql("CREATE TABLE graft.db.t AS SELECT 2L AS k")).getMessage
    assert(eCreate.contains("cannot use 'db' as a namespace"), eCreate)
    // the link form takes the same guard
    val ext = Files.createTempDirectory("graft_shadow").resolve("t").toString
    VersionedTable.create(spark, ext, Seq((1L, "a")).toDF("k", "s"))
    val eReg = intercept[Exception](
      spark.sql(s"CALL graft.register_table('db.linked', '$ext')")).getMessage
    assert(eReg.contains("cannot use 'db' as a namespace"), eReg)
    // CREATE NAMESPACE on the table's name must refuse too (mkdirs on
    // the table root would "succeed" while namespaceExists stays false)
    val eNs = intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.db")).getMessage
    assert(eNs.contains("cannot create namespace db"), eNs)
    // and CREATE NAMESPACE without IF NOT EXISTS on an EXISTING
    // namespace raises the contract error instead of silently passing
    spark.sql("CREATE NAMESPACE graft.realdb")
    val eDup = intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.realdb")).getMessage
    assert(eDup.contains("SCHEMA_ALREADY_EXISTS") ||
      eDup.toLowerCase.contains("already exists"), eDup)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.realdb") // no-op, no error
    // the table itself is untouched by all the refusals
    assert(spark.sql("SELECT k FROM graft.db").as[Long].head() == 1L)
    spark.sql("DROP TABLE graft.db")
    spark.sql("DROP NAMESPACE graft.realdb")
  }

  test("engine-state dirs never read as namespaces; plain files neither") {
    val w = freshWarehouse()
    // registering a link creates $w/_names — DROP NAMESPACE graft._names
    // must NOT see it as an empty namespace and recursively delete the
    // whole link registry
    val ext = Files.createTempDirectory("graft_ns_guard").resolve("t").toString
    VersionedTable.create(spark, ext, Seq((1L, "a")).toDF("k", "s"))
    spark.sql(s"CALL graft.register_table('linked_g', '$ext')")
    val eDrop = intercept[Exception](
      spark.sql("DROP NAMESPACE graft.`_names`")).getMessage
    assert(eDrop.contains("invalid namespace") ||
      eDrop.contains("SCHEMA_NOT_FOUND"), eDrop)
    assert(spark.sql("SELECT k FROM graft.linked_g").as[Long].head() == 1L,
      "the link registry survived")
    assert(intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.`_foo`")).getMessage
      .contains("invalid namespace"))
    // a STRAY PLAIN FILE in the warehouse is not a namespace: USE must
    // refuse and DROP NAMESPACE must not delete the file
    Files.write(java.nio.file.Paths.get(w, "notes"),
      "not a namespace".getBytes("UTF-8"))
    assert(intercept[Exception](spark.sql("USE graft.notes")) != null)
    assert(spark.sql("DROP NAMESPACE IF EXISTS graft.notes").collect() != null)
    assert(Files.exists(java.nio.file.Paths.get(w, "notes")),
      "the stray file survived a namespace drop probe")
    // namespaced tables cannot hide under engine-state dirs either
    assert(intercept[Exception](
      spark.sql("CREATE TABLE graft.`_names`.evil AS SELECT 1L AS k"))
      != null)
  }

  test("USE graft.db sets the session namespace; bare names resolve inside it") {
    freshWarehouse()
    spark.sql("CREATE NAMESPACE graft.usedb")
    spark.sql("CREATE TABLE graft.usedb.t AS SELECT 7L AS k")
    spark.sql("USE graft.usedb")
    try {
      assert(spark.sql("SELECT k FROM t").as[Long].head() == 7L,
        "bare name resolves in the current namespace")
      assert(spark.sql("SHOW TABLES").collect()
        .map(_.getString(1)).contains("t"),
        "SHOW TABLES defaults to the current namespace")
      spark.sql("INSERT INTO t SELECT 8L")
      assert(spark.sql("SELECT sum(k) FROM t").as[Long].head() == 15L)
    } finally spark.sql("USE spark_catalog.default")
  }

  test("parser named targets: UPDATE / DELETE / MERGE / OPTIMIZE / VACUUM") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.docs AS " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS score FROM range(20)")
    spark.sql("UPDATE graft.docs SET score = score + 100.0 WHERE k < 5")
    spark.sql("DELETE FROM graft.docs WHERE k >= 15")
    spark.sql("MERGE INTO graft.docs USING " +
      "(SELECT 3L AS k, CAST(0.5 AS DOUBLE) AS score) ON (k)")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(score) AS s FROM graft.docs")
      .as[(Long, Double)].head()
    // rows 0..14 minus nothing; 0..4 +100 each; k=3 replaced by 0.5
    val exp = (0 until 15).map(k =>
      if (k == 3) 0.5 else if (k < 5) k + 100.0 else k.toDouble).sum
    assert(got._1 == 15L && math.abs(got._2 - exp) < 1e-9, got.toString)
    spark.sql("OPTIMIZE graft.docs")
    spark.sql("VACUUM graft.docs DRY RUN")
    assert(spark.sql("SELECT count(*) FROM graft.docs").as[Long].head() == 15L)
    // an unknown name refuses with the setup hint, not a relative path
    val e = intercept[Exception](spark.sql("DELETE FROM graft.nope WHERE k = 1"))
    assert(e.getMessage.contains("no graft table named nope"), e.getMessage)
  }

  test("row-tracked named table: engine owns _row_id through the SQL face") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.rt AS SELECT id AS k, id * 2 AS v FROM range(5)")
    spark.sql("CALL graft.enable_row_tracking('rt')")
    // the engine-owned column is HIDDEN from the named face: positional
    // INSERT needs no _row_id, and the engine assigns a fresh unique id
    spark.sql("INSERT INTO graft.rt SELECT 100L, 200L")
    assert(!spark.sql("SELECT * FROM graft.rt").schema.fieldNames
      .contains("_row_id"), "engine column stays hidden from SELECT *")
    val ids = VersionedTable.read(spark, s"$w/rt")
      .select("_row_id").as[Long].collect()
    assert(ids.length == 6 && ids.toSet.size == 6, s"unique ids: ${ids.toSeq}")
    spark.sql("DROP TABLE graft.rt")
  }

  test("name guards: traversal never resolves, links may not shadow managed") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.safe AS SELECT id FROM range(3)")
    // a backticked traversal name must not resolve (or DROP) anything
    assert(intercept[Exception](
      spark.sql("SELECT * FROM graft.`..`").collect()) != null)
    assert(GraftNames.lookup(spark, "..").isEmpty)
    assert(!spark.sql("DROP TABLE IF EXISTS graft.`..`").collect().exists(_ => false) ||
      new java.io.File(w).exists(), "warehouse survives traversal drop")
    assert(new java.io.File(s"$w/safe").exists())
    // a link may not shadow a managed table of the same name
    val other = Files.createTempDirectory("graft_named_other").resolve("t").toString
    VersionedTable.create(spark, other, Seq((1L, "x")).toDF("k", "s"))
    val e = intercept[Exception](
      spark.sql(s"CALL graft.register_table('safe', '$other')"))
    assert(e.getMessage.contains("managed table"), e.getMessage)
    spark.sql("DROP TABLE graft.safe")
  }

  test("unsupported trailing MERGE clauses delegate, never fold into SET") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.mg AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(5)")
    // 'INSERT *' after a partial SET is NOT our grammar: the statement
    // must fall to the delegate's syntax error, not execute with the
    // clause folded into the last assignment
    val e = intercept[Exception] {
      spark.sql("MERGE INTO graft.mg USING (SELECT 1L AS k) ON (k) " +
        "WHEN MATCHED THEN UPDATE SET v = 1.0 " +
        "WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e != null)
    // and the table is untouched
    assert(spark.sql("SELECT sum(v) FROM graft.mg")
      .as[Double].head() == 10.0)
    spark.sql("DROP TABLE graft.mg")
  }

  test("TRUNCATE TABLE is a committed logical truncate, time travel intact") {
    val w = freshWarehouse()
    spark.sql("CREATE TABLE graft.tr AS SELECT id FROM range(7)")
    spark.sql("TRUNCATE TABLE graft.tr")
    assert(spark.sql("SELECT count(*) FROM graft.tr").as[Long].head() == 0L)
    // the pre-truncate version stays readable
    assert(spark.sql("SELECT count(*) FROM graft.tr VERSION AS OF 2")
      .as[Long].head() == 7L)
    spark.sql("INSERT INTO graft.tr SELECT 42L")
    assert(spark.sql("SELECT count(*) FROM graft.tr").as[Long].head() == 1L)
    spark.sql("DROP TABLE graft.tr")
  }

  test("CREATE TABLE with partition transforms maps to the engine layout") {
    freshWarehouse()
    spark.sql("CREATE TABLE graft.ev PARTITIONED BY (bucket(4, k)) AS " +
      "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(40)")
    assert(spark.sql("SELECT count(*) FROM graft.ev").as[Long].head() == 40L)
    val parts = spark.sql("CALL graft.partitions('ev')").collect()
    assert(parts.nonEmpty && parts.forall(_.getString(0).contains("=")))
    spark.sql("DROP TABLE graft.ev")
  }
}
