package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sink.VersionedTable

/** COPY INTO — idempotent batch file ingest: per-source-file dedup via
  * the manifest `loads` ledger, full append contract on loaded rows,
  * refusal (not double-load) when two COPY INTOs race shared files. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): java.nio.file.Path =
    Files.createTempDirectory("graft_copyinto")

  // when(isNotNull, …) keeps every column NULLABLE — tuple frames are
  // NOT NULL, which would refuse the (nullable) parquet-read sources
  private def seedTable(root: String, rows: Seq[(Long, Double)]): Unit = {
    val df = rows.toDF("k", "v")
    VersionedTable.create(spark, root,
      df.select(df.columns.map(c =>
        when(col(c).isNotNull, col(c)).as(c)).toSeq: _*).coalesce(1))
  }

  private def stage(dir: java.nio.file.Path, name: String,
                    rows: Seq[(Long, Double)]): String = {
    val tmp = dir.resolve(s"stage_$name").toString
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = dir.resolve("in").resolve(s"$name.parquet")
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    dest.toString
  }

  test("idempotent ingest: re-copy is a no-op, new files load incrementally") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "a", Seq((1L, 1.0), (2L, 2.0)))
    stage(dir, "b", Seq((3L, 3.0)))
    seedTable(root, Seq((0L, 0.0)))
    val r1 = spark.sql(s"COPY INTO '$root' FROM '$in'")
      .as[(Int, Int)].head()
    assert(r1 == (2, 2), s"first copy loads both files: $r1")
    assert(VersionedTable.read(spark, root).count() == 4)
    // replay: ledger says both are loaded — no new version, no rows
    val r2 = spark.sql(s"COPY INTO '$root' FROM '$in'")
      .as[(Int, Int)].head()
    assert(r2 == (2, 0), s"re-copy is a no-op: $r2")
    assert(VersionedTable.read(spark, root).count() == 4)
    // a new file lands: ONLY it loads
    stage(dir, "c", Seq((4L, 4.0), (5L, 5.0)))
    val r3 = spark.sql(s"COPY INTO '$root' FROM '$in'")
      .as[(Int, Int)].head()
    assert(r3 == (3, 1), s"incremental copy loads only the new file: $r3")
    assert(VersionedTable.read(spark, root).select("k").as[Long]
      .collect().toSet == (0L to 5L).toSet)
    // the ledger face names exactly the ingested sources — Scala and
    // CALL spellings agree
    assert(VersionedTable.loadedSourceFiles(spark, root)
      .map(_.split('/').last) == Set("a.parquet", "b.parquet", "c.parquet"))
    assert(spark.sql(s"CALL graft.loads('$root')").count() == 3)
  }

  test("loaded rows pass through the full append contract") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "a", Seq((10L, 5.0)))
    spark.sql(s"""CREATE TABLE '$root' (
        k BIGINT, v DOUBLE, dbl DOUBLE GENERATED ALWAYS AS (k * 2.0),
        CONSTRAINT v_pos CHECK (v > 0))""")
    spark.sql(s"COPY INTO '$root' FROM '$in' " +
      "FILEFORMAT = PARQUET PATTERN = '*.parquet'")
    val got = VersionedTable.read(spark, root)
      .select("k", "v", "dbl").as[(Long, Double, Double)].head()
    assert(got == ((10L, 5.0, 20.0)), got.toString)
    // a violating source file refuses atomically — and stays UNLOADED
    // so the fixed re-run can ingest it
    stage(dir, "bad", Seq((11L, -1.0)))
    assert(intercept[Exception] {
      spark.sql(s"COPY INTO '$root' FROM '$in'")
    }.getMessage.contains("v_pos"))
    assert(VersionedTable.read(spark, root).count() == 1)
    assert(!VersionedTable.loadedSourceFiles(spark, root)
      .exists(_.contains("bad")), "failed ingest never enters the ledger")
  }

  test("CREATE OR REPLACE resets the ledger; FORCE re-ingests deliberately") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "a", Seq((1L, 1.0)))
    seedTable(root, Seq((0L, 0.0)))
    VersionedTable.copyInto(spark, root, in)
    assert(VersionedTable.read(spark, root).count() == 2)
    // wholesale replacement: the new incarnation must be able to
    // ingest the same landing files again — nothing carries over
    spark.sql(s"CREATE OR REPLACE TABLE '$root' (k BIGINT, v DOUBLE)")
    assert(VersionedTable.loadedSourceFiles(spark, root).isEmpty,
      "replace resets the COPY INTO ledger")
    val (_, n) = VersionedTable.copyInto(spark, root, in)
    assert(n == 1 && VersionedTable.read(spark, root).count() == 1)
    // FORCE: deliberate duplicate load through the SQL clause
    val r = spark.sql(s"COPY INTO '$root' FROM '$in' FORCE").head()
    assert(r.getInt(1) == 1, s"FORCE re-ingests: $r")
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("RESTORE past a replace restores the ingest ledger with the content") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "a", Seq((1L, 1.0)))
    seedTable(root, Seq((0L, 0.0)))
    VersionedTable.copyInto(spark, root, in)                  // v2: ledger {a}
    spark.sql(s"CREATE OR REPLACE TABLE '$root' (k BIGINT, v DOUBLE)") // v3
    spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 2")    // v4
    // a's rows are live again — its ledger entry must be back too, or
    // the next sweep would silently duplicate them
    assert(VersionedTable.loadedSourceFiles(spark, root)
      .exists(_.endsWith("a.parquet")))
    val (_, n) = VersionedTable.copyInto(spark, root, in)
    assert(n == 0 && VersionedTable.read(spark, root).count() == 2,
      "restored ledger makes the re-sweep a no-op")
  }

  test("ledger survives source paths containing ',' (no silent re-ingest)") {
    // loads entries are USER paths: a name like `a,b.parquet` must
    // round-trip the manifest ledger intact, or the re-run re-ingests
    // it forever (the parse-side comma-split bug class). ']' and '"'
    // are URI-illegal in Spark DataSource paths, so such names cannot
    // reach the ledger through copyInto in the first place — the
    // quote-aware parser covers them anyway.
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "evil_a,b_c", Seq((1L, 1.0)))
    stage(dir, "plain", Seq((2L, 2.0)))
    seedTable(root, Seq((0L, 0.0)))
    val (_, n1) = VersionedTable.copyInto(spark, root, in)
    assert(n1 == 2, s"both files ingest: $n1")
    assert(VersionedTable.loadedSourceFiles(spark, root)
      .map(_.split('/').last) ==
      Set("evil_a,b_c.parquet", "plain.parquet"),
      "ledger carries the exact user path, comma intact")
    // the guarantee under test: the replay must see BOTH entries
    val (_, n2) = VersionedTable.copyInto(spark, root, in)
    assert(n2 == 0, "re-run is a no-op even for the hostile name")
    assert(VersionedTable.read(spark, root).count() == 3)
  }

  test("CSV ingest: schema-on-read in declared order, full append contract") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in")
    Files.createDirectories(in)
    spark.sql(s"""CREATE TABLE '$root' (
        k BIGINT, v DOUBLE, dbl DOUBLE GENERATED ALWAYS AS (k * 2.0),
        CONSTRAINT v_pos CHECK (v > 0))""")
    // a raw landing file — no parquet anywhere; the GENERATED column
    // is NOT in the file (the contract computes it)
    Files.write(in.resolve("a.csv"),
      "k,v\n10,5.5\n11,2.25\n".getBytes("UTF-8"))
    val r1 = spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true')").head()
    assert(r1.getInt(1) == 1, s"one file loads: $r1")
    val got = VersionedTable.read(spark, root)
      .select("k", "v", "dbl").as[(Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 5.5, 20.0), (11L, 2.25, 22.0)), got.toString)
    // replay is a no-op — the ledger works across formats
    assert(spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true')").head().getInt(1) == 0)
    // a violating row refuses atomically and stays unloaded
    Files.write(in.resolve("bad.csv"),
      "k,v\n12,-1.0\n".getBytes("UTF-8"))
    assert(intercept[Exception] {
      spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true')")
    }.getMessage.contains("v_pos"))
    assert(VersionedTable.read(spark, root).count() == 2)
    assert(!VersionedTable.loadedSourceFiles(spark, root)
      .exists(_.contains("bad")), "failed ingest never enters the ledger")
    // a MALFORMED value fails the load (FAILFAST), never silently nulls
    Files.delete(in.resolve("bad.csv"))
    Files.write(in.resolve("mal.csv"),
      "k,v\nnot_a_number,1.0\n".getBytes("UTF-8"))
    intercept[Exception] {
      spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true')")
    }
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("JSON ingest: fields resolve by NAME; a missing field reads NULL (Delta parity)") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in")
    Files.createDirectories(in)
    spark.sql(s"CREATE TABLE '$root' " +
      "(k BIGINT, v DOUBLE, tag STRING DEFAULT 'none')")
    // scrambled field order + one record missing a field: schema-on-
    // read makes the column PRESENT (null), so the DEFAULT — which
    // fills only ABSENT columns, like Delta's COPY INTO — does not
    // apply; the record lands with NULL
    Files.write(in.resolve("a.json"),
      ("""{"v": 2.5, "k": 7, "tag": "x"}""" + "\n" +
        """{"k": 8, "v": 1.25}""" + "\n").getBytes("UTF-8"))
    val (_, n) = VersionedTable.copyInto(spark, root, in.toString,
      format = "json")
    assert(n == 1)
    val got = VersionedTable.read(spark, root)
      .select("k", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq((7L, 2.5, Some("x")), (8L, 1.25, None)),
      got.toString)
    // replay no-op through the Scala face too
    assert(VersionedTable.copyInto(spark, root, in.toString,
      format = "json")._2 == 0)
  }

  test("CSV into NOT NULL / IDENTITY tables: asserts nulls, assigns identities") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in")
    Files.createDirectories(in)
    // NOT NULL + IDENTITY: neither column is in the landing file — the
    // identity is engine-assigned, the NOT NULL read re-asserts
    spark.sql(s"""CREATE TABLE '$root' (
        rid BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100),
        k BIGINT NOT NULL, v DOUBLE)""")
    // an option value containing ')' must not end the FORMAT_OPTIONS
    // clause (the quoted-pair body admits parens inside quotes)
    Files.write(in.resolve("a.csv"),
      "k;v\n1;5.0\n2;(n/a)\n".getBytes("UTF-8"))
    spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
      "FORMAT_OPTIONS ('header' = 'true', 'delimiter' = ';', " +
      "'nullValue' = '(n/a)')")
    val got = VersionedTable.read(spark, root)
      .select("rid", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._2).toSeq
    assert(got.map(_._2) == Seq(1L, 2L), got.toString)
    assert(got.forall(_._1 >= 100L), s"identities engine-assigned: $got")
    assert(got.map(_._3) == Seq(Some(5.0), None),
      s"the parenthesized nullValue option applied: $got")
    // a NULL in the NOT NULL column refuses with the contract error
    Files.write(in.resolve("bad.csv"),
      "k;v\n(n/a);1.0\n".getBytes("UTF-8"))
    val e = intercept[Exception] {
      spark.sql(s"COPY INTO '$root' FROM '$in' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'delimiter' = ';', " +
        "'nullValue' = '(n/a)')")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("NOT NULL")),
      s"got: ${chain(e).mkString(" | ")}")
    assert(VersionedTable.read(spark, root).count() == 2,
      "the refused load changed nothing")
  }

  test("JSON honors supplied BY DEFAULT identity values; null/absent assign") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in")
    Files.createDirectories(in)
    spark.sql(s"""CREATE TABLE '$root' (
        rid BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100),
        k BIGINT)""")
    // one record supplies rid explicitly (BY DEFAULT honors it), one
    // omits it (engine-assigned from the mark) — Delta's contract
    Files.write(in.resolve("a.json"),
      ("""{"rid": 5, "k": 1}""" + "\n" +
        """{"k": 2}""" + "\n").getBytes("UTF-8"))
    VersionedTable.copyInto(spark, root, in.toString, format = "json")
    val got = VersionedTable.read(spark, root)
      .select("k", "rid").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(0)._2 == 5L, s"explicit BY DEFAULT value honored: $got")
    assert(got(1)._2 >= 100L, s"absent value engine-assigned: $got")
    // a later plain append must allocate PAST the supplied value too
    import org.apache.spark.sql.functions.{col => c, when}
    VersionedTable.append(spark, root,
      Seq(3L).toDF("k0").select(when(c("k0") > 0, c("k0")).as("k")))
    val rids = VersionedTable.read(spark, root)
      .select("rid").as[Long].collect().toSeq
    assert(rids.distinct.size == rids.size, s"identity values unique: $rids")
  }

  test("racing COPY INTOs over shared files: the loser refuses, never double-loads") {
    val dir = freshDir()
    val root = dir.resolve("t").toString
    val in = dir.resolve("in").toString
    stage(dir, "a", Seq((1L, 1.0)))
    seedTable(root, Seq((0L, 0.0)))
    // deterministic race: the winner lands the same source file inside
    // the loser's CAS window
    VersionedTable.raceBeforePublish = () =>
      VersionedTable.copyInto(spark, root, in)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        VersionedTable.copyInto(spark, root, in)
      }
      assert(e.getMessage.contains("already ingested"), e.getMessage)
    } finally VersionedTable.raceBeforePublish = VersionedTable.NoRaceHook
    assert(VersionedTable.read(spark, root).count() == 2,
      "exactly one ingest landed")
    // the loser's re-run consults the extended ledger: clean no-op
    val (_, n) = VersionedTable.copyInto(spark, root, in)
    assert(n == 0)
  }
}
