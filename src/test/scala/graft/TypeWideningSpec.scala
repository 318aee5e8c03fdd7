package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** Metadata-only type widening — the Iceberg v3 type-promotion / Delta
  * type-widening recipe. Contract under test: alterColumnType changes
  * the declared type without touching a file; pre-widen (int32) and
  * post-widen (int64) files coexist under one schema and read
  * correctly; stats-pruning, attached sums, blooms, DMLs and defaults
  * keep working through the widen; narrower appends upcast; narrowing
  * and hash-coupled (bucket-layout) widenings refuse; time travel
  * reads each version under its own type. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_widen").resolve("t").toString

  test("int->bigint: mixed physical files, one schema, values exact") {
    val root = freshRoot()
    val v1 = Seq((1, 10L), (2, 20L)).toDF("k", "pay").coalesce(1)
    VersionedTable.create(spark, root, v1)                            // v1 int
    VersionedTable.alterColumnType(spark, root, "k", "BIGINT")        // v2
    assert(VersionedTable.schemaOf(spark, root)("k").dataType ==
      org.apache.spark.sql.types.LongType)
    // a post-widen append carries int64; an OLD writer still sending
    // int32 upcasts through alignment
    VersionedTable.append(spark, root,
      Seq((3L, 30L), (1L << 40, 40L)).toDF("k", "pay").coalesce(1))   // v3
    VersionedTable.append(spark, root,
      Seq((5, 50L)).toDF("k", "pay").coalesce(1))                     // v4 int32 writer
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 30L,
      (1L << 40) -> 40L, 5L -> 50L))
    // time travel: v1 still reads as INT
    assert(VersionedTable.read(spark, root, Some(1))
      .schema("k").dataType == org.apache.spark.sql.types.IntegerType)
    // stats survive in the shared long domain: a range probe prunes
    val files = VersionedTable.filesOf(spark, root)
    val pruned = VersionedTable.prunedFiles(spark, root,
      Map("k" -> (Some(1L << 39), None)))
    assert(pruned.size < files.size, s"kept ${pruned.size}/${files.size}")
    assert(VersionedTable.readWhere(spark, root,
        Map("k" -> (Some(1L << 39), None)))
      .filter(col("k") >= (1L << 39)).count() == 1)
  }

  test("widen survives DMLs, sums, blooms and defaults") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1, 5), (2, 6), (3, 7)).toDF("k", "v").coalesce(1))
    VersionedTable.indexSums(spark, root, Seq("v"))
    VersionedTable.indexBloom(spark, root, Seq("k"))
    VersionedTable.addColumn(spark, root, "src", "STRING", Some("'old'"))
    VersionedTable.alterColumnType(spark, root, "v", "BIGINT")
    // integral blooms survive the widen (string renderings identical)
    assert(VersionedTable.bloomPrunedFiles(spark, root, "k", "2").nonEmpty)
    // vectored delete through the widened column's predicate
    VersionedTable.deleteWhereVectored(spark, root, Map.empty,
      col("v") === 6L)
    val got = VersionedTable.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1, 5L, "old"), (3, 7L, "old")))
    // metadata row count stays exact through widen + DV
    assert(VersionedTable.metaRowCount(spark, root).contains(2L))
  }

  test("float->double drops the column's blooms; decimal widens at fixed scale") {
    val root = freshRoot()
    val df = Seq((1, 1.5f, BigDecimal("12.34")), (2, 2.5f, BigDecimal("56.78")))
      .toDF("k", "f", "d")
      .withColumn("d", col("d").cast("decimal(5,2)")).coalesce(1)
    VersionedTable.create(spark, root, df)
    VersionedTable.indexBloom(spark, root, Seq("f"))
    VersionedTable.alterColumnType(spark, root, "f", "DOUBLE")
    VersionedTable.alterColumnType(spark, root, "d", "DECIMAL(12,2)")
    val got = VersionedTable.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDecimal(2).toPlainString))
      .toSet
    assert(got == Set((1, 1.5, "12.34"), (2, 2.5, "56.78")))
    // the float bloom is gone: every file reports un-indexed (safe),
    // none is wrongly pruned
    assert(VersionedTable.unbloomedFiles(spark, root, "f").toSet ==
      VersionedTable.filesOf(spark, root).toSet)
  }

  test("narrowing, scale changes and bucket-source widening refuse") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 1, BigDecimal("1.5"))).toDF("k", "v", "d")
        .withColumn("d", col("d").cast("decimal(5,1)")).coalesce(1))
    def refused(c: String, t: String): Boolean =
      scala.util.Try(VersionedTable.alterColumnType(spark, root, c, t))
        .isFailure
    assert(refused("k", "INT"), "narrowing")
    assert(refused("d", "DECIMAL(10,3)"), "scale change")
    assert(refused("v", "STRING"), "cross-family")
    assert(refused("nope", "BIGINT"), "unknown column")
    VersionedTable.setPartitionLayout(spark, root, Seq("bucket(4, v)"))
    assert(refused("v", "BIGINT"), "bucket-source widen must refuse")
    // the SQL face works end to end (k is long already; widen d)
    spark.sql(s"CALL graft.alter_column_type('$root', 'd', 'DECIMAL(9,1)')")
      .collect()
    assert(VersionedTable.schemaOf(spark, root)("d").dataType ==
      org.apache.spark.sql.types.DecimalType(9, 1))
  }
}
