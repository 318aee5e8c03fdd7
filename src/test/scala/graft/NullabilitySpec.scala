package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** ALTER COLUMN SET/DROP NOT NULL. Contract under test: tightening a
  * null-free column is METADATA-ONLY when every file's recorded null
  * count proves it (no read); a column holding a live NULL refuses;
  * a NULL hidden by a deletion vector no longer blocks (the unproven
  * file is scanned DV-aware); after tightening, appends can neither
  * omit the column nor supply a nullable frame; loosening is free and
  * re-admits both. */
class NullabilitySpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_nn").resolve("t").toString

  private def nullableOf(root: String, col: String): Boolean =
    VersionedTable.schemaOf(spark, root)(col).nullable

  test("tighten: proven from stats zero-scan; live NULL refuses; DV-hidden NULL passes") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v").coalesce(1))
    // all files' footers record zero nulls for v -> metadata-only
    VersionedTable.alterColumnNullability(spark, root, "v", nullable = false)
    assert(!nullableOf(root, "v"))
    assert(VersionedTable.schemaOf(spark, root).toDDL.contains("NOT NULL"))
    // loosen, land a NULL, tightening now refuses
    VersionedTable.alterColumnNullability(spark, root, "v", nullable = true)
    VersionedTable.append(spark, root,
      Seq((3L, None: Option[Long])).toDF("id", "v").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.alterColumnNullability(spark, root, "v", nullable = false)
    }
    assert(e.getMessage.contains("live rows hold NULL"))
    // vector the NULL row away: the footer still says nulls>0, so the
    // proof falls to the DV-aware scan — which finds no survivor NULL
    VersionedTable.deleteWhereVectored(spark, root,
      Map("id" -> (Some(3L): Option[Any], Some(3L): Option[Any])),
      col("id") === 3L)
    VersionedTable.alterColumnNullability(spark, root, "v", nullable = false)
    assert(!nullableOf(root, "v"))
  }

  test("after tightening, appends must carry the column non-nullably") {
    val root = freshRoot()
    VersionedTable.create(spark, root,
      Seq((1L, 5L)).toDF("id", "v").coalesce(1))
    // created non-nullable already (plain tuples): loosen then tighten
    // through the DDL to exercise both directions
    if (!nullableOf(root, "v")) {
      VersionedTable.alterColumnNullability(spark, root, "v", nullable = true)
    }
    VersionedTable.alterColumnNullability(spark, root, "v", nullable = false)
    // omitting the column refuses
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root, Seq(2L).toDF("id").coalesce(1))
    }
    assert(e1.getMessage.contains("non-nullable"))
    // a nullable frame refuses even if its values happen to be non-null
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((2L, Some(7L))).toDF("id", "v").coalesce(1))
    }
    assert(e2.getMessage.contains("non-nullable") ||
      e2.getMessage.contains("widen"))
    // a non-nullable frame lands
    VersionedTable.append(spark, root, Seq((2L, 7L)).toDF("id", "v").coalesce(1))
    assert(VersionedTable.read(spark, root).count() == 2)
    // loosening re-admits the nullable frame
    VersionedTable.alterColumnNullability(spark, root, "v", nullable = true)
    VersionedTable.append(spark, root,
      Seq((3L, None: Option[Long])).toDF("id", "v").coalesce(1))
    assert(VersionedTable.read(spark, root).filter($"v".isNull).count() == 1)
  }

  test("a column files physically lack falls to the scan path; SQL face works") {
    val root = freshRoot()
    VersionedTable.create(spark, root, Seq(1L, 2L).toDF("id").coalesce(1))
    // plain addColumn: old files READ NULL for it -> tighten refuses
    VersionedTable.addColumn(spark, root, "w", "bigint")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.alterColumnNullability(spark, root, "w", nullable = false)
    }
    assert(e.getMessage.contains("live rows hold NULL"))
    // a DEFAULTED add substitutes a literal: the scan sees it, tighten passes
    VersionedTable.addColumn(spark, root, "d", "bigint", default = Some("42"))
    spark.sql(s"CALL graft.alter_column_nullability('$root', 'd', false)")
    assert(!nullableOf(root, "d"))
  }

  test("a NULL-evaluating write DEFAULT blocks the tighten") {
    val root = freshRoot()
    VersionedTable.create(spark, root, Seq(1L).toDF("id").coalesce(1))
    VersionedTable.addColumn(spark, root, "d", "bigint",
      default = Some("CAST(null AS bigint)"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.alterColumnNullability(spark, root, "d", nullable = false)
    }
    assert(e.getMessage.contains("DEFAULT") && e.getMessage.contains("NULL"))
  }

  test("a NOT NULL generated column rejects a NULL expression result") {
    val root = freshRoot()
    // v is nullable; g = v + 1 is NULL exactly when v is
    VersionedTable.create(spark, root,
      Seq((1L, Some(10L))).toDF("id", "v").coalesce(1))
    VersionedTable.addGeneratedColumn(spark, root, "g", "bigint", "v + 1")
    VersionedTable.alterColumnNullability(spark, root, "g", nullable = false)
    // a NULL v makes g NULL: the null-safe g <=> expr alone would pass
    // (both NULL) — the synthetic notnull:g check must refuse instead
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((2L, None: Option[Long])).toDF("id", "v").coalesce(1))
    }
    assert(e.getMessage.contains("notnull:g"))
    assert(VersionedTable.read(spark, root).count() == 1)
    assert(VersionedTable.orphanFiles(spark, root).isEmpty)
    // a non-NULL v still lands
    VersionedTable.append(spark, root,
      Seq((3L, Some(30L))).toDF("id", "v").coalesce(1))
    assert(VersionedTable.read(spark, root).filter($"g" === 31L).count() == 1)
  }
}
