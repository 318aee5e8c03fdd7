package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Tile-table data model (SURVEY.md §1.4): the Spark-idiomatic replacement
  * for whole-image ndarrays. A scene is split into fixed 256×256 tiles —
  * exactly the block size the reference writes
  * (reference src/transform/compute_ndvi.py:82-84) — so a 100 TB archive
  * becomes a flat parquet table partitionable by scene and sortable by
  * (scene_id, tile_row, tile_col) for co-located band joins.
  */
object RasterModel {

  /** Reference tile size (compute_ndvi.py:82-84: blockxsize=blockysize=256). */
  val TileSize = 256

  /** band_tiles schema (SURVEY.md §1.4). `transform` is the 6-element
    * affine [a, b, c, d, e, f]: x = c + a*px + b*py; y = f + d*px + e*py. */
  val bandTileSchema: StructType = StructType(Seq(
    StructField("scene_id", StringType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("tile_col", IntegerType, nullable = false),
    StructField("tile_row", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("epsg", IntegerType, nullable = false),
    StructField("transform", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("nodata", DoubleType, nullable = true),
    // NULL pixel = masked/nodata internally; -9999 only at sink boundary
    // (compute_ndvi.py:36,68 / SURVEY §2.3 N7).
    StructField("pixels", ArrayType(FloatType, containsNull = true), nullable = false)))

  case class BandTile(
      scene_id: String, band: String, tile_col: Int, tile_row: Int,
      width: Int, height: Int, epsg: Int, transform: Seq[Double],
      nodata: Option[Double], pixels: Seq[Option[Float]])

  /** aoi schema (SURVEY.md §1.4 / FIXTURES.md §2). */
  val aoiSchema: StructType = StructType(Seq(
    StructField("aoi_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("geom_wkt", StringType, nullable = false),
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))

  case class Aoi(aoi_id: Long, name: String, geom_wkt: String,
                 minx: Double, miny: Double, maxx: Double, maxy: Double)

  // ---- fixtures (FIXTURES.md §1–2, replicating reference tests/test_ndvi.py:7-20)

  /** `create_dummy_band` equivalent: constant-valued w×h single-band tile,
    * EPSG:4326, transform [0.1,0,0,0,-0.1,0], nodata 0. */
  def dummyBand(spark: SparkSession, band: String, value: Float,
                w: Int = 100, h: Int = 100,
                sceneId: String = "TEST_SCENE",
                nodata: Option[Double] = Some(0.0)): DataFrame = {
    import spark.implicits._
    Seq(BandTile(sceneId, band, 0, 0, w, h, 4326,
      Seq(0.1, 0.0, 0.0, 0.0, -0.1, 0.0), nodata,
      Seq.fill(w * h)(Some(value)))).toDF()
  }

  /** Two-band fixture `dummy_constant`: red=1000, nir=3000 DN. */
  def dummyConstant(spark: SparkSession): DataFrame =
    dummyBand(spark, "red", 1000f).unionByName(dummyBand(spark, "nir", 3000f))

  /** AOI fixtures from FIXTURES.md §2. */
  def aoiDisjoint(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Aoi(1L, "AOI",
      "POLYGON ((25.13 60.32, 25.63 60.32, 25.63 60.63, 25.13 60.63, 25.13 60.32))",
      25.13, 60.32, 25.63, 60.63)).toDF()
  }
  def aoiOverlap(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Aoi(1L, "AOI",
      "POLYGON ((0.5 -9.5, 9.5 -9.5, 9.5 -0.5, 0.5 -0.5, 0.5 -9.5))",
      0.5, -9.5, 9.5, -0.5)).toDF()
  }
}
