package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.model.RasterModel
import graft.raster.NdviKernel

/** The 100 TB claim made concrete (SURVEY.md §4 "co-partition band_tiles
  * by scene to make J4 a shuffle-free zip"): with the tile table bucketed
  * by the grid key, the band-pairing self-join plans with NO shuffle
  * exchange on either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("band pairing over a bucketed tile table plans without a shuffle") {
    val tiles = (0 until 32).flatMap { i =>
      Seq(
        RasterModel.BandTile(s"S$i", "red", i % 4, i / 4, 4, 4, 4326,
          Seq(0.1, 0, 0, 0, -0.1, 0), Some(0.0), Seq.fill(16)(Some(1000f))),
        RasterModel.BandTile(s"S$i", "nir", i % 4, i / 4, 4, 4, 4326,
          Seq(0.1, 0, 0, 0, -0.1, 0), Some(0.0), Seq.fill(16)(Some(3000f))))
    }.toDF()
    spark.sql("DROP TABLE IF EXISTS tiles_bucketed")
    tiles.write
      .bucketBy(4, "scene_id", "tile_col", "tile_row")
      .sortBy("scene_id", "tile_col", "tile_row")
      .saveAsTable("tiles_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val paired = NdviKernel.pairBands(spark.table("tiles_bucketed"))
      paired.collect() // force final adaptive plan
      val plan = paired.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.length} exchanges")
      assert(paired.count() == 32)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
