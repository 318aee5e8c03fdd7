package graft

import org.apache.spark.sql.functions._
import graft.raster.CompositeMaxAggregator

/** Max-value composite (MVC) contract: per-pixel max across scenes,
  * nodata-transparent, order-independent tie rule (later date wins),
  * None where no scene observed the pixel — plus the merge path under
  * forced multi-partition input. */
class CompositeSpec extends SparkSpec {

  private val D = (v: Double) => java.lang.Double.valueOf(v)
  private val N: java.lang.Double = null

  test("per-pixel max across scenes with nodata and all-masked slots") {
    import spark.implicits._
    // 3 scenes x 4 pixels; pixel 3 never valid, pixel 0 max on day 20
    val scenes = Seq(
      (Seq(D(0.1), N, D(0.5), N), 10),
      (Seq(D(0.7), D(0.2), N, N), 20),
      (Seq(D(0.4), D(0.2), D(0.5), N), 30))
      .toDF("px", "day").withColumn("cell", lit(1L))
    val out = scenes.groupBy(col("cell"))
      .agg(CompositeMaxAggregator.column(col("px"), col("day")).as("c"))
      .select(col("c.mx"), col("c.winDay"), col("c.nValid"))
      .as[(Seq[Option[Double]], Seq[Option[Int]], Seq[Long])].head()
    assert(out._1 == Seq(Some(0.7), Some(0.2), Some(0.5), None))
    // pixel 1 ties 0.2 between day 20 and 30 -> later day wins;
    // pixel 2 ties 0.5 between day 10 and 30 -> 30
    assert(out._2 == Seq(Some(20), Some(30), Some(30), None))
    assert(out._3 == Seq(3L, 2L, 2L, 0L))
  }

  test("merge across partitions equals single-partition result") {
    import spark.implicits._
    val rows = (0 until 64).map { i =>
      val px = (0 until 8).map { j =>
        if ((i * 8 + j) % 5 == 0) N else D(((i * 31 + j * 17) % 100) / 100.0)
      }
      (i.toLong % 4, px, 1000 + i)
    }
    def composite(parts: Int) =
      rows.toDF("cell", "px", "day").repartition(parts)
        .groupBy(col("cell"))
        .agg(CompositeMaxAggregator.column(col("px"), col("day")).as("c"))
        .select(col("cell"), col("c.mx"), col("c.winDay"), col("c.nValid"))
        .as[(Long, Seq[Option[Double]], Seq[Option[Int]], Seq[Long])]
        .collect().sortBy(_._1).toSeq
    assert(composite(1) == composite(13))
  }

  test("tile-size drift across scenes of one cell is refused") {
    import spark.implicits._
    val bad = Seq((1L, Seq(D(0.1), D(0.2)), 10), (1L, Seq(D(0.3)), 20))
      .toDF("cell", "px", "day")
    val e = intercept[Exception] {
      bad.groupBy(col("cell"))
        .agg(CompositeMaxAggregator.column(col("px"), col("day")).as("c"))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
