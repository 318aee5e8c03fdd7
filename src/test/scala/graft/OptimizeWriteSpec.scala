package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.VersionedTable

/** The opt-in optimized write (`spark.graft.optimizeWrite=true`):
  * partitioned writes re-shuffle on the layout's directory cells so
  * each cell lands in ~one task — ~one file per cell instead of
  * (tasks x cells) small files. Off by default (a pre-clustered
  * caller must keep their ordering). */
class OptimizeWriteSpec extends SparkSpec {
  import spark.implicits._

  test("aligned write emits ~one file per cell; default stays un-shuffled") {
    def build(opt: Boolean): Int = {
      val root = Files.createTempDirectory("graft_ow").resolve("t").toString
      val df = (0 until 2000).map(i => (i.toLong, i % 5))
        .toDF("id", "cell").repartition(16) // sprayed: every task sees every cell
      if (opt) spark.conf.set("spark.graft.optimizeWrite", "true")
      try VersionedTable.create(spark, root, df, partitionBy = Seq("cell"))
      finally spark.conf.unset("spark.graft.optimizeWrite")
      val files = VersionedTable.filesOf(spark, root)
      // identical content either way
      assert(VersionedTable.read(spark, root).count() == 2000)
      files.size
    }
    val sprayed = build(opt = false)
    val aligned = build(opt = true)
    assert(aligned == 5, s"one file per cell expected, got $aligned")
    assert(sprayed > aligned,
      s"un-aligned write should spray (got $sprayed vs $aligned)")
  }
}
