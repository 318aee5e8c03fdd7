package graft

import org.apache.spark.sql.functions._
import graft.queries.LakehouseQueries
import graft.sink.VersionedTable
import graft.streaming.EventsStream

/** q160's incremental-view-maintenance contract: the CDC-driven refresh
  * must (a) equal a full recompute of the post-merge state exactly, and
  * (b) read only delta-sized input from the change feed — never a rescan
  * of the base table. */
class LakehouseSpec extends SparkSpec {

  test("q160 refreshed MV equals full recompute of the post-merge state") {
    val got = LakehouseQueries.defs("q160_incr_mv_refresh")(spark, sf)

    // full recompute of the merged state, straight from the raw table
    val ev = Tables.events(spark, sf)
    val base = ev.filter(col("event_id") % 3 =!= 0)
    val ups = base.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") * 2)
    val ins = ev.filter(col("event_id") % 3 === 0)
    val srcu = ups.unionByName(ins)
    val v2 = srcu.unionByName(
      base.join(srcu.select("event_id"), Seq("event_id"), "left_anti"))
    val want = v2.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("change feed after a merge is delta-sized, not base-sized") {
    val ev = Tables.events(spark, sf)
    val work = EventsStream.scratchDir("graft_mv_spec")
    val root = work.resolve("t").toString
    val base = ev.filter(col("event_id") % 3 =!= 0)
    val v1 = VersionedTable.create(spark, root, base)
    val ups = base.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") * 2)
    val ins = ev.filter(col("event_id") % 3 === 0)
    val v2 = VersionedTable.mergeInto(spark, root, ups.unionByName(ins),
      Seq("event_id"))

    val (added, removed) = VersionedTable.changesBetween(spark, root, v1, v2)
    val nUps = ups.count(); val nIns = ins.count()
    // every changed row surfaces, with its pre-image, and nothing else:
    // added = replaced rows' new versions + inserts; removed = the
    // replaced rows' old versions only (carried-over rows never appear)
    assert(added.count() == nUps + nIns)
    assert(removed.count() == nUps)
    assert(removed.filter(col("event_id") % 5 =!= 0).isEmpty)
  }
}
