package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The AQE skew-join claim PERF.md makes ("AQE skew-join handles residual
  * hot buckets"), executable: a join whose shuffle has one dominant key
  * gets its oversized partition SPLIT at runtime — the plan's
  * SortMergeJoin reports isSkewJoin and the shuffle read carries more
  * output partitions than the static shuffle width. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one dominant key (0) + a uniform tail: the key-0 shuffle partition
      // dwarfs the median and crosses the (lowered) skew threshold
      val fact = spark.range(0, 120000).toDF("i")
        .select(when(col("i") < 100000, 0L).otherwise(col("i") % 64).as("k"),
                concat(lit("payload_payload_payload_"), col("i")).as("v"))
      val dim = spark.range(0, 64).toDF("k")
        .select(col("k"), concat(lit("dim_"), col("k")).as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS frame (count() would plan its own query execution and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 120000)
      val root = joined.queryExecution.executedPlan
      // descend across adaptive/query-stage boundaries (QueryStageExec
      // holds its subtree in `plan`, not `children`)
      var smj = List.empty[SortMergeJoinExec]
      var reads = List.empty[AQEShuffleReadExec]
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case j: SortMergeJoinExec => smj ::= j
          case r: AQEShuffleReadExec => reads ::= r
          case _ => ()
        }
        p.children.foreach(walk)
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
          case _ => ()
        }
      }
      walk(root)
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$root")
      assert(smj.exists(_.isSkewJoin), s"expected isSkewJoin=true:\n$root")
      // the skewed side's shuffle read has more partitions than the static
      // width — the hot partition was split into parallel sub-reads
      val staticWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(reads.exists(_.partitionSpecs.length > staticWidth),
        s"expected a split shuffle read beyond $staticWidth partitions: " +
          s"${reads.map(_.partitionSpecs.length)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
