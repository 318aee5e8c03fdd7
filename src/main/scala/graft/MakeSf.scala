package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic LOCAL scale-up generator: `runMain graft.MakeSf <src>
  * <dst> [factor]` builds a `factor`× copy of an existing testdata SF
  * directory by id-remapped shifted copies — the sf1 shakeout input for
  * PERF.md's scaling-exponent table (the committed driver SFs stay
  * authoritative for correctness; this never writes under /root/testdata).
  *
  * Copies are MUTATED on the similarity-sensitive columns so the dedup /
  * ANN families keep a natural candidate rate instead of factor-clique
  * duplicate clusters that would quadratically distort any scaling
  * measurement:
  *  - document text: copy k>0 suffixes EVERY word with the copy id, so
  *    copies are token-disjoint — no cross-copy shingle, set-overlap or
  *    MinHash matches survive, and each copy reproduces the original
  *    corpus's internal duplication exactly. The scaled corpus is then
  *    `factor` independent instances of the original workload: a linear
  *    engine shows ~factor×, and any excess is the engine's own
  *    super-linearity, not constructed duplicate cliques. (An earlier
  *    word-DROPPING mutation kept word sets ~75% overlapping across
  *    copies, which made every doc a genuine set-similarity match of its
  *    9 siblings — a useful high-duplication STRESS, but a confounded
  *    scaling measurement; see PERF.md round 13 for both readings.)
  *  - embeddings: copy k rotates the vector by 7k positions — norm
  *    preserved, direction decorrelated;
  *  - ids multiply by `factor` and add k (FK integrity preserved across
  *    orders/lineitem/customer/part/supplier; user population scales so
  *    per-user event profiles keep their shape);
  *  - region/nation are fixed dimensions and copy through unchanged.
  */
object MakeSf {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeSf <srcDir> <dstDir> [factor]")
    val src = args(0); val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val kCol = explode(sequence(lit(0), lit(factor - 1))).as("k")
    def remap(id: String): org.apache.spark.sql.Column =
      (col(id) * factor + col("k")).as(id)
    def fanned(t: String): DataFrame =
      Tables.table(spark, src, t).select(col("*"), kCol)

    def write(df: DataFrame, t: String): Unit = {
      df.repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[makesf] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // fixed dims: straight copies
    Seq("region", "nation").foreach(t => write(Tables.table(spark, src, t), t))

    write(fanned("documents").select(
      remap("doc_id"),
      when(col("k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("·"), col("k"))), " ")).as("text"),
      col("lang"), col("source")).withColumn("n_chars", length(col("text"))),
      "documents")

    write(fanned("embeddings").select(
      remap("vec_id"),
      {
        val e = col("embedding"); val n = size(e)
        val rot = (col("k") * 7) % n
        when(col("k") === 0, e).otherwise(
          concat(slice(e, rot + 1, n - rot), slice(e, lit(1), rot))).as("embedding")
      },
      col("label")), "embeddings")

    write(fanned("events").select(
      remap("event_id"), col("ts"), remap("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    write(fanned("orders").select(
      remap("o_orderkey"), remap("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")), "orders")

    write(fanned("lineitem").select(
      remap("l_orderkey"), remap("l_partkey"), remap("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    write(fanned("customer").select(
      remap("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer")

    write(fanned("supplier").select(
      remap("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier")

    write(fanned("part").select(
      remap("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), "part")

    spark.stop()
  }
}
