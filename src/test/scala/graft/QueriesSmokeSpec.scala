package graft

/** Every declared query runs on sf0.001 and returns rows; every oracle key
  * refers to a declared query. The exact value check is the driver's
  * DuckDB-oracle gate (tools/check_oracle.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
