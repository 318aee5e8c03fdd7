package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression conversion behind private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). Custom Catalyst
  * expressions (SURVEY.md §7) need both directions; this bridge lives in a
  * subpackage of org.apache.spark.sql solely to re-export them. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Clone a session: same SparkContext/cache/catalog, but an
    * independent SQLConf *copied* from the parent (unlike the public
    * `newSession()`, which resets runtime conf to builder defaults).
    * Lets a writer scope a conf override to one job without mutating —
    * or even locking — the user's session. */
  def cloneSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Re-bind a DataFrame's logical plan to another session (the write
    * path then resolves conf from that session, not the plan's origin). */
  def ofRows(s: org.apache.spark.sql.SparkSession,
             df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.logical)

  /** Materialize a DataFrame ONCE as a persisted InternalRow RDD and
    * wrap it as a fresh DataFrame whose plan is a bare LogicalRDD.
    * Like `localCheckpoint()` but WITHOUT carrying the origin plan's
    * constraints/statistics into the new leaf — Spark 4.1's
    * localCheckpoint copies `originConstraints` whose expression ids can
    * escape the new output when the checkpointed frame lands under a
    * Union (UnionBase.rewriteConstraints throws key-not-found; hit by
    * graft's merge-source materialization, r18). The rows are copied
    * (toRdd reuses UnsafeRow buffers) and persisted MEMORY_AND_DISK;
    * `count()` makes materialization eager so exactly one evaluation of
    * the origin plan ever runs. */
  def materialize(s: org.apache.spark.sql.SparkSession,
                  df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    cs.internalCreateDataFrame(rdd, df.schema)
  }
}
