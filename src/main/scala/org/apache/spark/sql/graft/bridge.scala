package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so this
  * one-file package escape is the standard way for an external Spark
  * extension library to lift custom Catalyst expressions into the public
  * Column API (same pattern as frameless / sedona / delta).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage blocks behind an eagerly `localCheckpoint`-ed
    * Dataset. `Dataset.unpersist()` is a no-op there — the checkpoint RDD's
    * blocks are not registered with the cache manager — so iterative
    * algorithms (connected components et al.) that checkpoint every round
    * would otherwise hold every round's blocks until GC. Only call once the
    * Dataset (and everything derived from it lazily) is no longer needed:
    * a local checkpoint cannot be recomputed after its blocks are dropped.
    * Returns false when the plan is not a materialized checkpoint/RDD scan.
    */
  /** `spark.sql.files.maxPartitionBytes` as a long — the scan-split size
    * the optimizer's size estimates divide into splits. (SQLConf is
    * private[sql], hence surfaced through this shim.)
    */
  def filesMaxPartitionBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.sessionState.conf.filesMaxPartitionBytes

  def releaseLocalCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Boolean =
    ds match {
      case c: org.apache.spark.sql.classic.Dataset[_] =>
        c.queryExecution.analyzed match {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
            true
          case _ => false
        }
      case _ => false
    }
}
