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
  /** Broadcast the session's Hadoop conf for executor-side FileSystem
    * access (distributed byte-level file ops, e.g. shard consolidation).
    * `SerializableConfiguration` is private[spark], hence this shim.
    */
  def serializableHadoopConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[
          org.apache.spark.util.SerializableConfiguration] =
    org.apache.spark.util.SerializableConfiguration.broadcast(spark.sparkContext)

  /** `spark.sql.files.maxPartitionBytes` as a long — the scan-split size
    * the optimizer's size estimates divide into splits. (SQLConf is
    * private[sql], hence surfaced through this shim.)
    */
  def filesMaxPartitionBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.sessionState.conf.filesMaxPartitionBytes

  /** Provable cap on the scan-split count of `df`'s leaves, from the file
    * listing alone. Unsplittable inputs (gzip/zstd JSONL et al.) scan as
    * ONE partition per file however large their byte size, so the
    * optimizer's `sizeInBytes` wildly over-estimates their parallelism —
    * the exact case a pure byte heuristic gets wrong. Returns
    * Some(totalFileCount) when EVERY leaf is a file scan whose files are
    * all unsplittable; None otherwise (splittable or non-file leaves ⇒ no
    * useful bound, fall back to the byte estimate). Planning-only: reads
    * the FileIndex's already-cached listing, instantiates no RDDs.
    */
  def unsplittableScanFiles(df: org.apache.spark.sql.DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val spark = df.sparkSession
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    var total = 0L
    val allCapped = leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val files = fs.location.inputFiles
          files.nonEmpty &&
            files.forall(f => !fs.fileFormat.isSplitable(
              spark, fs.options, new org.apache.hadoop.fs.Path(f))) &&
            { total += files.length; true }
        case _ => false
      }
      case _ => false
    }
    if (allCapped) Some(total) else None
  }

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
