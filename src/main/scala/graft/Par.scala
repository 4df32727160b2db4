package graft

import org.apache.spark.sql.DataFrame

/** Parallelism helper for CPU-heavy operators fed by small scans.
  *
  * A single small parquet file arrives as ONE input partition, which
  * serializes everything downstream of it — fatal when the next step
  * multiplies work per row (n-gram explode, pairwise cosine, k-hash
  * signatures). `fanOut` spreads such inputs across the cluster's cores
  * first; on genuinely large inputs (≥ half the default parallelism in
  * partitions already) it is a no-op, so operators can call it
  * unconditionally — at 100 TB the scan already has thousands of splits
  * and no extra shuffle happens.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
