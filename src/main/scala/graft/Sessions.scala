package graft

import org.apache.spark.sql.SparkSession

/** Session-level optimizer tuning for the engine's workload shape.
  *
  * Every generator in this library explodes a COMPUTED array (n-grams,
  * MinHash signatures, winnowing fingerprints, bigram structs) — never a
  * stored column. For that shape Spark's `InferFiltersFromGenerate` is
  * actively harmful: the inferred `size(arr) > 0 AND isnotnull(arr)` filter
  * is substituted through the producing projections by predicate pushdown
  * and lands in the file scan's data filters, where the ENTIRE array
  * expression (md5 per shingle, k hash lanes, HOF folds) is re-evaluated —
  * interpreted, and in the scan stage, i.e. BEFORE any fan-out repartition,
  * so on a single input split it also runs single-threaded. Measured at
  * sf0.1: the winnowing explode went 19 s → 0.45 s with the rule excluded
  * (the rule's only benefit — skipping rows whose stored array is empty —
  * never applies here).
  *
  * `spark.sql.optimizer.excludedRules` is a runtime conf read per
  * optimization pass, so tuning works on an already-built session; existing
  * exclusions are preserved.
  */
object Sessions {

  private val ExcludedRules = Seq(
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  /** Apply engine-appropriate optimizer settings to `spark`; returns it. */
  def tune(spark: SparkSession): SparkSession = {
    val key = "spark.sql.optimizer.excludedRules"
    val existing = spark.conf.getOption(key).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    spark.conf.set(key, (existing ++ ExcludedRules).distinct.mkString(","))
    // this engine's bucketed tables (S9 corpus tier, the inverted index)
    // exist FOR bucket pruning on point/IN lookups; the auto-bucketed-scan
    // heuristic disables bucketed reads in filter-only plans (no join or
    // agg "uses" the bucketing) and silently turns a one-bucket term
    // lookup back into a full scan of the index. Pruning > the heuristic's
    // batch-coalescing win for this workload shape.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    // every capped driver gather in this engine (centroid frames, band-key
    // prunes, sorted-long dedup sets, PQ samples) is a `limit(cap+1)
    // .collect()` over a CONTRACTUALLY BOUNDED side frame — executeTake's
    // default ramp (1 partition, then ×4 per round) turns each one into
    // 3-4 scheduler round-trips because the cap is never reached and every
    // partition gets scanned anyway (measured r19: 4 jobs per centroid
    // gather on every indexed ANN query/maintenance call). One round over
    // min(1024, N) partitions collapses each gather to ONE job; the
    // engine has no selective limit-probe over a huge table that the old
    // ramp would have served better (semantic top-k queries all carry an
    // ORDER BY and execute as TakeOrderedAndProject, which this conf does
    // not touch).
    spark.conf.set("spark.sql.limit.initialNumPartitions", "1024")
    spark
  }
}
