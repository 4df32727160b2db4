package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Sessions, SparkEntry}

/** Repeat-timing probe for named SparkEntry queries — separates real
  * regressions from per-run noise before chasing a bench number.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <reps> <name> [<name>...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // per-rep Spark-job counter: job counts are the host-noise-immune
    // companion to the wall columns on this multi-tenant box (r18)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm
    // a leading '+' re-enables InferFiltersFromGenerate for that run —
    // the A/B lever for explode-regression bisection
    names.foreach { name0 =>
      val (name, rules) =
        if (name0.startsWith("+")) (name0.drop(1), "")
        else (name0,
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      spark.conf.set("spark.sql.optimizer.excludedRules", rules)
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val j0 = jobCount.get()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener bus is async
        (dt, jobCount.get() - j0)
      }
      println(f"$name0%-28s ${times.map(t => f"${t._1}%6.2f").mkString(" ")}" +
        f"  min=${times.map(_._1).min}%6.2f" +
        f"  jobs=${times.map(_._2).min}%4d")
    }
    spark.stop()
  }
}
