package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level wall-clock probe for the persisted-ANN build/query paths —
  * the r18 optimization round's measuring instrument: times each Spark
  * action inside writeIvfIndex / writeIvfPqIndex / ivfKnnIndexed
  * separately (the bench only sees per-query totals; this attributes the
  * seconds to jobs so the job-count reductions have a before/after).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.AnnStepProbe"
  */
object AnnStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Spark-job counter: the job COUNT per step is the host-noise-free
    // before/after metric for the r18 job-elision work (each removed job
    // is a removed scan/collect/commit round-trip — wall clock on this
    // multi-tenant box swings 2× between runs, job counts do not)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    // GRAFT_PROBE_JOBS=1: print each job's callsite — attributes every
    // job inside a step to the source line that launched it (r19)
    val traceJobs = sys.env.get("GRAFT_PROBE_JOBS").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet()
          if (traceJobs) {
            // the result stage's name carries the action callsite
            // ("collect at AnnIndex.scala:1304"); properties only carry
            // a callsite when explicitly set, which these paths don't
            val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(s"  JOB ${js.jobId} [${js.stageInfos.size} stages] $site")
          }
        }
      })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9 // BEFORE the listener sleep
      // listener events are async — give the bus a beat before reading
      Thread.sleep(300)
      println(f"STEP $name%-40s $dt%8.3f s  jobs=${jobCount.get() - j0}%3d")
      r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm the reader

    // warm one full build+query so JIT/codegen costs don't land on the
    // measured iteration (the bench warms every query at sf0.001 first)
    graft.queries.Tables.reset(spark, "probe_warm", "probe_warm__centroids",
      "probe_warm__meta")
    graft.search.AnnIndex.writeIvfIndex(emb, "vec_id", "embedding",
      step = 50, table = "probe_warm", buckets = 8, force = true)
    graft.search.AnnIndex.ivfKnnIndexed(spark, "probe_warm",
      emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
      k = 5, nprobe = 3).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      t("reset") {
        graft.queries.Tables.reset(spark, "probe_ivf",
          "probe_ivf__centroids", "probe_ivf__meta")
      }
      t("writeIvfIndex TOTAL") {
        graft.search.AnnIndex.writeIvfIndex(emb, "vec_id", "embedding",
          step = 50, table = "probe_ivf", buckets = 8, force = true)
      }
      val q = emb.where(col("vec_id") % 100 === 0)
      t("ivfKnnIndexed+count") {
        graft.search.AnnIndex.ivfKnnIndexed(spark, "probe_ivf", q,
          "vec_id", "embedding", k = 5, nprobe = 3).count()
      }
      t("reset pq") {
        graft.queries.Tables.reset(spark, "probe_pq",
          "probe_pq__centroids", "probe_pq__codebook", "probe_pq__meta")
      }
      t("writeIvfPqIndex TOTAL") {
        graft.search.AnnIndex.writeIvfPqIndex(emb, "vec_id", "embedding",
          step = 50, m = 8, table = "probe_pq", buckets = 8, codeStep = 50,
          force = true)
      }
      t("ivfPqKnnIndexed+count") {
        graft.search.AnnIndex.ivfPqKnnIndexed(spark, "probe_pq", q,
          "vec_id", "embedding", k = 5, nprobe = 3).count()
      }
      t("upsertIvfIndex") {
        graft.search.AnnIndex.upsertIvfIndex(spark, "probe_ivf",
          emb.where(col("vec_id") % 3 === 1), "vec_id", "embedding")
      }
      t("calibrateProbes+count") {
        graft.search.AnnIndex.calibrateProbes(spark, "probe_ivf",
          emb.where(col("vec_id") % 100 === 1), "vec_id", "embedding",
          k = 5, targetRecall = 0.15, nprobes = Seq(1, 2, 3)).count()
      }
    }
    spark.stop()
  }
}
