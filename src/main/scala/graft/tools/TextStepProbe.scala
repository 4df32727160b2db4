package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level wall + Spark-job probe for the TEXT-index query paths the
  * r19 round targets: e40_hybrid_indexed's fusion half (text index build,
  * norms persist, BM25 arm, vector arm, RRF fuse) and e19_index_refresh's
  * build/refresh/query segments — the job-count evidence VERDICT r18
  * item 7 asked for ("examined, left alone" needs a committed probe log).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.TextStepProbe"
  */
object TextStepProbe {
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
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9 // BEFORE the listener sleep
      Thread.sleep(300)
      println(f"STEP $name%-40s $dt%8.3f s  jobs=${jobCount.get() - j0}%3d")
      r
    }
    import graft.search.{AnnIndex, InvertedIndex, Searcher}
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    d.count(); emb.count() // warm the readers

    // warm one full e40 so JIT/codegen costs don't land on the measured
    // iteration (the bench warms every query at sf0.001 first)
    graft.SparkEntry.queries("e40_hybrid_indexed")(spark, sfDir).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val ti = "e40_text_idx"
      val vt = "e40_vec_idx"
      t("e40 reset") {
        graft.queries.Tables.reset(spark, ti, s"${ti}__norms",
          s"${ti}__compacting", s"${ti}__old")
        graft.queries.Tables.reset(spark, vt, s"${vt}__centroids",
          s"${vt}__meta")
      }
      t("e40 text writeIndex") {
        InvertedIndex.writeIndex(
          InvertedIndex.postings(d, "doc_id", "text", uax29 = false),
          ti, buckets = 8, force = true)
      }
      t("e40 persistNorms") { InvertedIndex.persistNorms(spark, ti) }
      t("e40 writeIvfIndex") {
        AnnIndex.writeIvfIndex(emb, "vec_id", "embedding", step = 50,
          table = vt, buckets = 8, force = true)
      }
      val post = InvertedIndex.readIndex(spark, ti)
      val bm = {
        import org.apache.spark.sql.expressions.Window
        InvertedIndex.bm25TopK(post,
          InvertedIndex.normsOf(spark, ti, post),
          Seq("spark", "window", "data"), k = 20)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
          .select("doc_id", "rank")
      }
      t("e40 bm25 arm count") { bm.count() }
      val vec = t("e40 ivfKnnIndexed plan+probe") {
        AnnIndex.ivfKnnIndexed(spark, vt,
          emb.where(col("vec_id") === 0), "vec_id", "embedding",
          k = 20, nprobe = 3)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
      }
      t("e40 fuse count") { Searcher.rrfFuse(Seq(bm, vec), topK = 15).count() }

      // --- e19_index_refresh segments ---
      val table = "e19_refresh_idx"
      t("e19 reset") {
        graft.queries.Tables.reset(spark, table, s"${table}__norms",
          s"${table}__compacting", s"${table}__old")
      }
      val old = d.where(col("doc_id") % 11 =!= 0).select("doc_id", "text")
      val nw = d.where(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev1")))
            .otherwise(col("text")).as("text"))
      t("e19 build(old)") {
        InvertedIndex.writeIndex(
          InvertedIndex.postings(old, "doc_id", "text", uax29 = false),
          table, buckets = 8, force = true)
      }
      t("e19 refreshIndex") {
        InvertedIndex.refreshIndex(spark, table, old, nw, "doc_id", "text",
          buckets = 8, uax29 = false)
      }
      t("e19 phraseHits count") {
        InvertedIndex.phraseHits(InvertedIndex.readIndex(spark, table),
          Seq("batch batch", "spark window", "data line",
            "no such phrase xyz"), uax29 = false).count()
      }
    }
    spark.stop()
  }
}
