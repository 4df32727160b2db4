package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-count attribution for the ann_stream_compact lifecycle — which
  * segment (build / setup / stream / compact / battery) pays how many
  * Spark jobs. Job counts are the host-noise-immune metric on this
  * multi-tenant box (see [[AnnStepProbe]]).
  *
  * Usage: sbt "runMain graft.tools.StreamLifecycleProbe [sfDir]"
  */
object StreamLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
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
      println(f"SEG $name%-24s $dt%8.3f s  jobs=${jobCount.get() - j0}%3d")
      r
    }
    // per-trigger attribution (r19, VERDICT item 5): Structured Streaming's
    // own durationMs map splits each micro-batch into addBatch (the actual
    // work our foreachBatch does) vs machinery (offset resolution, WAL
    // commit, planning, offset commit) — mechanical evidence for the
    // "fixed per-trigger floor vs addressable work" verdict.
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          import scala.jdk.CollectionConverters._
          val total = Option(d.get("triggerExecution")).map(_.longValue)
            .getOrElse(-1L)
          val add = Option(d.get("addBatch")).map(_.longValue).getOrElse(0L)
          val rest = d.asScala.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(f"TRIGGER batch=${e.progress.batchId}%2d rows=" +
            f"${e.progress.numInputRows}%6d total=${total}%5d ms " +
            f"addBatch=${add}%5d ms machinery=${total - add}%5d ms | $rest")
        }
      })
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val table = "slp_idx"
      t("reset") {
        graft.queries.Tables.reset(spark, table, s"${table}__centroids",
          s"${table}__meta")
      }
      val tmp = java.nio.file.Files.createTempDirectory("slp").toString
      t("build") {
        graft.search.AnnIndex.writeIvfIndex(
          emb.where(col("vec_id") % 3 =!= 1), "vec_id", "embedding",
          step = 50, table = table, buckets = 8, force = true)
      }
      val arrivals = emb.where(col("vec_id") % 3 === 1)
        .select("vec_id", "embedding")
      t("setup") {
        arrivals.repartition(2).write.mode("overwrite").parquet(s"$tmp/src")
      }
      val assign = t("assigner-init") {
        graft.search.AnnIndex.streamAssigner(spark, table,
          "vec_id", "embedding")
      }
      t("stream") {
        val in = spark.readStream.schema(arrivals.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
        val q = in.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            assign(batch.toDF())
              .write.mode("append").parquet(s"$tmp/appends")
          }
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      t("compact") {
        graft.search.AnnIndex.compactIvfIndex(spark, table,
          spark.read.parquet(s"$tmp/appends"))
      }
      t("battery+count") {
        graft.search.AnnIndex.ivfKnnIndexed(spark, table,
          emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 5, nprobe = 3).count()
      }
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
