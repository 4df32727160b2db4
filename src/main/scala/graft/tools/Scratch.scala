package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface):
  * runs the full SparkEntry query set under config variants passed as
  * `key=value` args, printing per-variant totals.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val confs = args.map { a => val Array(k, v) = a.split("=", 2); (k, v) }
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("scratch")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val t0 = System.nanoTime()
    val times = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val q0 = System.nanoTime()
      try fn(spark, dir).count() catch { case e: Throwable => println(s"FAIL $name: $e") }
      name -> (System.nanoTime() - q0) / 1e9
    }
    println(f"SCRATCH total ${(System.nanoTime() - t0) / 1e9}%.2f s  conf=${confs.mkString(",")}")
    times.sortBy(-_._2).take(8).foreach { case (n, t) => println(f"  $n%-25s $t%.2f") }
    spark.stop()
  }
}
