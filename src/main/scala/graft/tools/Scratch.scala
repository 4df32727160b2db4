package graft
import org.apache.spark.sql.{SparkSession, functions => F}

/** Ad-hoc plan probe: runMain graft.Scratch <query> [sfDir] [-v]
  * Prints exchange/reuse counts for a named SparkEntry query (the
  * self-join-reuse check NOTES warns about), full plan with -v.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("t_tfidf_top")
    val dir = args.drop(1).find(!_.startsWith("-")).getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[scratch] $name exchanges=$exchanges reused=$reused")
    if (args.contains("-v")) println(plan)
    spark.stop()
  }
}
