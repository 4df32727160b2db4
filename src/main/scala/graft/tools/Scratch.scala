package graft
import org.apache.spark.sql.{SparkSession, functions => F}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val dir = "/root/testdata/sf0.1"
    time("warm")(spark.read.parquet(s"$dir/documents.parquet").count())
    for (i <- 1 to 3) {
      time(s"t_dsir run$i")(SparkEntry.queries("t_dsir")(spark, dir).count())
    }
    for (i <- 1 to 2) time(s"d_cc_clusters run$i")(SparkEntry.queries("d_cc_clusters")(spark, dir).count())
    spark.stop()
  }
}
