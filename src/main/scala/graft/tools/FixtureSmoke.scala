package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.NgramOps
import graft.sources.Corpus

/** Replicates the reference CI's smoke workload (reference
  * .github/workflows/rust.yml:44-57: topk/botk -n 3 -k 20, count -s "The",
  * stats, unique) over the same 1,000-doc C4 fixture, through this
  * library's public surface. Usage:
  *
  *   sbt "runMain graft.tools.FixtureSmoke [path-to-jsonl-gz]"
  */
object FixtureSmoke {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "/root/reference/test_fixtures/c4-sample.00000-of-00001.json.gz")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Corpus.readJsonl(spark, Seq(path)).cache()
    println(s"docs=${docs.count()}")

    println("== topk -n 3 -k 20 ==")
    NgramOps.topK(docs, "text", n = 3, k = 20).collect()
      .foreach(r => println(f"${r.getLong(1)}%8d  ${r.getString(0)}"))

    println("== botk -n 3 -k 5 ==")
    NgramOps.botK(docs, "text", n = 3, k = 5).collect()
      .foreach(r => println(f"${r.getLong(1)}%8d  ${r.getString(0)}"))

    println("== count -s \"The\" ==")
    NgramOps.countPhrases(docs, "text", Seq("The")).collect()
      .foreach(r => println(s"${r.getString(0)} -> ${r.getLong(1)}"))

    println("== stats ==")
    println(NgramOps.stats(docs, "text").collect().head)

    println("== unique -n 3 (exact vs approx) ==")
    val exact = NgramOps.uniqueExact(docs, "text", 3).collect().head.getLong(0)
    val approx = NgramOps.uniqueApprox(docs, "text", 3).collect().head.getLong(0)
    println(s"exact=$exact approx=$approx relerr=${math.abs(approx - exact).toDouble / exact}")

    spark.stop()
  }
}
