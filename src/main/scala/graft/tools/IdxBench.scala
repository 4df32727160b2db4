package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions._
object IdxBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count()
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val c = f
        println(f"IDX $name run$i ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$c")
      }
    }
    val toks = split(col("text"), " ")
    t("groupBy-shape") {
      d.select(col("doc_id"), size(toks).cast("long").as("dl"),
          posexplode(toks).as(Seq("pos", "term")))
        .groupBy("term", "doc_id")
        .agg(sort_array(collect_list(col("pos").cast("int"))).as("positions"),
          count(lit(1)).as("tf"), first(col("dl")).as("dl")).count()
    }
    t("kernel-shape") {
      graft.search.InvertedIndex.postings(d, "doc_id", "text", uax29 = false).count()
    }
    // ---- batch query surfaces at benchmark multiplicity (the reference's
    // contamination driver probes hundreds of phrases per msearch batch) ----
    val post = graft.search.InvertedIndex.postings(d, "doc_id", "text",
      uax29 = false).localCheckpoint()
    val top2 = graft.operators.NgramOps.topK(d, "text", 2, 500, uax29 = false)
      .collect().map(_.getString(0)).toSeq
    val top1 = graft.operators.NgramOps.topK(d, "text", 1, 20, uax29 = false)
      .collect().map(_.getString(0)).toSeq
    val pairs100 = (for (a <- top1.take(10); b <- top1.drop(10)) yield (a, b)).toSeq
    t("phraseHits-500") {
      graft.search.InvertedIndex.phraseHits(post, top2, uax29 = false).count()
    }
    t("slop1-500") {
      graft.search.InvertedIndex.countContainingSlop(post, top2, slop = 1,
        uax29 = false).count()
    }
    t("proximity-100") {
      graft.search.InvertedIndex.proximityPairs(post, pairs100, window = 3).count()
    }
    t("contamination-500") {
      graft.search.InvertedIndex.contaminationIndexed(post, top2, uax29 = false)
        .count()
    }
    // dictionary surfaces: regex over the postings scan; phrase-prefix =
    // expansion collect + one batch phrase plan over the expanded set
    t("regexp-terms") {
      graft.search.InvertedIndex.termsMatching(post, "s[a-z]+").count()
    }
    val prefixes20 = top1.take(20).map(t => t.substring(0, 1 max (t.length - 1)))
    t("phrase-prefix-20") {
      graft.search.InvertedIndex.phrasePrefixHits(post,
        prefixes20.map(p => s"${top1.head} $p"), uax29 = false).count()
    }
    // significant_terms: fg semi-join + two term aggs per heuristic call
    val norms = graft.search.InvertedIndex.corpusNorms(d, "text",
      uax29 = false).localCheckpoint()
    for (h <- Seq("jlh", "chi2", "mi")) t(s"significant-$h") {
      graft.search.InvertedIndex.significantTerms(post, norms,
        d.where(col("source") === "src18").select("doc_id"), k = 25,
        heuristic = h).count()
    }
    spark.stop()
  }
}
