package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bf = topSet(Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", k = 5))
    val ivf = topSet(Similarity.ivfKnn(emb, q, "vec_id", "embedding", k = 5, step = 50, nprobe = 3))
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", step = 50, iters = 3)
    val ivfKm = topSet(Similarity.ivfKnnWith(emb, q, cents, "vec_id", "embedding", k = 5, nprobe = 3))
    val pq = topSet(Similarity.pqKnn(emb, q, "vec_id", "embedding", k = 5, m = 8, step = 50))
    val pqFine = topSet(Similarity.pqKnn(emb, q, "vec_id", "embedding", k = 5, m = 16, step = 10))
    val ivfpq = topSet(Similarity.ivfPqKnn(emb, q, "vec_id", "embedding",
      k = 5, step = 50, nprobe = 3, m = 8, codeStep = 50))
    val ivfpqFine = topSet(Similarity.ivfPqKnn(emb, q, "vec_id", "embedding",
      k = 5, step = 50, nprobe = 5, m = 16, codeStep = 10))
    println(s"RECALL ivf_sample=${(bf & ivf).size.toDouble / bf.size}")
    println(s"RECALL ivf_kmeans=${(bf & ivfKm).size.toDouble / bf.size}")
    // k-means codebook at the SAME k as the step=50 sample codebook
    // (K = n/50), trained on a 10x larger sample — the apples-to-apples
    // refinement comparison
    val kPq = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 8,
      step = 50).head.length
    val kmCb = Similarity.pqCodebookKmeans(emb, "vec_id", "embedding",
      m = 8, k = kPq, step = 5, iters = 5)
    val pqKm = topSet(Similarity.pqKnn(emb, q, "vec_id", "embedding", k = 5,
      m = 8, codebook = Some(kmCb)))
    println(s"RECALL pq_adc_m8_k10=${(bf & pq).size.toDouble / bf.size}")
    println(s"RECALL pq_adc_m8_kmeans_k$kPq=${(bf & pqKm).size.toDouble / bf.size}")
    println(s"RECALL pq_adc_m16_k50=${(bf & pqFine).size.toDouble / bf.size}")
    println(s"RECALL ivfpq_m8_nprobe3=${(bf & ivfpq).size.toDouble / bf.size}")
    println(s"RECALL ivfpq_m16_nprobe5=${(bf & ivfpqFine).size.toDouble / bf.size}")
    spark.stop()
  }
}
