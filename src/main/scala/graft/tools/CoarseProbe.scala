package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.Similarity

/** Flat vs two-level IVF assignment at a LARGE centroid count — the
  * regime ivfAssignCoarse exists for. Synthesizes n vectors and assigns
  * with step chosen to yield ~n/step centroids, timing both kernels and
  * measuring the assignment agreement (the recall side of the dial).
  *
  * A 5th arg `clusters=K` plants K cluster directions (vector = its
  * cluster's direction + small hash noise) — real embeddings are
  * clusterable, and the dial's recall there is the number that matters.
  *
  *   runMain graft.tools.CoarseProbe [n] [dim] [step] [probes] [clusters=K]
  */
object CoarseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val step = args.lift(2).map(_.toInt).getOrElse(16)
    val probes = args.lift(3).map(_.toInt).getOrElse(4)
    val clusters = args.lift(4).collect {
      case s if s.startsWith("clusters=") => s.drop("clusters=".length).toInt
    }
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // deterministic pseudo-random vectors, no Random in executors:
    // uniform by default; with clusters=K, each row = its cluster's
    // direction plus ±0.05 hash noise per dimension
    def u(seedCol: org.apache.spark.sql.Column) =
      pmod(xxhash64(seedCol), lit(2000000L)).cast("double") / 1000000.0 - 1.0
    val df = spark.range(n.toLong).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j => (clusters match {
          case Some(k) =>
            u(pmod(col("id"), lit(k.toLong)) * lit(dim) + j + lit(7000000L)) +
              u(col("id") * lit(dim) + j) * 0.05
          case None => u(col("id") * lit(dim) + j)
        }).cast("float")).as("embedding"))
      .localCheckpoint(true)
    println(s"[coarse] n=$n dim=$dim step=$step (~${n / step} centroids) " +
      s"probes=$probes clusters=${clusters.getOrElse(0)}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[coarse] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warm both paths once at a trivial slice so JIT/codegen is out of frame
    Similarity.ivfAssign(df.limit(1000), "vec_id", "embedding", step).count()
    Similarity.ivfAssignCoarse(df.limit(1000), "vec_id", "embedding", step,
      probes).count()
    val flat = time("flat assign") {
      Similarity.ivfAssign(df, "vec_id", "embedding", step)
        .select(col("vec_id"), col("bucket")).localCheckpoint(true)
    }
    val nested = time("coarse assign") {
      Similarity.ivfAssignCoarse(df, "vec_id", "embedding", step, probes)
        .select(col("vec_id"), col("bucket").as("b2")).localCheckpoint(true)
    }
    val agree = flat.join(nested, "vec_id")
      .where(col("bucket") === col("b2")).count()
    println(f"[coarse] agreement ${agree.toDouble / n * 100}%6.2f %% of assignments identical")
    spark.stop()
  }
}
