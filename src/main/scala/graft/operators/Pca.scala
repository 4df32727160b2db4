package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal components of an embedding column — the dimensionality
  * reduction step a training-data pipeline runs in front of the ANN /
  * SemDeDup tier (project 1024-d embeddings to the 64 directions that
  * carry the variance, then bucket/score in the cheap space).
  *
  * Split exactly along Spark's execution boundary:
  *   - the DISTRIBUTED part is one pass collecting the second-moment
  *     sufficient statistics (n, Σx, ΣxxT) via a typed [[Aggregator]]
  *     whose buffer is d + d² doubles — partials combine map-side, the
  *     driver sees one buffer, the corpus is never shuffled. (Spark has
  *     no elementwise array-sum aggregate, and the explode-to-(i,j)
  *     relational encoding is n·d² rows — the aggregator holds the d²
  *     state once per partial instead of once per row.)
  *   - the O(d²)–O(d³) part — assembling the covariance and the Jacobi
  *     eigensolve — runs on the driver: d×d is KB-to-MB-sized by
  *     construction, never data-sized. The cost model is the same as
  *     MLlib's RowMatrix.computeCovariance + local eigensolve, expressed
  *     Dataset-first instead of over RDD[Vector].
  *
  * Everything downstream (centering, projection) is codegen'd column
  * algebra over literal component vectors — no UDF, no join.
  */
object Pca {

  /** Sufficient statistics of a d-dim embedding sample: row count, per-dim
    * sums, and the flattened upper-triangle-complete d×d Σ x·xT.
    */
  final case class Moments(n: Long, sums: Array[Double], prods: Array[Double])

  /** One-pass moments Aggregator. The zero is dimension-less (d isn't
    * known until the first row) — reduce/merge adopt the first non-empty
    * operand's dimension and require every later row to agree.
    */
  class MomentsAgg extends Aggregator[Seq[Double], Moments, Moments] {
    override def zero: Moments = Moments(0L, Array.empty, Array.empty)
    override def reduce(b: Moments, v: Seq[Double]): Moments = {
      if (v == null) return b
      val d = v.length
      val m = if (b.n == 0L && b.sums.isEmpty)
        Moments(0L, new Array[Double](d), new Array[Double](d * d))
      else b
      require(m.sums.length == d,
        s"embedding dimension changed mid-aggregation: ${m.sums.length} vs $d")
      val x = v.toArray
      var i = 0
      while (i < d) {
        m.sums(i) += x(i)
        var j = 0
        val row = i * d
        while (j < d) { m.prods(row + j) += x(i) * x(j); j += 1 }
        i += 1
      }
      Moments(m.n + 1, m.sums, m.prods)
    }
    override def merge(a: Moments, b: Moments): Moments = {
      if (a.n == 0L && a.sums.isEmpty) return b
      if (b.n == 0L && b.sums.isEmpty) return a
      require(a.sums.length == b.sums.length,
        s"embedding dimension mismatch: ${a.sums.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
      Moments(a.n + b.n, a.sums, a.prods)
    }
    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** The one-row moments frame for `vecCol` (floats upcast so accumulation
    * is double everywhere). Null vectors are skipped. Also the streaming
    * twin: on a streaming frame this is a global typed aggregation —
    * write it with Complete output mode and the sink holds the running
    * moments across micro-batches (spec-asserted equal to the batch
    * result), ready for a periodic refit.
    */
  def moments(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .as[Seq[Double]]
      .select(new MomentsAgg().toColumn)
      .toDF() // encoder schema: (n, sums, prods)
  }

  /** Long-form SAMPLE covariance matrix of the embedding column: one row
    * per (i, j) with i ≤ j (0-based dims, the matrix is symmetric),
    * cov = (Σxy − Σx·Σy/n) / (n−1), rounded to 6 so the DuckDB replay
    * hash-matches. Empty when n < 2 (covariance undefined). The explode
    * from the one-row moments frame is d²-sized — metadata-scale output,
    * not data-scale.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val d = size(col("sums"))
    moments(df, vecCol)
      .where(col("n") >= 2)
      .select(col("n"), col("sums"), posexplode(col("prods")).as(Seq("idx", "sp")))
      .select(col("n"), col("sums"),
        (col("idx") / d).cast("long").as("i"),
        (col("idx") % d).cast("long").as("j"), col("sp"))
      .where(col("i") <= col("j"))
      .select(col("i"), col("j"),
        // + 0.0 folds IEEE −0.0 (a tiny negative covariance rounded away)
        // to +0.0 — DuckDB and Spark format them differently otherwise
        (round((col("sp") -
            element_at(col("sums"), (col("i") + 1).cast("int")) *
            element_at(col("sums"), (col("j") + 1).cast("int")) / col("n")) /
          (col("n") - 1), 6) + lit(0.0)).as("cov"))
  }

  /** A fitted PCA basis: the sample mean, the top-k eigenvalues of the
    * sample covariance (descending), their eigenvectors (rows, matching
    * order), and each component's explained-variance ratio against the
    * TOTAL variance (all d eigenvalues, not just the kept k).
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            explainedVariance: Array[Double])

  /** Fit the top-k principal components. One distributed pass ([[moments]]),
    * then a driver-side Jacobi eigensolve of the d×d covariance — collect
    * size is d² doubles, independent of row count. Deterministic given the
    * moments: cyclic Jacobi with a fixed sweep schedule and a fixed sign
    * convention (each component's max-|coefficient| entry — first on ties —
    * is positive).
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, "need at least one component")
    val m = moments(df, vecCol).head()
    val n = m.getLong(0)
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    val sums = m.getSeq[Double](1).toArray
    val prods = m.getSeq[Double](2).toArray
    val d = sums.length
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      (prods(i * d + j) - sums(i) * sums(j) / n) / (n - 1)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val total = vals.sum.max(java.lang.Double.MIN_NORMAL)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    PcaModel(mean,
      order.map(vals).toArray,
      order.map(i => signFixed(vecs(i))).toArray,
      order.map(i => vals(i) / total).toArray)
  }

  /** Project `vecCol` onto a fitted basis: center by the model mean, then
    * one codegen'd dot product per component against its literal vector —
    * a pure projection, no shuffle, streaming-safe. Output: `idCol`,
    * `proj` (array of k doubles).
    *
    * `whiten` divides each coordinate by √eigenvalue so the projected
    * covariance is the identity — the PCA-whitening preprocessing
    * SemDeDup-style cosine pipelines use to stop high-variance directions
    * from dominating the similarity. Near-zero eigenvalues are floored at
    * 1e-12 (a direction with no variance carries no signal to rescale).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: PcaModel, whiten: Boolean = false): DataFrame = {
    val mean = typedLit(model.mean.toSeq)
    val centered = zip_with(transform(col(vecCol), _.cast("double")), mean,
      (x, mu) => x - mu)
    val proj = array(model.components.zipWithIndex.map { case (c, j) =>
      val d = Similarity.dot(centered, typedLit(c.toSeq))
      if (whiten) d / math.sqrt(model.eigenvalues(j).max(1e-12)) else d
    }: _*)
    df.select(col(idCol), proj.as("proj"))
  }

  /** Deterministic sign: flip so the max-|x| entry (first index on exact
    * ties) is positive.
    */
  private def signFixed(v: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < v.length) {
      if (math.abs(v(i)) > math.abs(v(best))) best = i
      i += 1
    }
    if (v(best) < 0) v.map(-_) else v
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix (classic rotations,
    * Golub & Van Loan §8.5): returns (eigenvalues, eigenvectors-as-rows),
    * unordered. O(d³) per sweep, converges quadratically; 100 sweeps is
    * far past machine precision for any d this runs at.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && offDiag() > 1e-22) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > Double.MinPositiveValue) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
