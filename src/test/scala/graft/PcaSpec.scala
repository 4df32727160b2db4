package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA: Jacobi eigensolve against hand-solved matrices, moments/covariance
  * against direct computation, projection properties (projected covariance
  * is diag(eigenvalues)), and partition-count determinism of the
  * aggregator.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) <= eps, s"$a !~ $b")

  test("jacobiEigen: 2x2 and 3x3 hand-solved") {
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order2 = v2.indices.sortBy(i => -v2(i))
    approx(v2(order2(0)), 3.0); approx(v2(order2(1)), 1.0)
    // eigenvector of 3 is (1,1)/sqrt2 up to sign
    val top = e2(order2(0))
    approx(math.abs(top(0)), 1.0 / math.sqrt(2))
    approx(top(0) / top(1), 1.0)
    // diag matrix: eigenpairs are the axes
    val (v3, e3) = Pca.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(v3.sortBy(-_).toList === List(5.0, 3.0, 1.0))
    val axis = e3(v3.indexOf(5.0))
    approx(math.abs(axis(0)), 1.0); approx(axis(1), 0.0); approx(axis(2), 0.0)
  }

  private val rows: Seq[(Long, Seq[Float])] = {
    // deterministic pseudo-random 7-dim sample (hash-derived, no RNG)
    (0L until 40L).map { i =>
      i -> (0 until 7).map { j =>
        (((i * 2654435761L + j * 40503L) % 1000L) / 1000.0f - 0.5f)
      }
    }
  }

  test("covarianceMatrix matches the direct double computation") {
    val df = rows.toDF("id", "emb")
    val got = Pca.covarianceMatrix(df, "emb").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === 7 * 8 / 2)
    val x = rows.map(_._2.map(_.toDouble).toArray).toArray
    val n = x.length
    for (i <- 0 until 7; j <- i until 7) {
      val si = x.map(_(i)).sum; val sj = x.map(_(j)).sum
      val sp = x.map(r => r(i) * r(j)).sum
      val cov = BigDecimal((sp - si * sj / n) / (n - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      approx(got((i, j)), cov, 1e-12)
    }
  }

  test("fit: components orthonormal, explained variance sums to <= 1, order desc") {
    val df = rows.toDF("id", "emb")
    val m = Pca.fit(df, "emb", k = 4)
    assert(m.eigenvalues.length === 4 && m.components.length === 4)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    for (a <- m.components; b <- m.components) {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      approx(d, if (a eq b) 1.0 else 0.0, 1e-9)
    }
    assert(m.explainedVariance.sum <= 1.0 + 1e-9)
    // sign convention: max-|coef| entry positive
    m.components.foreach { c =>
      assert(c(c.map(math.abs).zipWithIndex.maxBy(t => (t._1, -t._2))._2) > 0)
    }
  }

  test("project: covariance of full-rank projection is diag(eigenvalues)") {
    val df = rows.toDF("id", "emb")
    val m = Pca.fit(df, "emb", k = 7)
    val proj = Pca.project(df, "id", "emb", m)
    assert(proj.columns.toList === List("id", "proj"))
    val p = proj.select(col("proj")).collect().map(_.getSeq[Double](0).toArray)
    val n = p.length
    for (i <- 0 until 7; j <- 0 until 7) {
      val si = p.map(_(i)).sum; val sj = p.map(_(j)).sum
      val sp = p.map(r => r(i) * r(j)).sum
      val cov = (sp - si * sj / n) / (n - 1)
      approx(cov, if (i == j) m.eigenvalues(i) else 0.0, 1e-9)
    }
  }

  test("whitened projection: identity covariance on real directions, floored dims stay small") {
    // this fixture is near-rank-2 (eigenvalues 3..7 are ~1e-16): whitening
    // normalizes the REAL directions to unit variance, and the floored
    // zero-variance directions must stay ~0, not blow up to 1/ε
    val df = rows.toDF("id", "emb")
    val m = Pca.fit(df, "emb", k = 7)
    assert(m.eigenvalues(1) > 1e-3 && m.eigenvalues(2) < 1e-12,
      m.eigenvalues.toList)
    val p = Pca.project(df, "id", "emb", m, whiten = true)
      .select(col("proj")).collect().map(_.getSeq[Double](0).toArray)
    val n = p.length
    def cov(i: Int, j: Int) = {
      val si = p.map(_(i)).sum; val sj = p.map(_(j)).sum
      (p.map(r => r(i) * r(j)).sum - si * sj / n) / (n - 1)
    }
    for (i <- 0 until 2; j <- 0 until 2)
      approx(cov(i, j), if (i == j) 1.0 else 0.0, 1e-9)
    for (i <- 2 until 7) assert(cov(i, i) < 1e-2, s"dim $i: ${cov(i, i)}")
  }

  test("moments aggregator: partition-count invariant at round(12)") {
    val df = rows.toDF("id", "emb")
    def covAt(parts: Int) =
      Pca.covarianceMatrix(df.repartition(parts), "emb").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(covAt(1) === covAt(5))
  }

  test("planted rank-3 data: k=3 captures the variance, kNN survives projection") {
    // x = z1·u1 + z2·u2 + z3·u3 + tiny noise, with disjoint-support u's —
    // all hash-derived, no RNG. PCA to k=3 must recover the latent span,
    // so cosine kNN in the 3-dim projected space must reproduce the
    // full-space neighbors (the "reduce then ANN" pipeline claim).
    val d = 12
    val u = Array(
      (0 until d).map(j => if (j < 4) 0.5 else 0.0).toArray,
      (0 until d).map(j => if (j >= 4 && j < 8) 0.5 else 0.0).toArray,
      (0 until d).map(j => if (j >= 8) 0.5 else 0.0).toArray)
    val data = (0L until 60L).map { i =>
      val z = (0 until 3).map(c => ((i * 31 + c * 7) % 21 - 10) / 10.0)
      i -> (0 until d).map { j =>
        (z(0) * u(0)(j) + z(1) * u(1)(j) + z(2) * u(2)(j) +
          0.005 * (((i * 13 + j * 17) % 11) - 5) / 5.0).toFloat
      }
    }
    val df = data.toDF("id", "emb")
    val m = graft.operators.Pca.fit(df, "emb", k = 3)
    assert(m.explainedVariance.sum > 0.99, m.explainedVariance.toList)
    val proj = graft.operators.Pca.project(df, "id", "emb", m)
      .withColumnRenamed("proj", "emb")
    def knn(frame: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.bruteForceKnn(frame,
        frame.where(col("id") % 5 === 0), "id", "emb", k = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val full = knn(df)
    val reduced = knn(proj)
    val recall = full.keys.toSeq.map(q =>
      (full(q) & reduced(q)).size.toDouble / full(q).size).sum / full.size
    assert(recall >= 0.9, s"projected-space recall $recall")
  }

  test("streaming twin: micro-batched moments == batch moments") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = graft.operators.Pca.moments(input.toDF().toDF("id", "emb"), "emb")
      .writeStream.format("memory").queryName("pca_moments")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    val batch1 = rows.take(25)
    val batch2 = rows.drop(25)
    input.addData(batch1.map { case (i, v) => (i, v.map(_.toDouble)) }: _*)
    q.processAllAvailable()
    input.addData(batch2.map { case (i, v) => (i, v.map(_.toDouble)) }: _*)
    q.processAllAvailable()
    val streamed = spark.table("pca_moments").collect()
    q.stop()
    assert(streamed.length === 1)
    val batch = graft.operators.Pca.moments(rows.toDF("id", "emb"), "emb").head()
    assert(streamed.head.getLong(0) === batch.getLong(0))
    streamed.head.getSeq[Double](1).zip(batch.getSeq[Double](1)).foreach {
      case (a, b) => approx(a, b, 1e-12)
    }
    streamed.head.getSeq[Double](2).zip(batch.getSeq[Double](2)).foreach {
      case (a, b) => approx(a, b, 1e-12)
    }
  }

  test("degenerate inputs: n<2 empty covariance, fit rejects, nulls skipped") {
    val one = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb")
    assert(Pca.covarianceMatrix(one, "emb").isEmpty)
    intercept[IllegalArgumentException] { Pca.fit(one, "emb", 1) }
    val withNull = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None),
      (3L, Some(Seq(3.0f, 5.0f)))).toDF("id", "emb")
    val cov = Pca.covarianceMatrix(withNull, "emb").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    approx(cov((0, 0)), 2.0) // var of {1,3}
    approx(cov((1, 1)), 4.5) // var of {2,5}
    approx(cov((0, 1)), 3.0)
  }
}
