package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // v0 ∥ v1, v2 orthogonal-ish, v3 opposite
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine column computes expected values") {
    val c = vecs.as("a").join(vecs.as("b"), col("a.vec_id") === 0 && col("b.vec_id") === 4)
      .select(Similarity.cosine(
        transform(col("a.embedding"), _.cast("double")),
        transform(col("b.embedding"), _.cast("double"))).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(c - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("sampling dials fail fast when step yields more centroids than the cap") {
    // 5 rows, step=1 → 5 sampled centroids > cap 2: each guard must throw
    // BEFORE broadcasting/collecting an unbounded sample (driver-OOM guard)
    val eCp = intercept[IllegalArgumentException] {
      Similarity.clusterProfile(vecs, "vec_id", "embedding", step = 1,
        maxCentroids = 2).collect()
    }
    assert(eCp.getMessage.contains("raise step"))
    val eKm = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(vecs, "vec_id", "embedding", step = 1,
        iters = 1, maxCentroids = 2).collect()
    }
    assert(eKm.getMessage.contains("raise step"))
    val ePq = intercept[IllegalArgumentException] {
      Similarity.pqCodebook(vecs, "vec_id", "embedding", m = 3, step = 1,
        maxSample = 2)
    }
    assert(ePq.getMessage.contains("raise step"))
    // at the default cap the same calls succeed — the guard is inert on
    // correctly-sized samples
    assert(Similarity.clusterProfile(vecs, "vec_id", "embedding", step = 2)
      .collect().nonEmpty)
  }

  test("bruteForceKnn ranks parallel > diagonal > orthogonal > opposite") {
    val out = Similarity.bruteForceKnn(vecs, vecs.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 4).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(out === Seq(1L, 4L, 2L, 3L))
  }

  test("lshKnn finds exact-duplicate directions and caps at k") {
    import spark.implicits._
    // v and 2v share every hyperplane sign, so LSH must always pair them
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 2.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.lshKnn(vecs, vecs.where($"vec_id" === 1L),
      "vec_id", "embedding", k = 2, dim = 4, nPlanes = 3, nTables = 4)
      .collect()
    assert(out.nonEmpty && out.length <= 2)
    assert(out.head.getLong(1) === 2L) // same direction => top neighbor, cos 1
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-6)
    assert(out.map(_.getLong(3)).toSeq === (1 to out.length).map(_.toLong))
  }

  test("ivfKnn with all-covering probes matches brute force") {
    val q = vecs.where(col("vec_id") === 0)
    val bf = Similarity.bruteForceKnn(vecs, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfKnn(vecs, q, "vec_id", "embedding", k = 3, step = 1, nprobe = 5)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf === bf)
  }

  test("rerankExact restores exact ranking over an approximate shortlist") {
    val q = vecs.where(col("vec_id") === 0)
    val bf = Similarity.bruteForceKnn(vecs, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSet
    // shortlist = everything (all-covering probes) → the re-rank must
    // reproduce brute force exactly, including the exact (not ADC) cosines
    val rr = Similarity.ivfPqKnnRerank(vecs, q, "vec_id", "embedding", k = 3,
        shortlist = 5, step = 1, nprobe = 5, m = 3, codeStep = 1)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSet
    assert(rr === bf)
    // a candidate frame missing the true top neighbor can't resurrect it,
    // but ranking within the candidates is exact-cosine ordered
    import spark.implicits._
    val cand = Seq((0L, 2L), (0L, 3L)).toDF("query_id", "neighbor_id")
    val sub = Similarity.rerankExact(vecs, q, "vec_id", "embedding", cand, 2)
      .collect().sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id"))
    assert(sub.toSeq === Seq(2L, 3L))
    val eShort = intercept[IllegalArgumentException] {
      Similarity.ivfPqKnnRerank(vecs, q, "vec_id", "embedding", k = 5,
        shortlist = 3)
    }
    assert(eShort.getMessage.contains("shortlist"))
  }

  test("ivfKnn/ivfPqKnn/semanticNearDuplicates release their corpus-sized blocks") {
    import org.apache.spark.sql.graft.Bridge
    val q = vecs.where(col("vec_id") === 0)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val knn = Similarity.ivfKnn(vecs, q, "vec_id", "embedding", k = 3,
      step = 1, nprobe = 5)
    val pq = Similarity.ivfPqKnn(vecs, q, "vec_id", "embedding", k = 3,
      step = 1, nprobe = 5, m = 3, codeStep = 1)
    val nd = Similarity.semanticNearDuplicates(vecs, "vec_id", "embedding",
      0.99, step = 2, tables = 2)
    // only the query×k / candidate-bounded results themselves may remain
    // pinned (3 for the union's two table arms + knn + pq); the corpus-
    // sized assignment frames must already be gone
    val after = spark.sparkContext.getPersistentRDDs
    assert((after.keySet -- before).size <= 4,
      s"leaked blocks: ${(after.keySet -- before).toSeq.sorted}")
    assert(knn.collect().nonEmpty && pq.collect().nonEmpty)
    nd.collect()
    Bridge.releaseLocalCheckpoint(knn)
    Bridge.releaseLocalCheckpoint(pq)
  }

  test("kmeans centroids converge to cluster directions and lift IVF recall") {
    // two tight direction clusters + one stray; init sample (step=3) starts
    // from ids 0 and 3 — one per cluster after refinement
    val data = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(1.0f, -0.1f, 0.0f)),
      (2L, Array(1.0f, 0.05f, 0.0f)),
      (3L, Array(0.0f, 0.1f, 1.0f)),
      (4L, Array(0.0f, -0.1f, 1.0f)),
      (5L, Array(0.05f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(data, "vec_id", "embedding", step = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.size === 2)
    // refined centroid 0 points along +x, centroid 3 along +z
    assert(cents(0L).head > 0.99)
    assert(cents(3L)(2) > 0.99)
    // ivfKnnWith on refined centroids, probing only the best bucket,
    // still recovers the exact in-cluster neighbors of query 0
    val got = Similarity.ivfKnnWith(data, data.where(col("vec_id") === 0),
        Similarity.kmeansCentroids(data, "vec_id", "embedding", step = 3, iters = 4),
        "vec_id", "embedding", k = 2, nprobe = 1)
      .collect().sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got === Seq(2L, 1L))
  }

  test("cosineNearDuplicates finds only the parallel pair at 0.99") {
    val nd = Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd === Set((0L, 1L)))
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    import spark.implicits._
    // cluster A along +x: ids 0,1,2 (near-parallel); cluster B along +z:
    // ids 3,4 (near-parallel); id 5 along +y is nobody's duplicate
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.05f, 0.0f)),
      (2L, Array(1.0f, -0.05f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (4L, Array(0.05f, 0.0f, 1.0f)),
      (5L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // step > max id ⇒ single bucket (centroid 0): pure pairwise semantics
    val kept = Similarity.semanticDedup(data, "vec_id", "embedding",
        threshold = 0.98, step = 100)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 3L, 5L))
    val pairs = Similarity.semanticNearDuplicates(data, "vec_id", "embedding",
        threshold = 0.98, step = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
    // multi-table union only ever ADDS pairs (recall is monotone in tables)
    val p2 = Similarity.semanticNearDuplicates(data, "vec_id", "embedding",
        threshold = 0.98, step = 3, tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = Similarity.semanticNearDuplicates(data, "vec_id", "embedding",
        threshold = 0.98, step = 3, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.subsetOf(p2))
  }

  test("PQ: codes select nearest centroid; decoded scan recovers clear neighbors") {
    import spark.implicits._
    // 4-dim vectors, m=2 subspaces of 2; codebook sample = ids 0 and 2
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f, 0.0f, 0.0f)), // near id 0
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.9f, 0.1f))    // near id 2
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(data, "vec_id", "embedding", m = 2, step = 2)
    assert(cb.length === 2 && cb(0).length === 2 && cb(0)(0).length === 2)
    val enc = Similarity.pqEncode(data, "vec_id", "embedding", cb)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // ids 0/1 quantize to code 0 (the id-0 sample) in subspace 0,
    // ids 2/3 to code 1 (the id-2 sample) in subspace 1
    assert(enc(0L) === enc(1L))
    assert(enc(2L) === enc(3L))
    assert(enc(0L) !== enc(2L))
    val knn = Similarity.pqKnn(data, data.where(col("vec_id") === 0), "vec_id",
        "embedding", k = 1, m = 2, step = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knn === Set((0L, 1L))) // id 1 decodes onto id 0's centroids
  }

  test("clusterProfile: exhaustive assignment, coherent masses, deterministic") {
    // step=2 makes vec_ids 0,2,4 centroids: v1 (parallel) joins 0's cluster
    // with cos 1, v3 (opposite) argmaxes to... cos(-1,0)=-1 vs cos(v3,v2)=0
    // vs cos(v3,v4)=-1/sqrt2 -> cluster 2
    val prof = Similarity.clusterProfile(vecs, "vec_id", "embedding", step = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(prof.values.map(_._1).sum === 5L) // every vector assigned once
    assert(prof(0L)._1 === 2L && math.abs(prof(0L)._2 - 1.0) < 1e-9) // {0,1}
    assert(prof(2L)._1 === 2L) // {2, 3}
    assert(prof(4L)._1 === 1L && math.abs(prof(4L)._2 - 1.0) < 1e-9) // itself
    val again = Similarity.clusterProfile(vecs, "vec_id", "embedding", step = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again === prof)
  }

  test("pqCodebookKmeans: distortion non-increasing over iterations, deterministic") {
    // 4 planted cluster directions in 8-dim, 120 noisy points
    val rnd = new scala.util.Random(7)
    val centers = Array(
      Array(1.0, 0, 0, 0, 1, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 1, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 1, 0), Array(0, 0, 0, 1.0, 0, 0, 0, 1))
    val data = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    def distortion(cb: Array[Array[Array[Double]]]): Double = {
      // mean argmin-L2 quantization error of the unit sample against cb
      val m = cb.length; val sub = cb(0)(0).length
      val pts = data.collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
      pts.map { v =>
        (0 until m).map { j =>
          cb(j).map { cent =>
            (0 until sub).map { i =>
              val d = v(j * sub + i) - cent(i); d * d }.sum
          }.min
        }.sum
      }.sum / pts.length
    }
    val seed = Similarity.pqCodebookKmeans(data, "vec_id", "embedding",
      m = 2, k = 4, step = 1, iters = 0)
    val refined = Similarity.pqCodebookKmeans(data, "vec_id", "embedding",
      m = 2, k = 4, step = 1, iters = 5)
    assert(distortion(refined) <= distortion(seed) + 1e-12)
    // planted structure: refinement should buy a real improvement here
    assert(distortion(refined) < distortion(seed) * 0.9)
    val again = Similarity.pqCodebookKmeans(data, "vec_id", "embedding",
      m = 2, k = 4, step = 1, iters = 5)
    assert(refined.map(_.map(_.toList).toList).toList ===
      again.map(_.map(_.toList).toList).toList)
    // and the refined codebook plugs straight into the scoring path
    val knn = Similarity.pqKnn(data, data.where(col("vec_id") < 2), "vec_id",
      "embedding", k = 3, m = 2, codebook = Some(refined))
    assert(knn.count() === 6)
  }

  test("PQ kernel is bit-identical to the HOF argmin formulation on random vectors") {
    // the codegen kernel replaced an interpreted transform/aggregate tree;
    // the oracle hash-matches depend on the arithmetic staying EXACTLY the
    // same (accumulation order, strict-< tie to the lower code)
    val rnd = new scala.util.Random(42)
    val m = 4; val sub = 4; val k = 5; val dim = m * sub
    val codebook = Array.fill(m, k, sub)(rnd.nextDouble() * 2 - 1)
    // include exact-centroid vectors (zero distance) and a duplicated
    // centroid (tie → lower code must win)
    codebook(1)(3) = codebook(1)(0).clone()
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    } ++ Seq((201L, codebook.map(_(0)).flatten.toArray))
    val df = rows.toDF("id", "bv")
    val kernel = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.expressions.PqEncodeDecode(
        org.apache.spark.sql.graft.Bridge.expression(col("bv")), codebook))
    val got = df.select(col("id"), kernel.as("e"))
      .select(col("id"), col("e.codes"), col("e.decoded"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toList, r.getSeq[Double](2).toList))).toMap
    // HOF reference formulation (the code this kernel replaced)
    val cb = typedLit(codebook.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = transform(sequence(lit(0), lit(m - 1)), j => {
      val cands = transform(sequence(lit(0), lit(k - 1)), c => {
        val cent = element_at(element_at(cb, j + 1), c + 1)
        val d = aggregate(sequence(lit(1), lit(sub)), lit(0.0), (acc, i) => {
          val diff = element_at(col("bv"), j * lit(sub) + i) - element_at(cent, i)
          acc + diff * diff
        })
        struct(d.as("d"), c.as("cid"))
      })
      array_min(cands).getField("cid")
    })
    val decoded = flatten(transform(col("codes"), (c, j) =>
      element_at(element_at(cb, j + 1), c + 1)))
    val want = df.withColumn("codes", codes).withColumn("decoded", decoded)
      .select(col("id"), col("codes"), col("decoded"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toList, r.getSeq[Double](2).toList))).toMap
    assert(got === want)
    // the duplicated centroid must resolve to code 0, never 3
    assert(got(201L)._1(1) === 0)
  }

  test("embeddingDrift: identical → cosine 1, orthogonal mass → 0, norms reported") {
    val same = Similarity.embeddingDrift(vecs, vecs, "embedding").head()
    assert((same.getLong(0), same.getLong(1), same.getLong(2)) === ((5L, 5L, 3L)))
    assert(same.getDouble(3) === 1.0)
    assert(same.getDouble(4) === same.getDouble(5))
    // mass along x vs mass along y → mean vectors orthogonal
    val x = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val y = Seq((3L, Array(0.0f, 2.0f))).toDF("vec_id", "embedding")
    val d = Similarity.embeddingDrift(x, y, "embedding").head()
    assert(d.getDouble(3) === 0.0)
    assert(d.getDouble(4) === 2.0)   // mean L2 of (1, 3)
    assert(d.getDouble(5) === 2.0)
    // cross-snapshot dimensionality mismatch fails the job instead of
    // reporting a truncated common-prefix cosine
    val y3 = Seq((4L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.embeddingDrift(x, y3, "embedding").head()
    }
    assert(ex.getMessage.contains("dimensionality") ||
      Option(ex.getCause).exists(_.getMessage.contains("dimensionality")))
    // an empty side degrades to a null-cosine row, not an error
    val e = Similarity.embeddingDrift(x, y.where(lit(false)), "embedding").head()
    assert(e.getLong(0) === 2L && e.getLong(1) === 0L && e.isNullAt(3))
  }

  test("kCenterSelect: min-id seed, farthest-point rounds, dup never selected, empty ok") {
    import spark.implicits._
    // ids 1,2 share direction e1 (dup); 3 = e2; 4 = -e1 (farthest from e1)
    val emb = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),  // seed (min id); unit e1
      (2L, Array(1.0f, 0.0f, 0.0f)),  // exact dup of the seed direction
      (3L, Array(0.0f, 5.0f, 0.0f)),  // e2: dist 1 from e1
      (4L, Array(-1.0f, 0.0f, 0.0f))  // -e1: dist 2 from e1
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.kCenterSelect(emb, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // round 2: 4 is farthest (dist 2); round 3: 3 (dist 1 to both centers)
    assert(got.toSeq === Seq((1L, 1L, 0.0), (4L, 2L, 2.0), (3L, 3L, 1.0)))
    // k larger than the distinct-direction count: dup id 2 (dist 0) is
    // never selected — fewer than k rows, no throw
    val capped = graft.operators.Similarity.kCenterSelect(emb, "vec_id", "embedding", k = 10)
    assert(capped.count() === 3L)
    // empty input: empty output with the right schema
    val none = graft.operators.Similarity.kCenterSelect(
      emb.where(lit(false)), "vec_id", "embedding", k = 3)
    assert(none.columns.toSeq === Seq("id", "rank", "dist") && none.count() === 0L)
  }

  test("clusterBalancedSample: per-cluster cap, determinism, full coverage of small clusters") {
    import spark.implicits._
    // bucket seeds at ids 0 and 10 (step 10): cluster A = e1-ish (0..4),
    // cluster B = e2-ish (10..12)
    val emb = ((0L to 4L).map(i => (i, Array(1.0f, 0.01f * i))) ++
      (10L to 12L).map(i => (i, Array(0.01f * (i - 10), 1.0f))))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.clusterBalancedSample(emb,
        "vec_id", "embedding", step = 10, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBucket = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byBucket.values.forall(_ <= 2)) // cap per cluster
    assert(byBucket.keySet === Set(0L, 10L))
    // ranks are 1..n within each bucket
    assert(got.filter(_._2 == 0L).map(_._3).sorted.toSeq === Seq(1L, 2L))
    // rerun-stable
    val again = graft.operators.Similarity.clusterBalancedSample(emb,
        "vec_id", "embedding", step = 10, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // a cap above every cluster size keeps everything
    assert(graft.operators.Similarity.clusterBalancedSample(emb,
      "vec_id", "embedding", step = 10, perCluster = 100).count() === 8L)
    // empty input: empty out
    assert(graft.operators.Similarity.clusterBalancedSample(
      emb.where(lit(false)), "vec_id", "embedding", step = 10,
      perCluster = 2).count() === 0L)
  }

  test("kCenterSelect matches an independent in-memory greedy on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // trials 0-2 fit inside one frontier (every selectable point in hand,
    // τ = −∞, pure local finish); trial 3 pins the initial frontier to 16
    // (the test seam — production m starts ≥1024) so the batched
    // lazy-greedy must CROSS batch boundaries — recollect on hitting τ,
    // doubling m each time — and still reproduce sequential Gonzalez row
    // for row
    for (trial <- 0 until 4) {
      val n = if (trial == 3) 900 else 40 + trial * 17
      val d = 8
      val data = (0L until n.toLong).map(i =>
        (i, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)))
      // in-memory greedy: unit-normalize (double), min-id seed, argmax
      // min-distance with id tie-break — written independently of the
      // operator (plain collections, no Spark)
      val unit = data.map { case (id, v) =>
        val dv = v.map(_.toDouble)
        val nrm = math.sqrt(dv.map(x => x * x).sum)
        id -> dv.map(_ / nrm)
      }.toMap
      def dist(a: Array[Double], b: Array[Double]): Double =
        1.0 - a.zip(b).map { case (x, y) => x * y }.sum
      val k = if (trial == 3) 40 else 5
      var selected = Vector(0L)
      var mind = unit.map { case (id, v) => id -> dist(v, unit(0L)) }
      var expected = Vector((0L, 1L, 0.0))
      for (r <- 2 to k) {
        val cands = mind.filter(_._2 > 0)
        val (bid, bd) = cands.toSeq.maxBy { case (id, dd) => (dd, -id) }
        expected :+= ((bid, r.toLong,
          BigDecimal(bd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        selected :+= bid
        mind = mind.map { case (id, dd) => id -> math.min(dd, dist(unit(id), unit(bid))) }
      }
      val got = graft.operators.Similarity.kCenterSelect(
          data.toDF("vec_id", "embedding"), "vec_id", "embedding", k,
          frontier0 = if (trial == 3) 16 else 0)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
      assert(got === expected, s"trial $trial")
    }
  }

  test("Inf-element vectors fold to NULL units; kmeans tolerates a degenerate seed (review findings)") {
    import spark.implicits._
    // +Inf element: norm = Inf passes a bare isnan gate, and Inf/Inf would
    // make a NaN unit that poisons every argmax downstream (kCenterSelect's
    // frontier could fill with unpickable NaN rows and crash the fold)
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),                      // zero seed candidate
      (1L, Array(Float.PositiveInfinity, 1.0f)),    // Inf element
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val picked = graft.operators.Similarity.kCenterSelect(
        emb, "vec_id", "embedding", k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(picked === Set(2L, 3L)) // 0 (no direction) and 1 (Inf) never appear
    // kmeansCentroids: ids 0 (zero vector) and 1 (Inf) land on sampled seed
    // positions with step=1 — both must be DROPPED from the seed set, not
    // NPE the refinement round
    val refined = graft.operators.Similarity.kmeansCentroids(
      emb, "vec_id", "embedding", step = 1, iters = 2)
    assert(refined.collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("ivfAssign kernel matches an independent in-memory argmax on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    for (trial <- 0 until 3) {
      val n = 120 + trial * 37
      val d = 6
      val data = (0L until n.toLong).map(i =>
        (i, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)))
      val step = 25
      // independent reference: unit-normalize, centroids = id % step == 0,
      // nearest by sequential-sum dot, ties to LOWER centroid id
      val unit = data.map { case (id, v) =>
        val dv = v.map(_.toDouble)
        val nrm = math.sqrt(dv.map(x => x * x).sum)
        id -> dv.map(_ / nrm)
      }.toMap
      val cents = data.map(_._1).filter(_ % step == 0).sorted.map(c => c -> unit(c))
      val expected = data.map { case (id, _) =>
        var best = -1L; var bd = Double.NegativeInfinity
        cents.foreach { case (cid, cv) =>
          val s = unit(id).zip(cv).map { case (x, y) => x * y }.sum
          if (s > bd) { bd = s; best = cid }
        }
        id -> best
      }.toMap
      val got = graft.operators.Similarity.ivfAssign(
          data.toDF("vec_id", "embedding"), "vec_id", "embedding", step)
        .select("vec_id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("ivfAssignCoarse: bit-identical to flat ivfAssign at full probe width; deterministic at P=1") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    val n = 400
    val d = 6
    val data = (0L until n.toLong).map(i =>
      (i, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val step = 10 // 40 fine centroids -> coarse stride ceil(sqrt(40)) = 7
    val flat = graft.operators.Similarity.ivfAssign(
        data, "vec_id", "embedding", step)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probes >= coarse count: the two-level argmax sees every fine
    // centroid and must reproduce the flat assignment exactly
    val full = graft.operators.Similarity.ivfAssignCoarse(
        data, "vec_id", "embedding", step, coarseProbes = 64)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === flat)
    // P=1: approximate but deterministic and always a REAL fine centroid
    val p1a = graft.operators.Similarity.ivfAssignCoarse(
        data, "vec_id", "embedding", step, coarseProbes = 1)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p1b = graft.operators.Similarity.ivfAssignCoarse(
        data, "vec_id", "embedding", step, coarseProbes = 1)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1a === p1b)
    val fineIds = (0L until n.toLong).filter(_ % step == 0).toSet
    assert(p1a.values.toSet.subsetOf(fineIds))
    assert(p1a.size === n)
  }

  test("TopCentroids probe kernel matches the join+window formulation on random inputs") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(1414)
    (0 until 4).foreach { trial =>
      val d = 4 + rnd.nextInt(4)
      val nC = 1 + rnd.nextInt(12)
      val nQ = 5 + rnd.nextInt(20)
      val cents: Array[(Long, Array[Double])] = (0 until nC).map { i =>
        val v = Array.fill(d)(rnd.nextDouble() * 2 - 1)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (i.toLong * 3, v.map(_ / nrm))
      }.toArray
      val qs = (0 until nQ).map { i =>
        val v = Array.fill(d)(rnd.nextDouble() * 2 - 1)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(_ / nrm).toSeq)
      }.toDF("query_id", "qv")
      val nprobe = 1 + rnd.nextInt(nC + 2) // sometimes > nC
      val kernel = graft.operators.Similarity
        .probeTopCentroids(qs, cents, nprobe)
        .select("query_id", "bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cdf = cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }
        .toDF("centroid_id", "cv")
      val wq = Window.partitionBy("query_id")
        .orderBy(desc("csim"), asc("centroid_id"))
      val window = qs.join(broadcast(cdf))
        .withColumn("csim", graft.operators.Similarity.dot(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
        .select(col("query_id"), col("centroid_id").as("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kernel === window, s"trial $trial (d=$d nC=$nC nprobe=$nprobe)")
      assert(kernel.nonEmpty)
    }
    // ties: identical centroids under different ids — the LOWER id must
    // fill the earlier probe slots, exactly like (csim DESC, id ASC)
    val tied: Array[(Long, Array[Double])] =
      Array((5L, Array(1.0, 0.0)), (7L, Array(1.0, 0.0)), (9L, Array(0.0, 1.0)))
    val q1 = Seq((0L, Seq(1.0, 0.0))).toDF("query_id", "qv")
    val got = graft.operators.Similarity.probeTopCentroids(q1, tied, 2)
      .select("bucket").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 7L))
  }

  test("kCenterSelect: date and timestamp ids order like the distributed sort (review finding)") {
    import spark.implicits._
    // the r13 integral-or-string tightening regressed date/timestamp ids
    // (orderable Row values) — pin them: same vectors under long ids and
    // date ids must select the same RANKS (id order preserved by
    // construction: day i <-> id i)
    val vecs5 = Seq(
      (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)), (2, Array(1.0f, 1.0f)),
      (3, Array(-1.0f, 0.2f)), (4, Array(1.0f, 0.01f)))
    val byLong = vecs5.map { case (i, v) => (i.toLong, v) }
      .toDF("id", "embedding")
    val byDate = vecs5.map { case (i, v) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)), v)
    }.toDF("id", "embedding")
    val byTs = vecs5.map { case (i, v) =>
      (java.sql.Timestamp.valueOf(s"2020-01-0${i + 1} 00:00:00"), v)
    }.toDF("id", "embedding")
    def picks(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      Similarity.kCenterSelect(df, "id", "embedding", k = 3).collect()
        .map { r =>
          val day = r.get(0) match {
            case l: java.lang.Long => l.toInt
            case d: java.sql.Date => d.toLocalDate.getDayOfMonth - 1
            case t: java.sql.Timestamp =>
              t.toLocalDateTime.getDayOfMonth - 1
          }
          (day, r.getLong(1))
        }.sortBy(_._2).toSeq
    val expect = picks(byLong)
    assert(picks(byDate) === expect)
    assert(picks(byTs) === expect)
    assert(expect.map(_._2) === Seq(1L, 2L, 3L))
  }

  test("coarse gate force-engaged: every consumer bit-identical at the full-recall default") {
    import spark.implicits._
    // r14 wiring: every flat-kernel consumer routes through the
    // graft.ann.coarseGate dial. Forcing the gate to 1 engages the
    // two-level kernel at ANY centroid count; with the default
    // coarseProbes (0 = probe every coarse cell) results must be
    // BIT-IDENTICAL to the flat kernel — the gate is results-neutral
    // until a caller explicitly trades recall.
    val rnd = new scala.util.Random(77)
    val data = (0L until 300L).map(i =>
      (i, Array.fill(5)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding").cache()
    val queries = data.where(col("vec_id") < 3)
    def consumers: Map[String, () => Seq[String]] = Map(
      "ivfAssign" -> (() => Similarity.ivfAssign(
        data, "vec_id", "embedding", step = 7)
        .select("vec_id", "bucket").collect().map(_.toString).sorted.toSeq),
      "semanticDedup" -> (() => Similarity.semanticDedup(
        data, "vec_id", "embedding", threshold = 0.8, step = 7)
        .select("vec_id").collect().map(_.toString).sorted.toSeq),
      "clusterBalancedSample" -> (() => Similarity.clusterBalancedSample(
        data, "vec_id", "embedding", step = 7, perCluster = 2)
        .collect().map(_.toString).sorted.toSeq),
      "clusterProfile" -> (() => Similarity.clusterProfile(
        data, "vec_id", "embedding", step = 7)
        .collect().map(_.toString).sorted.toSeq),
      "kmeansCentroids+ivfKnnWith" -> (() => Similarity.ivfKnnWith(
        data, queries,
        Similarity.kmeansCentroids(data, "vec_id", "embedding", step = 7,
          iters = 2),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .collect().map(_.toString).sorted.toSeq))
    try {
      spark.conf.set(Similarity.CoarseGateConf, Int.MaxValue.toString)
      val flat = consumers.map { case (n, f) => n -> f() }
      spark.conf.set(Similarity.CoarseGateConf, "1")
      val nested = consumers.map { case (n, f) => n -> f() }
      flat.keys.foreach { n =>
        assert(nested(n) === flat(n), s"consumer $n diverged under the gate")
        assert(flat(n).nonEmpty, s"consumer $n returned nothing — vacuous")
      }
    } finally {
      spark.conf.unset(Similarity.CoarseGateConf)
      spark.conf.unset(Similarity.CoarseProbesConf)
      data.unpersist()
    }
  }

  test("kCenterSelect: zero vectors and inexact-normalized duplicates (review findings)") {
    import spark.implicits._
    // a zero vector (empty-token feature-hash doc) must neither win an
    // argmax nor crash the rounding; (1,1) normalizes INEXACTLY (unit
    // dot 0.9999999999999998), so the epsilon guard, not > 0, stops
    // re-selection once distinct directions run out
    val emb = Seq(
      (1L, Array(1.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 0.0f)),  // same direction, inexact unit
      (3L, Array(0.0f, 0.0f, 0.0f)),  // zero vector: no direction
      (4L, Array(0.0f, 0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.kCenterSelect(emb, "vec_id", "embedding", k = 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only two distinct directions exist: 1 (seed) and 4; ids 2 and 3
    // must NEVER appear, and no id repeats
    assert(got === Seq((1L, 1L), (4L, 2L)))
  }

  test("clusterBalancedSample: zero vectors dropped, not dumped into one bucket (review finding)") {
    import spark.implicits._
    val emb = ((0L to 3L).map(i => (i, Array(1.0f, 0.01f * i))) ++
      Seq((4L, Array(0.0f, 0.0f)), (5L, Array(0.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.clusterBalancedSample(emb,
        "vec_id", "embedding", step = 10, perCluster = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSet.intersect(Set(4L, 5L)).isEmpty)
    assert(got.map(_._1).nonEmpty)
  }

  test("ivfAssign hashedIds: zero sampled centroids is a loud error, not a silent empty (review finding)") {
    import spark.implicits._
    val emb = (0L to 5L).map(i => (i.toString + "-id", Array(1.0f, i.toFloat)))
      .toDF("vec_id", "embedding")
    // step far above the corpus size: ~(1 - 1/step)^6 chance of zero
    // centroids per seed — with this fixed id set and step the sample IS
    // empty (verified by the error), and the call must refuse
    val e = intercept[RuntimeException] {
      graft.operators.Similarity.clusterBalancedSample(emb, "vec_id",
        "embedding", step = 1000000, perCluster = 2, hashedIds = true).count()
    }
    assert(e.getMessage.contains("ZERO centroids"), e.getMessage)
    // an EMPTY corpus still degrades to empty output, not the error
    assert(graft.operators.Similarity.clusterBalancedSample(
      emb.where(lit(false)), "vec_id", "embedding", step = 1000000,
      perCluster = 2, hashedIds = true).count() === 0L)
  }

  test("clusterBalancedSample matches an in-memory reference on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    for (trial <- 0 until 3) {
      val n = 30 + trial * 11
      val d = 6
      val step = 7
      val per = 2
      val data = (0L until n.toLong).map(i =>
        (i, Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)))
      // independent reference: unit-normalize, assign to argmax-dot
      // centroid (ids % step == 0; tie -> lower centroid id), md5-rank
      val unit = data.map { case (id, v) =>
        val dv = v.map(_.toDouble); val nrm = math.sqrt(dv.map(x => x * x).sum)
        id -> dv.map(_ / nrm)
      }.toMap
      val cents = data.map(_._1).filter(_ % step == 0).sorted
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      def md5hex(x: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val assigned = unit.keys.map { id =>
        id -> cents.maxBy(c => (dot(unit(id), unit(c)), -c))
      }.toSeq
      val expected = assigned.groupBy(_._2).toSeq.flatMap { case (b, members) =>
        members.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(per)
          .zipWithIndex.map { case (id, i) => (id, b, (i + 1).toLong) }
      }.toSet
      val got = graft.operators.Similarity.clusterBalancedSample(
          data.toDF("vec_id", "embedding"), "vec_id", "embedding", step, per)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"trial $trial")
    }
  }
}
