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

  test("cosineNearDuplicates finds only the parallel pair at 0.99") {
    val nd = Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd === Set((0L, 1L)))
  }
}
