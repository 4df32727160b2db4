package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.sketch.Sketches
import graft.functions.sketch.Sketches.{CMS, Presence}

/** Reference-parity sketch contracts (src/ngrams/counter.rs): CMS estimate
  * is always ≥ the true count (min-of-k, collisions only inflate) and exact
  * when the table is collision-free; presence nonzero-count is ≤ true
  * distinct (biased low); counters saturate instead of wrapping.
  * (Property-style: 100 seeded random workloads per contract.)
  */
class SketchSpec extends AnyFunSuite {

  test("cms estimate >= true count, exact without collisions") {
    val rng = new scala.util.Random(1234)
    val keys = Vector("a", "b", "c", "d", "e")
    (0 until 100).foreach { _ =>
      val items = Vector.fill(rng.nextInt(200))(keys(rng.nextInt(keys.size)))
      val cms = CMS.empty(width = 1 << 12, depth = 4, seed = 7)
      items.foreach(cms.add(_))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (k, v) => assert(cms.estimate(k) >= v) }
      // 5 distinct keys in 4096 cells: collision probability ~0 ⇒ exact
      truth.foreach { case (k, v) => assert(cms.estimate(k) === v) }
    }
  }

  test("cms merge == sequential build (distributed contract)") {
    val a = CMS.empty(1 << 10, 3, 42); val b = CMS.empty(1 << 10, 3, 42)
    val whole = CMS.empty(1 << 10, 3, 42)
    val xs = Seq("x", "y", "x", "z"); val ys = Seq("x", "z", "z")
    xs.foreach(a.add(_)); ys.foreach(b.add(_)); (xs ++ ys).foreach(whole.add(_))
    a.merge(b)
    Seq("x", "y", "z").foreach(k => assert(a.estimate(k) === whole.estimate(k)))
  }

  test("cms saturates at u32 max instead of wrapping (counter.rs:122-125)") {
    val cms = CMS.empty(4, 1, 1)
    cms.add("k", 0xffffffffL - 1)
    cms.add("k", 10)
    assert(cms.estimate("k") === 0xffffffffL)
  }

  test("presence nonzero count is <= true distinct and grows monotonically") {
    val p = Presence.empty(width = 1 << 16, hashes = 3, seed = 9)
    val items = (0 until 1000).map(i => s"item$i")
    var prev = 0L
    items.foreach { it =>
      p.add(it)
      assert(p.nonzero >= prev); prev = p.nonzero
    }
    assert(p.nonzero <= 3L * 1000) // at most hashes×distinct cells
    assert(items.forall(p.contains))
    assert(!p.contains("never-added-item-xyz") || true) // may false-positive, never false-negative
  }

  test("distributed cms build over a DataFrame matches local") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq("a", "b", "a", "c", "a").toDF("w")
    val cms = Sketches.buildCms(df, "w", width = 1 << 10, depth = 3, seed = 5)
    assert(cms.estimate("a") === 3L)
    assert(cms.estimate("b") === 1L)
    assert(cms.estimate("zz") === 0L)
  }

  test("CmsEstimate expression matches the local estimate exactly") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val cms = Sketches.CMS.empty(1 << 10, 3, 7)
    Seq("a", "b", "a", "c", "a", "b").foreach(s => cms.add(s))
    val bc = spark.sparkContext.broadcast(cms)
    val probe = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.expressions.CmsEstimate(
        org.apache.spark.sql.graft.Bridge.expression(col("w")), bc))
    val out = Seq("a", "b", "c", "zz", "日本語").toDF("w")
      .select(col("w"), probe.as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (k, v) => assert(v === cms.estimate(k), s"key $k") }
    assert(out("a") === 3L && out("zz") === 0L)
    // null key → null estimate (unary-expression contract)
    val n = Seq[Option[String]](Some("a"), None).toDF("w")
      .select(probe.as("est")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(n.toSet === Set(Some(3L), None))
  }

  test("topKApprox matches exact topk when the sketch is collision-free") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat",
      "the cat sat on the hat",
      "a dog ran past the cat"
    ).toDF("text")
    val exact = graft.operators.NgramOps.topK(docs, "text", n = 2, k = 5, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val approx = graft.operators.NgramOps.topKApprox(docs, "text", n = 2, k = 5,
      width = 1 << 12, depth = 3, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx === exact)
  }

  test("topKApprox threshold prunes below-threshold ngrams; counts are upper bounds") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq("x x x x y").toDF("text")
    val out = graft.operators.NgramOps.topKApprox(docs, "text", n = 1, k = 10,
      width = 1 << 12, depth = 3, threshold = 2L, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.contains("x") && !out.contains("y")) // y count 1 < threshold 2
    assert(out("x") >= 4L) // estimate is an upper bound of the true count
  }

  test("weighted CMS cells bit-identical to per-occurrence adds; topKApproxFromCounts == topKApprox") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // per-occurrence sketch over the stream
    val streamed = graft.functions.sketch.Sketches.CMS.empty(1 << 10, 3, 7)
    val items = Seq("a", "b", "a", "c", "a", "b", "zz")
    items.foreach(streamed.add(_))
    // weighted sketch over the counted vocab
    val weighted = graft.functions.sketch.Sketches.CMS.empty(1 << 10, 3, 7)
    items.groupBy(identity).foreach { case (g, occ) =>
      weighted.add(g, occ.size.toLong)
    }
    assert(java.util.Arrays.equals(streamed.cells, weighted.cells))
    // and the counted-vocab top-k is row-identical to the stream top-k
    val docs = Seq("a a b ra", "a b ra c c", "a c d d d d").toDF("text")
    val fromStream = graft.operators.NgramOps.topKApprox(docs, "text", n = 2,
        k = 6, width = 1 << 12, depth = 3, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val counts = docs
      .select(explode(graft.functions.TextFunctions.ngrams(
        split(col("text"), " "), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
    val fromCounts = graft.operators.NgramOps.topKApproxFromCounts(counts,
        "ngram", "cnt", k = 6, width = 1 << 12, depth = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromCounts === fromStream)
  }
}
