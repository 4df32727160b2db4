package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(words)(s"w${rnd.nextInt(50)}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("tokenOffsets matches a single-window reference cumsum") {
    val docs = mkDocs(300, seed = 7)
    val expected = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .withColumn("start", coalesce(
        sum("n").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"start").as[(Long, Long)].collect().toMap
    val got = Packing.tokenOffsets(docs, "doc_id", "text", buckets = 5)
      .select($"id", $"start_offset").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("tokenOffsets is bucket-count invariant") {
    val docs = mkDocs(200, seed = 11)
    val runs = Seq(1, 3, 8, 32).map { b =>
      Packing.tokenOffsets(docs, "doc_id", "text", buckets = b)
        .select($"id", $"start_offset").as[(Long, Long)].collect().toMap
    }
    assert(runs.distinct.size === 1)
  }

  test("tokenOffsets under a hash-shuffled order still covers [0, total) exactly") {
    val docs = mkDocs(150, seed = 3)
    val off = Packing.tokenOffsets(docs, "doc_id", "text",
      orderBy = Some(md5($"doc_id".cast("string"))), buckets = 4)
      .select($"start_offset", $"n_tokens").as[(Long, Long)].collect().sortBy(_._1)
    // consecutive docs in stream order tile the token stream with no gaps
    assert(off.head._1 === 0L)
    off.sliding(2).foreach { case Array((s1, n1), (s2, _)) =>
      assert(s1 + n1 === s2)
    }
  }

  test("packManifest chunks sum to seqLen except the last") {
    val docs = mkDocs(250, seed = 19)
    val l = 64
    val perChunk = Packing.packManifest(docs, "doc_id", "text", l)
      .groupBy("chunk_id").agg(sum("doc_tokens").as("t"))
      .orderBy("chunk_id").as[(Long, Long)].collect()
    val total = docs.select(sum(size(split($"text", " ")).cast("long")))
      .as[Long].head()
    assert(perChunk.map(_._2).sum === total)
    perChunk.init.foreach { case (_, t) => assert(t === l.toLong) }
    assert(perChunk.last._2 <= l.toLong)
    assert(perChunk.map(_._1).toSeq === perChunk.indices.map(_.toLong))
  }

  test("assignShards balances token totals and keeps passenger columns") {
    val docs = mkDocs(300, seed = 31).withColumn("extra", lit("keepme"))
    val target = 200L
    val out = Packing.assignShards(docs, "doc_id", "text", target)
    assert(out.columns.toSet === Set("doc_id", "text", "extra", "shard"))
    assert(out.count() === 300)
    val sizes = out
      .groupBy("shard").agg(sum(size(split($"text", " ")).cast("long")).as("t"))
      .orderBy("shard").as[(Long, Long)].collect()
    val maxDoc = docs.select(max(size(split($"text", " ")).cast("long"))).as[Long].head()
    // every shard but the last holds >= target - maxDoc + 1 tokens (the
    // next doc didn't fit) and starts within a doc of the target boundary
    sizes.init.foreach { case (_, t) => assert(t > target - maxDoc) }
    assert(sizes.map(_._1).toSeq === sizes.indices.map(_.toLong))
  }

  test("writeTokenShards round-trips one directory per shard") {
    val docs = mkDocs(100, seed = 37)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/out"
    Packing.writeTokenShards(docs, "doc_id", "text", 300L, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    assert(back.select("shard").distinct().count() ===
      Packing.assignShards(docs, "doc_id", "text", 300L)
        .select("shard").distinct().count())
  }

  test("packingStats accounting is self-consistent") {
    val docs = mkDocs(200, seed = 23).withColumn("source",
      concat(lit("s"), pmod($"doc_id", lit(3))))
    val l = 16
    val stats = Packing.packingStats(docs, "text", l, "source").collect()
    stats.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val total = r.getAs[Long]("total_tokens")
      val truncTok = r.getAs[Long]("truncated_tokens")
      val pad = r.getAs[Long]("padding_tokens")
      // kept + truncated = total; kept + padding = capacity
      assert((total - truncTok) + pad === nDocs * l)
      assert(math.abs(r.getAs[Double]("utilization") -
        (total - truncTok).toDouble / (nDocs * l)) < 1e-6)
    }
  }

  test("tokenBudgetSample: prefix cut per stratum, deterministic order, bucket invariance") {
    // md5("4") < md5("1") < md5("2") < md5("3") — hash order is 4,1,2,3
    val d = Seq(
      (1L, "a", "w w w"),       // 3 tokens
      (2L, "a", "w w"),         // 2
      (3L, "a", "w w w w w"),   // 5
      (4L, "a", "w"),           // 1
      (5L, "b", "w w w"),       // 3 — budget 2: even the first doc overflows
      (6L, "c", "w w")          // no budget for c → dropped
    ).toDF("doc_id", "source", "text")
    val budgets = Map("a" -> 6L, "b" -> 2L)
    val out = Packing.tokenBudgetSample(d, "doc_id", "text", col("source"),
        budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    // stratum a cumsum in hash order: 4→1, 1→4, 2→6, 3→11 (cut)
    assert(out === Set((4L, "a", 1L), (1L, "a", 4L), (2L, "a", 6L)))
    // bucket-count invariant (same contract as tokenOffsets)
    val one = Packing.tokenBudgetSample(d, "doc_id", "text", col("source"),
      budgets, buckets = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(one === out)
    // reference cumsum via a plain partitioned window agrees on the kept set
    val ref = d.where(col("source").isin("a", "b"))
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("ord"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("cum", sum("n").over(
        Window.partitionBy("source").orderBy("ord", "doc_id")))
      .where(col("cum") <= when(col("source") === "a", 6L).otherwise(2L))
      .select(col("doc_id"), col("source"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ref === out)
  }

  test("slidingWindows: full coverage, stride overlap, short docs one window") {
    import spark.implicits._
    val df = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")), (2L, "a b c"))
      .toDF("id", "text")
    val out = Packing.slidingWindows(df, "id", "text", size = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq === Seq(0L, 4L, 8L, 12L)) // ceil(12/4)+1 windows
    assert(d1.head._3 === (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1.last._3 === (13 to 20).map(i => s"t$i").mkString(" ")) // tail covered
    // consecutive windows share exactly size - stride tokens at the seam
    assert(d1(0)._3.split(" ").drop(4).toSeq === d1(1)._3.split(" ").take(4).toSeq)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b c"))) // short doc
  }
}
