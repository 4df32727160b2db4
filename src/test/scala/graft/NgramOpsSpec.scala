package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.NgramOps

class NgramOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    "a b a b a", // bigrams: "a b" x2, "b a" x2
    "a b c",
    "x"          // too short for bigrams
  ).toDF("text")

  test("tokenize + ngrams expressions inside a plan") {
    val out = docs.select(TextFunctions.textNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b", "b a", "a b", "b a"))
    assert(out(1) === Seq("a b", "b c"))
    assert(out(2) === Seq.empty)
  }

  test("ngramsBuiltin matches the custom expression") {
    val a = docs.select(explode(TextFunctions.ngrams(split(col("text"), " "), 2)).as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = docs.select(explode(TextFunctions.ngramsBuiltin(split(col("text"), " "), 2)).as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("topK is exact and tie-broken") {
    val top = NgramOps.topK(docs, "text", n = 2, k = 2, uax29 = false).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a b", 3L), ("b a", 2L)))
  }

  test("topKHashFirst equals topK exactly, ties and fallbacks included") {
    // deterministic random corpora with HEAVY tie mass (small vocab,
    // short docs): ties at the k boundary are the case the hash-first
    // candidate threshold + boundary-overflow fallback must get right
    val rnd = new scala.util.Random(4242)
    (0 until 5).foreach { trial =>
      val vocab = 3 + rnd.nextInt(8)
      val d = (0 until 60).map { _ =>
        (0 until (2 + rnd.nextInt(10)))
          .map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
      }.toDF("text")
      val n = 1 + rnd.nextInt(2)
      val k = 1 + rnd.nextInt(10)
      val a = NgramOps.topK(d, "text", n, k, uax29 = false)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = NgramOps.topKHashFirst(d, "text", n, k, uax29 = false)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(b === a, s"trial $trial (vocab=$vocab n=$n k=$k)")
    }
    // the all-tied corpus: 100 distinct bigrams all at count 1 > the
    // k+slack=69 gather window → the window ends ON the boundary count
    // → the strings fallback must fire and stay exact
    val uniq = (0 until 100).map(i => s"u$i a$i").toDF("text")
    val a1 = NgramOps.topK(uniq, "text", 2, 5, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b1 = NgramOps.topKHashFirst(uniq, "text", 2, 5, uax29 = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(b1 === a1)
    // empty corpus
    assert(NgramOps.topKHashFirst(docs.where(lit(false)), "text", 2, 3,
      uax29 = false).count() === 0L)
  }

  test("botK equals sort-asc-limit") {
    val bot = NgramOps.botK(docs, "text", n = 2, k = 1, uax29 = false).collect()
    assert(bot.head.getString(0) === "b c")
    assert(bot.head.getLong(1) === 1L)
  }

  test("countPhrases counts overlapping occurrences and keeps zero-hit phrases") {
    val df = Seq("batch batch batch").toDF("text")
    val out = NgramOps.countPhrases(df, "text", Seq("batch batch", "nope nope"), uax29 = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("batch batch") === 2L) // overlapping windows
    assert(out("nope nope") === 0L)
  }

  test("stats") {
    val r = NgramOps.stats(docs, "text", uax29 = false).collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("total_tokens") === 9L)
    assert(r.getAs[Int]("max_tokens") === 5)
    assert(r.getAs[Int]("min_tokens") === 1)
    // ASCII fixture: UTF-8 bytes == chars (multibyte text diverges)
    assert(r.getAs[Long]("total_bytes") === r.getAs[Long]("total_chars"))
  }

  test("uniqueExact") {
    val r = NgramOps.uniqueExact(docs, "text", 2, uax29 = false).collect().head
    assert(r.getLong(0) === 3L) // "a b", "b a", "b c"
  }

  test("searchRegex counts all matches incl zero-hit patterns") {
    val out = NgramOps.searchRegex(docs, "text", Seq("a", "zz+"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") === 4L)
    assert(out("zz+") === 0L)
  }

  test("vocabGrowth: exact Heaps points at value checkpoints") {
    val d = Seq(
      (1L, "a b"),
      (2L, "a"),
      (3L, "c a"),
      (4L, "d d d")
    ).toDF("doc_id", "text")
    // K=2: lo=1, hi=4 → bounds 1+(3·1 div 2)=2 and 1+3=4
    val rows = NgramOps.vocabGrowth(d, "doc_id", "text", checkpoints = 2,
        uax29 = false)
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows(0) === ((1L, 2L, 2L, 3L, 2L)))  // docs 1-2: a,b seen
    assert(rows(1) === ((2L, 4L, 4L, 8L, 4L)))  // full corpus: a,b,c,d
    // K=1 degenerates to one whole-corpus summary row
    val one = NgramOps.vocabGrowth(d, "doc_id", "text", checkpoints = 1,
      uax29 = false).collect().head
    assert((one.getLong(2), one.getLong(3), one.getLong(4)) === ((4L, 8L, 4L)))
    // empty corpus → empty curve, not nulls
    assert(NgramOps.vocabGrowth(d.where(lit(false)), "doc_id", "text",
      checkpoints = 3, uax29 = false).count() === 0L)
    // a zero-vocabulary prefix (null-text docs first) keeps its checkpoint
    // row with vocab = 0 instead of dropping it
    val n = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "a b")).toDF("doc_id", "text")
    val nr = NgramOps.vocabGrowth(n, "doc_id", "text", checkpoints = 2,
        uax29 = false)
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(nr(0) === ((1L, 2L, 0L, 0L)))  // docs 1-2: no tokens, no vocab
    assert(nr(1) === ((2L, 3L, 2L, 2L)))
  }
}
