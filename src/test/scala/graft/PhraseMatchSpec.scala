package graft

import org.apache.spark.sql.functions._

import graft.search.Searcher

/** Slop semantics pinned to the reference's own docstring examples
  * (reference wimbd/es/__init__.py:149-153): slop=1 "I like" matches
  * "I like", "I really like", "I would like".
  */
class PhraseMatchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    "I like spark",          // exact
    "I really like spark",   // gap 1
    "I would really like it",// gap 2
    "like I spark",          // reversed — not matched (insertion-only slop)
    "I dislike spark"        // different token
  ).toDF("text")

  private def hits(phrase: String, slop: Int): Set[String] =
    docs.where(Searcher.phrasePredicate(col("text"), phrase, slop, uax29 = false))
      .collect().map(_.getString(0)).toSet

  test("slop=0 is exact adjacency") {
    assert(hits("I like", 0) === Set("I like spark"))
  }

  test("slop=1 allows one inserted token (reference docstring example)") {
    assert(hits("I like", 1) === Set("I like spark", "I really like spark"))
  }

  test("slop=2 allows two insertions total") {
    assert(hits("I like", 2) ===
      Set("I like spark", "I really like spark", "I would really like it"))
  }

  test("reversed order never matches (documented divergence from Lucene)") {
    assert(!hits("I like", 3).contains("like I spark"))
  }

  test("three-token phrase shares the budget across gaps") {
    val d = Seq("a x b y c", "a x x b c", "a b c").toDF("text")
    val got2 = d.where(Searcher.phrasePredicate(col("text"), "a b c", 2, uax29 = false))
      .collect().map(_.getString(0)).toSet
    assert(got2 === Set("a x b y c", "a x x b c", "a b c"))
    val got1 = d.where(Searcher.phrasePredicate(col("text"), "a b c", 1, uax29 = false))
      .collect().map(_.getString(0)).toSet
    assert(got1 === Set("a b c"))
  }

  test("UAX-29 path tokenizes punctuation away from words") {
    val d = Seq("Hello, I like spark!").toDF("text")
    assert(d.where(Searcher.phrasePredicate(col("text"), "I like", 0)).count() === 1)
  }
}
