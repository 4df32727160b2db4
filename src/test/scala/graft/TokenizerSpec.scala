package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenizer

/** Golden vectors ported from the reference's unit tests:
  * tokenizer (reference src/tokens.rs:50-133) and n-gram windows
  * (reference src/ngrams/mod.rs:114-174).
  */
class TokenizerSpec extends AnyFunSuite {

  test("tokenize keeps '2.0' as one token (reference src/tokens.rs:56-76)") {
    val s = "You can follow any responses to this entry through the RSS 2.0 feed"
    assert(Tokenizer.tokenize(s).toSeq === Seq(
      "You", "can", "follow", "any", "responses", "to", "this", "entry",
      "through", "the", "RSS", "2.0", "feed"))
  }

  test("punctuation survives as its own tokens") {
    assert(Tokenizer.tokenize("Hello, world!").toSeq === Seq("Hello", ",", "world", "!"))
  }

  test("null and empty") {
    assert(Tokenizer.tokenize(null) === null)
    assert(Tokenizer.tokenize("").isEmpty)
    assert(Tokenizer.tokenize("   \t\n ").isEmpty)
  }

  test("10-grams of the RSS sentence (reference src/tokens.rs:78-131)") {
    val s = "You can follow any responses to this entry through the RSS 2.0 feed"
    val grams = Tokenizer.ngrams(Tokenizer.tokenize(s), 10).map(_.toSeq).toSeq
    assert(grams === Seq(
      Seq("You", "can", "follow", "any", "responses", "to", "this", "entry", "through", "the"),
      Seq("can", "follow", "any", "responses", "to", "this", "entry", "through", "the", "RSS"),
      Seq("follow", "any", "responses", "to", "this", "entry", "through", "the", "RSS", "2.0"),
      Seq("any", "responses", "to", "this", "entry", "through", "the", "RSS", "2.0", "feed")))
  }

  test("4-grams (reference src/ngrams/mod.rs:118-131)") {
    val toks = "one two three four five".split(' ')
    assert(Tokenizer.ngrams(toks, 4).map(_.toSeq).toSeq === Seq(
      Seq("one", "two", "three", "four"), Seq("two", "three", "four", "five")))
  }

  test("2-grams and unigrams (reference src/ngrams/mod.rs:133-159)") {
    val toks = "one two three four".split(' ')
    assert(Tokenizer.ngrams(toks, 2).map(_.toSeq).toSeq === Seq(
      Seq("one", "two"), Seq("two", "three"), Seq("three", "four")))
    assert(Tokenizer.ngrams(toks, 1).map(_.toSeq).toSeq ===
      Seq(Seq("one"), Seq("two"), Seq("three"), Seq("four")))
  }

  test("char-grams (reference src/ngrams/mod.rs:161-173)") {
    val seq = "test string".toCharArray.map(_.toString)
    assert(Tokenizer.ngrams(seq, 4).map(_.mkString).toSeq === Seq(
      "test", "est ", "st s", "t st", " str", "stri", "trin", "ring"))
  }

  test("fewer tokens than n yields no n-grams") {
    assert(Tokenizer.ngrams(Array("a", "b"), 3).isEmpty)
  }
}
