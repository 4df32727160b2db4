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

  // ---- ASCII fast-path parity vs the JDK BreakIterator ----
  //
  // The fast path re-implements the legacy RBBI word grammar on ASCII; these
  // generator tests pin it to the BreakIterator's actual behavior, char
  // class by char class. Alphabet covers every ASCII class: letters, digits,
  // mid-word ["'-._], mid-num ["',.], pre-num [#$.], post-num [%&], plain
  // punct [:;], whitespace.

  private val alphabet = "azA19.',-_:;&$%#\" ".toCharArray

  private def assertParity(s: String): Unit = {
    val fast = Tokenizer.tokenize(s).toSeq
    val slow = Tokenizer.tokenizeBi(s).toSeq
    assert(fast === slow, s"mismatch on ${s.map(c => f"\\u$c%04x").mkString}: '$s'")
  }

  test("ASCII DFA matches BreakIterator exhaustively (alphabet^<=4)") {
    def rec(prefix: String, depth: Int): Unit = {
      var i = 0
      while (i < alphabet.length) {
        val s = prefix + alphabet(i)
        assertParity(s)
        if (depth > 1) rec(s, depth - 1)
        i += 1
      }
    }
    rec("", 4)
  }

  test("ASCII DFA matches BreakIterator on random longer strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50000) {
      val len = 5 + rnd.nextInt(12)
      assertParity(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("ASCII DFA matches BreakIterator on random full-range ASCII incl controls") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20000) {
      val len = 1 + rnd.nextInt(24)
      assertParity(Array.fill(len)((rnd.nextInt(127) + 1).toChar).mkString)
    }
  }

  test("non-ASCII input falls back to BreakIterator (byte-identical results)") {
    val samples = Seq("héllo wörld", "日本語のテキスト", "a café, 2.0 naïve",
      "Ελληνικά 3,5 κείμενο", "emoji 😀 mix a-b", "разные языки")
    for (s <- samples) assert(Tokenizer.tokenize(s).toSeq === Tokenizer.tokenizeBi(s).toSeq)
  }

  test("tokenizeUtf8 ASCII path equals String path") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 5000) {
      val len = rnd.nextInt(30)
      val s = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val viaUtf8 = {
        val a = Tokenizer.tokenizeUtf8(UTF8String.fromString(s))
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      assert(viaUtf8 === Tokenizer.tokenize(s).toSeq, s"utf8 path mismatch on '$s'")
    }
  }
}
