package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenizer
import graft.functions.expressions.{CountTokenSeqKernel, FirstTokenWalker, MinHashKernel, PhraseMatchKernel, SimHashKernel, WinnowKernel}

/** Seeded property loops over the codegen kernels (no Spark session —
  * these run at expression level, a few hundred random cases each).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any).toArray)

  private val rng = new scala.util.Random(42)
  private def randTokens(maxLen: Int): Seq[String] =
    Seq.fill(rng.nextInt(maxLen))(s"w${rng.nextInt(8)}")

  test("battery walker == per-phrase kernels on unicode tokens, slop 0-3") {
    // FirstTokenWalker's containment walk must agree with
    // PhraseMatchKernel.matches per phrase (incl. the m==0 always-match
    // and slop anchoring), and its counting walk with
    // CountTokenSeqKernel.count — over a vocab spanning ASCII, BMP
    // accents, CJK and supplementary-plane codepoints, where byte-level
    // UTF8String equality and Java char handling could diverge
    val vocab = Vector("a", "caf\u00e9", "\u6771\u4eac", "\ud83d\ude00ok", "b")
    val wrng = new scala.util.Random(20260816)
    def draw(maxLen: Int): Seq[String] =
      Seq.fill(wrng.nextInt(maxLen))(vocab(wrng.nextInt(vocab.size)))
    for (_ <- 0 until 300) {
      val doc = draw(10)
      val battery = (Seq.fill(6)(draw(3)) :+ Seq.empty[String]).distinct
      val w = new FirstTokenWalker(battery.map(_.map(UTF8String.fromString).toArray).toArray)
      val slop = wrng.nextInt(4)
      val n = w.walk(arr(doc), Int.MaxValue, slop)
      val got = (0 until n).map(w.matches(_)).toSet
      val want = battery.indices.filter(i =>
        PhraseMatchKernel.matches(arr(doc), arr(battery(i)), slop)).toSet
      assert(got === want, s"doc=$doc battery=$battery slop=$slop")
      val nc = w.walkCounts(arr(doc))
      val gotCounts = (0 until nc).map(i => w.matches(i) -> w.counts(w.matches(i))).toMap
      battery.indices.foreach { i =>
        val want = CountTokenSeqKernel.count(arr(doc), arr(battery(i)))
        assert(gotCounts.getOrElse(i, 0L) === want,
          s"counts doc=$doc phrase=${battery(i)}")
      }
    }
  }

  test("tokenizer: no whitespace tokens, deterministic, chars preserved in order") {
    val alphabet = "ab1. ,'-_:\n\t"
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rng.nextInt(20))(alphabet(rng.nextInt(alphabet.length))).mkString
      val t1 = Tokenizer.tokenize(s)
      val t2 = Tokenizer.tokenize(s)
      assert(t1.toSeq === t2.toSeq)
      assert(t1.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)), s"blank token in '$s'")
      // tokens concatenated == input minus whitespace (segmentation never
      // drops or reorders non-space chars)
      assert(t1.mkString === s.filterNot(_.isWhitespace), s"lost chars in '$s'")
    }
  }

  test("term postings kernel: groups == reference groupBy, positions ascend") {
    import graft.functions.expressions.PostingsKernel
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    (1 to 300).foreach { _ =>
      val toks = randTokens(30)
      val got = PostingsKernel.termPostings(arr(toks))
      val gotMap = (0 until got.numElements()).map { i =>
        val r = got.get(i, null).asInstanceOf[GenericInternalRow]
        val term = r.get(0, null).asInstanceOf[UTF8String].toString
        val ps = r.get(1, null).asInstanceOf[ArrayData].toIntArray().toList
        term -> ps
      }
      // reference: index positions grouped by token, in-order
      val want = toks.zipWithIndex.groupBy(_._1)
        .map { case (t, tp) => t -> tp.map(_._2).toList }
      assert(gotMap.toMap === want)
      // first-occurrence term order and ascending positions
      assert(gotMap.map(_._1) === toks.distinct)
      gotMap.foreach { case (t, ps) => assert(ps === ps.sorted, t) }
    }
  }

  test("slop positions kernel == matchesLucene on the same doc") {
    import graft.functions.expressions.{PostingsKernel, SlopPositionsKernel}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    (1 to 300).foreach { _ =>
      val toks = randTokens(16)
      val phrase = randTokens(4)
      if (toks.nonEmpty && phrase.nonEmpty) {
        val slop = rng.nextInt(4)
        val post = PostingsKernel.termPostings(arr(toks))
        val byTerm = (0 until post.numElements()).map { i =>
          val r = post.get(i, null).asInstanceOf[GenericInternalRow]
          r.get(0, null).asInstanceOf[UTF8String].toString ->
            r.get(1, null).asInstanceOf[ArrayData]
        }.toMap
        val viaIndex = phrase.map(byTerm.get) match {
          case slots if slots.forall(_.isDefined) =>
            SlopPositionsKernel.slopMatch(
              new GenericArrayData(slots.map(_.get: Any).toArray),
              toks.length.toLong, slop)
          case _ => false // a term absent from the doc can never match
        }
        val viaScan = PhraseMatchKernel.matchesLucene(arr(toks), arr(phrase), slop)
        assert(viaIndex === viaScan, s"toks=$toks phrase=$phrase slop=$slop")
      }
    }
  }

  test("bpe: tokens reassemble the word; encode deterministic; merges shrink") {
    import graft.functions.Bpe
    val chars = "abcde"
    (1 to 200).foreach { _ =>
      val words = Seq.fill(1 + rng.nextInt(6))(
        Seq.fill(1 + rng.nextInt(8))(chars(rng.nextInt(chars.length))).mkString)
      val counts = words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong * (1 + rng.nextInt(5))) }
      val merges = Bpe.train(counts, 1 + rng.nextInt(10))
      val table = new Bpe.MergeTable(merges)
      words.foreach { w =>
        val t1 = table.encodeWord(w)
        assert(t1.mkString === w, s"tokens must reassemble '$w'")
        assert(t1.toSeq === table.encodeWord(w).toSeq) // deterministic
        assert(t1.length <= w.length)
      }
      // training words with enough merges compress below char count when
      // any pair repeated
      if (merges.nonEmpty) {
        // .toSeq first: Map#keys is a Set and mapping to lengths would
        // collapse duplicates before summing
        val trained = counts.keys.toSeq.map(w => table.encodeWord(w).length).sum
        val raw = counts.keys.toSeq.map(_.length).sum
        assert(trained < raw)
      }
    }
  }

  test("ngrams: window count and width invariants") {
    (1 to 300).foreach { _ =>
      val toks = randTokens(15)
      val n = 1 + rng.nextInt(5)
      val grams = Tokenizer.ngramsJoinedUtf8(arr(toks), n)
      val expected = math.max(0, toks.length - n + 1)
      assert(grams.numElements() === expected)
      (0 until grams.numElements()).foreach { i =>
        assert(grams.getUTF8String(i).toString === toks.slice(i, i + n).mkString(" "))
      }
    }
  }

  test("count-seq: every slice occurs >= 1; absent phrase counts 0; sum bound") {
    (1 to 300).foreach { _ =>
      val toks = randTokens(20)
      if (toks.nonEmpty) {
        val from = rng.nextInt(toks.length)
        val len = 1 + rng.nextInt(toks.length - from)
        val slice = toks.slice(from, from + len)
        assert(CountTokenSeqKernel.count(arr(toks), arr(slice)) >= 1L)
        assert(CountTokenSeqKernel.count(arr(toks), arr(Seq("never-present"))) === 0L)
        // occurrences of a length-m phrase can't exceed the window count
        assert(CountTokenSeqKernel.count(arr(toks), arr(slice)) <= toks.length - len + 1)
      }
    }
  }

  test("phrase match: slop monotonicity and slice containment") {
    (1 to 300).foreach { _ =>
      val toks = randTokens(15)
      if (toks.nonEmpty) {
        val from = rng.nextInt(toks.length)
        val len = 1 + rng.nextInt(math.min(4, toks.length - from))
        val slice = toks.slice(from, from + len)
        assert(PhraseMatchKernel.matches(arr(toks), arr(slice), 0))
        val p = arr(Seq.fill(3)(s"w${rng.nextInt(8)}"))
        val s = rng.nextInt(3)
        if (PhraseMatchKernel.matches(arr(toks), p, s))
          assert(PhraseMatchKernel.matches(arr(toks), p, s + 1), "slop not monotonic")
      }
    }
  }

  test("phrase slop differential: both kernels match brute-force enumeration at slop 0-4") {
    // naive insertion-budget semantics: some increasing position tuple
    // spells the phrase with span − length ≤ slop
    def naiveInsertion(toks: Seq[String], phrase: Seq[String], slop: Int): Boolean = {
      val m = phrase.length
      if (m == 0) return true
      def rec(pi: Int, prev: Int, first: Int): Boolean =
        if (pi == m) (prev - first + 1 - m) <= slop
        else (prev + 1 until toks.length).exists(p =>
          toks(p) == phrase(pi) && rec(pi + 1, p, first))
      toks.indices.exists(f => toks(f) == phrase.head && rec(1, f, f))
    }
    // naive Lucene move-distance semantics: DISTINCT doc positions p_i with
    // token(p_i) = term_i and max(p_i − i) − min(p_i − i) ≤ slop — full
    // tuple enumeration, no greedy shortcut
    def naiveLucene(toks: Seq[String], phrase: Seq[String], slop: Int): Boolean = {
      val m = phrase.length
      if (m == 0) return true
      val cands = phrase.map(t => toks.indices.filter(i => toks(i) == t))
      def rec(pi: Int, chosen: List[Int]): Boolean =
        if (pi == m) {
          val adj = chosen.reverse.zipWithIndex.map { case (p, i) => p - i }
          adj.max - adj.min <= slop
        } else cands(pi).exists(p => !chosen.contains(p) && rec(pi + 1, p :: chosen))
      rec(0, Nil)
    }
    // tiny alphabet forces repeated terms (the hard case for both kernels:
    // shared candidate lists + used-position clashes)
    val alpha = Seq("a", "b", "c")
    (1 to 2000).foreach { _ =>
      val toks = Seq.fill(1 + rng.nextInt(10))(alpha(rng.nextInt(alpha.length)))
      val phrase = Seq.fill(1 + rng.nextInt(4))(alpha(rng.nextInt(alpha.length)))
      (0 to 4).foreach { slop =>
        assert(PhraseMatchKernel.matches(arr(toks), arr(phrase), slop) ===
          naiveInsertion(toks, phrase, slop),
          s"insertion: toks=$toks phrase=$phrase slop=$slop")
        assert(PhraseMatchKernel.matchesLucene(arr(toks), arr(phrase), slop) ===
          naiveLucene(toks, phrase, slop),
          s"lucene: toks=$toks phrase=$phrase slop=$slop")
      }
    }
    // the documented divergence between the two semantics: a transposition
    // costs 2 moves in Lucene but can never be bought with insertions
    assert(PhraseMatchKernel.matchesLucene(arr(Seq("b", "a")), arr(Seq("a", "b")), 2))
    assert(!PhraseMatchKernel.matches(arr(Seq("b", "a")), arr(Seq("a", "b")), 4))
  }

  test("minhash: permutation-invariant over shingle multisets, length k") {
    (1 to 200).foreach { _ =>
      val toks = randTokens(15)
      val w = 1 + rng.nextInt(3)
      val sig = MinHashKernel.sigMd5(arr(toks), w, 8)
      if (toks.length < w) assert(sig == null)
      else {
        assert(sig.numElements() === 8)
        // duplicating the doc's tokens (same shingle set ∪ overlap window)
        // keeps every min: signature of toks++toks contains pairwise mins
        val sig2 = MinHashKernel.sigMd5(arr(toks ++ toks), w, 8)
        (0 until 8).foreach { i =>
          assert(sig2.getUTF8String(i).toString <= sig.getUTF8String(i).toString)
        }
      }
    }
  }

  test("simhash: fingerprint of x ++ x equals fingerprint of x (votes double)") {
    (1 to 200).foreach { _ =>
      val toks = randTokens(12)
      val f1 = SimHashKernel.simhashMd5(arr(toks), 16).toString
      val f2 = SimHashKernel.simhashMd5(arr(toks ++ toks), 16).toString
      assert(f1 === f2) // doubling every vote preserves every sign
      assert(f1.length === 16 && f1.forall(c => c == '0' || c == '1'))
    }
  }

  test("winnow: subset of shingle hashes, shift-invariant fingerprint overlap") {
    (1 to 200).foreach { _ =>
      val toks = randTokens(25)
      val fp = WinnowKernel.fingerprints(arr(toks), 3, 4)
      if (toks.length < 3 + 4 - 1) assert(fp == null)
      else {
        // winnowed set is non-empty and sorted ascending
        assert(fp.numElements() > 0)
        val longs = (0 until fp.numElements()).map(fp.getLong)
        assert(longs === longs.sorted)
        // prepending unrelated tokens keeps at least one shared fingerprint
        // when the shared run is long enough (winnowing guarantee)
        if (toks.length >= 12) {
          val shifted = WinnowKernel.fingerprints(arr(Seq("zzz1", "zzz2") ++ toks), 3, 4)
          val sharedCount = (0 until shifted.numElements()).map(shifted.getLong)
            .toSet.intersect(longs.toSet).size
          assert(sharedCount > 0, s"no shared fingerprint after shift: $toks")
        }
      }
    }
  }

  test("dsir kernel: bucket stream matches the md5-hex reference on random tokens") {
    import graft.functions.expressions.DsirBuckets
    import org.apache.spark.sql.catalyst.expressions.Literal
    // reference formulation: first 8 hex chars of md5(gram) as unsigned int
    def refBucket(g: String, buckets: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(g.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val alphabet = Seq("a", "bb", "", "2.0", "café", "漢", "w1", "-")
    (1 to 300).foreach { _ =>
      val toks = Seq.fill(rng.nextInt(8))(alphabet(rng.nextInt(alphabet.length)))
      val buckets = 1 + rng.nextInt(512)
      val out = DsirBuckets(Literal(null), buckets).stream(arr(toks))
      val grams = toks ++ (if (toks.length > 1) toks.sliding(2).map(_.mkString(" ")).toSeq else Nil)
      val expected = grams.map(refBucket(_, buckets))
      assert((0 until out.numElements()).map(out.getLong) === expected,
        s"tokens=$toks buckets=$buckets")
    }
  }

  test("ct langid kernel: profile bounded+deduped, distance symmetry on own seed, determinism") {
    import graft.functions.expressions.CtKernel
    val alphabet = "abcdef \u00e9\u00fc\u4eca\u5929.'-12"
    val profiles = graft.operators.LangId.ctProfiles()
    val ranks = profiles.map { case (l, gs) => (l, CtKernel.rankMap(gs)) }.toArray
    (1 to 200).foreach { _ =>
      val text = Seq.fill(rng.nextInt(60))(alphabet(rng.nextInt(alphabet.length))).mkString
      val prof = CtKernel.profile(text, 300)
      assert(prof.length <= 300)
      assert(prof.toSeq.distinct.size === prof.length, s"dup grams for '$text'")
      // every profile gram actually occurs in the padded-word gram map
      val m = CtKernel.grams(text)
      assert(prof.forall(m.containsKey), s"phantom gram for '$text'")
      val a = CtKernel.classify(text, ranks, 300)
      assert(a === CtKernel.classify(text, ranks, 300)) // deterministic
      if (m.isEmpty) assert(a === "un")
    }
    // each seed classifies as ITSELF (distance 0 to its own profile)
    graft.operators.LangId.seeds.foreach { case (lang, seed) =>
      assert(CtKernel.classify(seed, ranks.sortBy(_._1), 300) === lang, lang)
    }
  }

  test("wildcardRegex: random patterns match exactly like a reference glob matcher") {
    import graft.search.InvertedIndex.wildcardRegex
    // reference: Lucene WildcardQuery semantics by direct recursion
    def globMatch(p: List[Char], s: List[Char]): Boolean = (p, s) match {
      case (Nil, Nil) => true
      case ('*' :: pt, _) =>
        globMatch(pt, s) || (s.nonEmpty && globMatch(p, s.tail))
      case ('?' :: pt, _ :: st) => globMatch(pt, st)
      case ('\\' :: c :: pt, h :: st) => c == h && globMatch(pt, st)
      case (c :: pt, h :: st) => c == h && globMatch(pt, st)
      case _ => false
    }
    val alphabet = "ab.?*\\("
    (1 to 500).foreach { i =>
      val pat = Seq.fill(rng.nextInt(6))(alphabet(rng.nextInt(alphabet.length))).mkString
      // a trailing bare backslash escapes nothing — skip that edge (the
      // translation passes it through literally; Lucene rejects it)
      if (!pat.endsWith("\\") || pat.endsWith("\\\\")) {
        val re = ("^(?:" + wildcardRegex(pat) + ")$").r
        (1 to 20).foreach { _ =>
          val s = Seq.fill(rng.nextInt(6))("ab.(" (rng.nextInt(4))).mkString
          assert(re.matches(s) === globMatch(pat.toList, s.toList),
            s"pattern '$pat' vs '$s' (regex ${wildcardRegex(pat)})")
        }
      }
    }
  }

}
