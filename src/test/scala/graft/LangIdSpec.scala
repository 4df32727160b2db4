package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.CtKernel
import graft.operators.LangId

/** Golden tests for the Cavnar\u2013Trenkle language-ID model path (P6): the
  * held-out sentences (LangIdHeldOut) appear nowhere in the training
  * seeds, so they check genuine char-ngram generalization, not
  * memorization \u2014 one per seed language, 37 languages / 12 scripts.
  */
class LangIdSpec extends SparkTestBase {

  private lazy val profiles = LangId.ctProfiles()
  private lazy val ranks =
    profiles.sortBy(_._1).map { case (l, gs) => (l, CtKernel.rankMap(gs)) }.toArray

  test("one profile per seed language, each dense, boundary gram present") {
    assert(profiles.map(_._1).sorted === LangIdHeldOut.samples.map(_._2).sorted)
    assert(profiles.size === LangIdHeldOut.samples.size,
      s"seed/held-out language count drift: ${profiles.size}")
    profiles.foreach { case (lang, gs) =>
      assert(gs.size > 100, s"$lang profile too small: ${gs.size}")
      assert(gs.distinct.size === gs.size, s"$lang profile has duplicate grams")
      // the underscore pad (word boundary) ranks high in every profile; in
      // space-free scripts (zh/ja/th) long letter runs dilute it below the
      // head slot, so assert presence, not rank 1
      assert(gs.contains("_"), s"$lang profile lost the boundary gram")
    }
  }

  test("golden: held-out sentences classify to their language, all 37") {
    val misses = LangIdHeldOut.samples.flatMap { case (text, want) =>
      val got = CtKernel.classify(text, ranks, CtKernel.DefaultTopK)
      if (got != want) Some(s"'${text.take(30)}...' => $got, wanted $want") else None
    }
    assert(misses.isEmpty, misses.mkString("\n"))
    // and through the DataFrame surface (codegen'd expression path)
    import spark.implicits._
    val df = LangIdHeldOut.samples.toDF("text", "want")
      .withColumn("pred", LangId.langIdModel(col("text"), profiles))
    assert(df.where(col("pred") =!= col("want")).count() === 0)
  }

  test("combining-mark scripts survive the word splitter intact") {
    // Devanagari matras / Thai vowel signs / Arabic harakat are \p{M}, not
    // \p{L}: a splitter of [^\p{L}]+ would shred these words and the grams
    // would be mark-free fragments. Check a marked word stays one word.
    // the full padded word is 6 chars (> MaxN), so check the 5-gram prefix
    // spanning letter+mark+letter+mark, and that the shredded single-letter
    // word the old splitter would produce is absent
    val g = CtKernel.grams("\u0924\u0947\u091c\u093c") // single Hindi word with matras
    assert(g.containsKey("_\u0924\u0947\u091c\u093c"),
      "combining marks were split out of the word")
    assert(!g.containsKey("_\u0924_"),
      "word was shredded at the combining mark")
  }

  test("no grams or unreliable match => un; null flows through") {
    assert(CtKernel.classify("", ranks, 300) === "un")
    assert(CtKernel.classify("12345 67% --- 99", ranks, 300) === "un")
    // an unseen script shares nothing with any profile: the reliability
    // ceiling reports un instead of an arbitrary argmin winner (the
    // pycld2 unreliable->un behavior). Georgian is not a seed language.
    assert(CtKernel.classify(
      "\u10d2\u10d0\u10db\u10d0\u10e0\u10ef\u10dd\u10d1\u10d0 \u10e0\u10dd\u10d2\u10dd\u10e0 \u10ee\u10d0\u10e0",
      ranks, 300) === "un")
    import spark.implicits._
    val df = Seq(Some("the cat"), None, Some("123")).toDF("text")
      .select(LangId.langIdModel(col("text"), profiles).as("p"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("en"), None, Some("un")))
  }

  test("charGrams column mirrors the kernel gram multiset (incl. short words)") {
    import spark.implicits._
    val texts = Seq("a bc def ghij klmno pqrstu", "  ", "d'une l\u00e0 \u4eca\u5929",
      "the quick brown fox",
      "\u0915\u093f\u0938\u0940 \u092d\u093e\u0937\u093e \u0915\u093e") // marked Devanagari
    val rows = texts.toDF("text")
      .select(col("text"), LangId.charGrams(col("text")).as("gs")).collect()
    rows.foreach { r =>
      val colGrams = r.getSeq[String](1).groupBy(identity).view.mapValues(_.size).toMap
      val kernel = CtKernel.grams(r.getString(0))
      val kGrams = scala.jdk.CollectionConverters.MapHasAsScala(kernel).asScala
        .map { case (k, v) => k -> v.intValue() }.toMap
      assert(colGrams === kGrams, s"mismatch for '${r.getString(0)}'")
    }
  }

  test("classifyIndexed == classify on held-out, seeds, and adversarial text") {
    val idx = new CtKernel.RankIndex(profiles, CtKernel.DefaultTopK)
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz àéüखग今天اب .'-"
    val randoms = (1 to 200).map(_ =>
      (1 to (1 + rng.nextInt(60))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "_", "a", "12345", "გამ")
    val texts = LangIdHeldOut.samples.map(_._1) ++ LangId.seeds.map(_._2) ++
      randoms ++ edges
    texts.foreach { t =>
      assert(CtKernel.classifyIndexed(t, idx) ===
        CtKernel.classify(t, ranks, CtKernel.DefaultTopK), s"diverged on '${t.take(40)}'")
    }
    // and at a non-default topK (ranks keep grams PAST topK — the
    // rankMap contract the index must mirror)
    val small = profiles.sortBy(_._1).map { case (l, gs) => (l, CtKernel.rankMap(gs)) }.toArray
    val idx50 = new CtKernel.RankIndex(profiles, 50)
    texts.take(80).foreach { t =>
      assert(CtKernel.classifyIndexed(t, idx50) === CtKernel.classify(t, small, 50))
    }
  }

  test("distributed trainProfiles on the seed frame reproduces ctProfiles exactly") {
    import spark.implicits._
    val df = LangId.seeds.toDF("lang", "text")
    val trained = LangId.trainProfiles(df, "text", "lang")
    assert(trained === profiles.sortBy(_._1))
  }
}
