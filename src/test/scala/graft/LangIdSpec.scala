package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.CtKernel
import graft.operators.LangId

/** Golden tests for the Cavnar\u2013Trenkle language-ID model path (P6): the
  * held-out sentences here appear nowhere in the training seeds, so they
  * check genuine char-ngram generalization, not memorization.
  */
class LangIdSpec extends SparkTestBase {

  private lazy val profiles = LangId.ctProfiles()
  private lazy val ranks =
    profiles.sortBy(_._1).map { case (l, gs) => (l, CtKernel.rankMap(gs)) }.toArray

  test("one profile per seed language, each dense and led by frequent short grams") {
    assert(profiles.map(_._1).sorted ===
      Seq("de", "en", "es", "fr", "it", "nl", "pt", "zh"))
    profiles.foreach { case (lang, gs) =>
      assert(gs.size > 100, s"$lang profile too small: ${gs.size}")
      assert(gs.distinct.size === gs.size, s"$lang profile has duplicate grams")
      // the underscore pad (word boundary) is the most frequent unigram in
      // any letter-script profile
      assert(gs.head === "_", s"$lang head gram was ${gs.head}")
    }
  }

  test("golden: held-out sentences classify to their language") {
    val samples = Seq(
      "the students are writing letters to their friends about the long journey home" -> "en",
      "die kinder lesen abends viele b\u00fccher und trinken warme milch in der k\u00fcche" -> "de",
      "los estudiantes escriben cartas a sus amigos sobre el largo viaje a casa" -> "es",
      "les \u00e9tudiants \u00e9crivent des lettres \u00e0 leurs amis au sujet du long voyage" -> "fr",
      "gli studenti scrivono lettere ai loro amici sul lungo viaggio verso casa" -> "it",
      "os estudantes escrevem cartas aos seus amigos sobre a longa viagem para casa" -> "pt",
      "de studenten schrijven brieven aan hun vrienden over de lange reis naar huis" -> "nl",
      "\u5b66\u751f\u4eec\u7ed9\u4ed6\u4eec\u7684\u670b\u53cb\u5199\u4fe1\u8bb2\u8ff0\u56de\u5bb6\u7684\u6f2b\u957f\u65c5\u7a0b" -> "zh")
    samples.foreach { case (text, want) =>
      val got = CtKernel.classify(text, ranks, CtKernel.DefaultTopK)
      assert(got === want, s"'${text.take(30)}...' => $got, wanted $want")
    }
    // and through the DataFrame surface (codegen'd expression path)
    import spark.implicits._
    val df = samples.toDF("text", "want")
      .withColumn("pred", LangId.langIdModel(col("text"), profiles))
    assert(df.where(col("pred") =!= col("want")).count() === 0)
  }

  test("no grams or unreliable match => un; null flows through") {
    assert(CtKernel.classify("", ranks, 300) === "un")
    assert(CtKernel.classify("12345 67% --- 99", ranks, 300) === "un")
    // an unseen script shares nothing with any profile: the reliability
    // ceiling reports un instead of an arbitrary argmin winner (the
    // pycld2 unreliable->un behavior)
    assert(CtKernel.classify(
      "\u043f\u0440\u0438\u0432\u0435\u0442 \u043a\u0430\u043a \u0434\u0435\u043b\u0430 \u0441\u0435\u0433\u043e\u0434\u043d\u044f",
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
      "the quick brown fox")
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

  test("distributed trainProfiles on the seed frame reproduces ctProfiles exactly") {
    import spark.implicits._
    val df = LangId.seeds.toDF("lang", "text")
    val trained = LangId.trainProfiles(df, "text", "lang")
    assert(trained === profiles.sortBy(_._1))
  }
}
