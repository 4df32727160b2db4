package graft

import org.apache.spark.sql.functions._

/** Smoke coverage of the reference-facade: every `Wimbd` entry point runs
  * on a tiny in-memory corpus and returns a sane shape — the 1:1 surface a
  * reference user switches to must not bit-rot while the operator objects
  * underneath evolve.
  */
class WimbdSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    ("the quick brown fox jumps", "https://a.example.com/p/1.html", "2019-04-21T18:54:04Z"),
    ("the quick brown cat jumps", "https://b.example.org/p/2.jpg", "2020-01-01T00:00:00Z"),
    ("completely different words here", "http://a.example.com/q", "2020-06-07T01:02:03Z")
  ).toDF("text", "url", "date")
    .withColumn("timestamp", lit(null).cast("string"))
    .withColumn("created", lit(null).cast("string"))

  test("rust CLI surface: topk/botk/count/search/stats/unique") {
    val tk = Wimbd.topk(docs, n = 2, k = 3, uax29 = false).collect()
    assert(tk.length === 3 && tk.head.getLong(1) >= tk.last.getLong(1))
    assert(Wimbd.botk(docs, n = 2, k = 3, uax29 = false).count() === 3)
    val cnt = Wimbd.count(docs, Seq("the quick", "absent phrase"), uax29 = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt("the quick") === 2L && cnt("absent phrase") === 0L)
    assert(Wimbd.search(docs, Seq("qu[a-z]+")).head().getLong(1) === 2L)
    assert(Wimbd.stats(docs, uax29 = false).head().getAs[Long]("n_docs") === 3L)
    assert(Wimbd.unique(docs, n = 1, uax29 = false).head().getLong(0) === 10L)
    assert(Wimbd.statsExtremes(docs, "url", uax29 = false).count() >= 2)
  }

  test("python mapper surface: urls, language, pii, lengths, dates, sample") {
    val hosts = Wimbd.urlCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hosts("a.example.com") === 2L)
    assert(Wimbd.urlPerTokCounts(docs, uax29 = false).count() === 2) // 2 hosts
    assert(Wimbd.schemeCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("https" -> 2L, "http" -> 1L))
    val ext = Wimbd.extensionCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ext.getOrElse("jpg", 0L) === 1L)
    assert(Wimbd.languageCounts(docs).count() >= 1)
    assert(Wimbd.languageCountsModel(docs).columns.toSeq === Seq("lang", "cnt"))
    assert(Wimbd.languageCountsModel(docs).agg(sum("cnt")).head().getLong(0)
      === docs.count())
    assert(Wimbd.piiCounts(docs).collect().map(_.getLong(1)).sum === 0L)
    assert(Wimbd.taxonomyCounts(docs, Map("animals" -> Seq("fox", "cat")))
      .head().getLong(1) === 2L)
    assert(Wimbd.lengthHistograms(docs, uax29 = false)
      .where(col("dim") === "tokens").count() >= 1)
    assert(Wimbd.utteranceDates(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(2019L -> 1L, 2020L -> 2L))
    assert(Wimbd.randomSample(docs, "ff").count() <= 3)
  }

  test("dedup + ES surface: deduplicate, decontaminate, phrase counts, ttf") {
    val dup = docs.union(docs.limit(1))
    assert(Wimbd.deduplicate(dup, md5(col("text")), Seq(col("url"))).count() === 3)
    assert(Wimbd.decontaminate(docs, md5(col("text")),
      docs.limit(1), md5(col("text"))).count() === 2)
    assert(Wimbd.countDocumentsContainingPhrases(docs, Seq("quick brown"))
      .head().getLong(0) === 2L)
    // 'quick <brown> <fox|cat> jumps': two inserted tokens need slop 2
    assert(Wimbd.countDocumentsContainingPhrases(docs,
      Seq("quick jumps"), slop = 2).head().getLong(0) === 2L)
    assert(Wimbd.countDocumentsContainingPhrases(docs,
      Seq("quick jumps"), slop = 1).head().getLong(0) === 0L)
    assert(Wimbd.getDocumentsContainingPhrases(docs, Seq("different words"),
      numDocuments = 5).count() === 1)
    val per = Wimbd.countDocumentsForEachPhrase(docs, Seq("brown fox", "zz qq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per === Map("brown fox" -> 1L, "zz qq" -> 0L))
    val ttf = Wimbd.countTotalOccurrencesOfUnigrams(docs, Seq("the", "zz"),
      uax29 = false).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ttf === Map("the" -> 2L, "zz" -> 0L))
    assert(Wimbd.corpusContamination(docs, Seq("quick brown", "no such thing"))
      .head().getAs[Double]("pct") === 0.5)
    // paired: both fields must land in ONE doc
    val paired = Wimbd.pairedContamination(docs,
      Seq(Seq("quick brown", "the"), Seq("quick brown", "no such thing")))
      .head()
    assert((paired.getLong(0), paired.getLong(1)) === ((2L, 1L)))
  }

  test("index tier facade: build, phrase counts (exact + slop), bm25 rank") {
    val docsWithIds = docs.withColumn("doc_id",
      xxhash64(col("url"))) // any unique id column
    val post = Wimbd.buildIndex(docsWithIds)
    val exact = Wimbd.countPhrasesIndexed(post, Seq("quick brown", "zz qq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact === Map("quick brown" -> 2L, "zz qq" -> 0L))
    // same two-insertion phrase the scan-tier test pins: slop 2 hits, 1 not
    val s2 = Wimbd.countPhrasesIndexed(post, Seq("quick jumps"), slop = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = Wimbd.countPhrasesIndexed(post, Seq("quick jumps"), slop = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 === Map("quick jumps" -> 2L))
    assert(s1 === Map("quick jumps" -> 0L))
    val norms = graft.search.InvertedIndex.corpusNorms(docs, "text")
    val ranked = Wimbd.rankDocuments(post, norms, Seq("quick"), k = 3).collect()
    assert(ranked.length === 2) // only the two docs containing 'quick'
    assert(ranked.map(_.getDouble(1)).toSeq ===
      ranked.map(_.getDouble(1)).sorted.reverse.toSeq)
  }
}
