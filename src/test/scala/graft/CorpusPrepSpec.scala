package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analyses, TextQuality, UrlOps}

/** Round-4 corpus-preparation additions: URL canonicalization, domain
  * blocklists, DSIR importance resampling, temperature mixtures, HTML
  * extraction.
  */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("canonicalizeUrl: scheme/host case, ports, www, params, fragments, slashes") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "https://example.com/a/b?a=1&b=2",
      "http://example.com:80",
      "http://example.com/",
      "https://shop.example.com/p?gclid=123&q=shoes",
      "not-a-url"
    ).toDF("url")
    val out = urls.select(col("url"), UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag") ===
      "https://example.com/a/b?a=1&b=2")
    assert(out("https://example.com/a/b?a=1&b=2") === "https://example.com/a/b?a=1&b=2")
    assert(out("http://example.com:80") === "http://example.com/")
    assert(out("http://example.com/") === "http://example.com/")
    // gclid is a tracking param, q=shoes survives
    assert(out("https://shop.example.com/p?gclid=123&q=shoes") ===
      "https://shop.example.com/p?q=shoes")
    // malformed URLs pass through lowercased, not nulled
    assert(out("not-a-url") === "not-a-url")
  }

  test("urlDuplicateCounts groups distinct raw forms of the same page") {
    val df = Seq(
      "https://www.x.com/p/1?utm_campaign=a",
      "HTTPS://x.com:443/p/1",
      "https://x.com/p/1/",
      "https://x.com/p/2"
    ).toDF("url")
    val out = UrlOps.urlDuplicateCounts(df, "url").collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "https://x.com/p/1")
    assert(out.head.getLong(1) === 3L)
  }

  test("domainBlocklistFilter: predicate and join paths agree, subdomains blocked") {
    val df = Seq(
      (1L, "https://ads.tracker.net/x"),
      (2L, "https://tracker.net/y"),
      (3L, "https://nottracker.net/z"),
      (4L, "https://fine.org/a")
    ).toDF("id", "url")
    val blocked = Seq("tracker.net")
    val pred = UrlOps.domainBlocklistFilter(df, "url", blocked)
      .select("id").as[Long].collect().sorted
    val join = UrlOps.domainBlocklistFilter(df, "url", blocked, asJoin = true)
      .select("id").as[Long].collect().sorted
    // "nottracker.net" must NOT be blocked (suffix match is label-aligned)
    assert(pred.toSeq === Seq(3L, 4L))
    assert(join.toSeq === pred.toSeq)
  }

  test("temperatureMixture: alpha=1 is proportional, alpha→0 flattens toward uniform") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (s, s"tok tok tok") }
      .toDF("source", "text")
    def probs(alpha: Double): Map[String, Double] =
      Analyses.temperatureMixture(df, col("source"), "text", alpha, 1000L)
        .select("source", "p").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val p1 = probs(1.0)
    assert(math.abs(p1("big") - 0.9) < 1e-6)
    val p05 = probs(0.5)
    assert(p05("big") < 0.9 && p05("small") > 0.1)
    // epochs > 1 surfaces when a source must repeat to meet its target
    val plan = Analyses.temperatureMixture(df, col("source"), "text", 0.0, 100000L)
      .select("source", "epochs").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plan("small") > 1.0)
  }

  test("DSIR: target-like docs outweigh raw-typical docs; selection is deterministic") {
    val target = Seq.fill(30)("quantum physics lecture notes").toDF("text")
    val raw = (Seq.fill(30)("quantum physics lecture notes") ++
      Seq.fill(60)("buy cheap pills online now")).toDF("text")
    val ratios = Analyses.dsirLogRatios(target, raw, "text", buckets = 64)
    // the one-scan predicate variant computes the same table
    val ratiosWhere = Analyses.dsirLogRatiosWhere(
      raw, col("text") === "quantum physics lecture notes", "text", buckets = 64)
    assert(ratios.toSeq === ratiosWhere.toSeq)
    val scored = Analyses.dsirWeights(raw.distinct(), "text", ratios)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("quantum physics lecture notes") > scored("buy cheap pills online now"))
    val docs = (1L to 50L).map(i =>
      (i, if (i % 5 === 0) "quantum physics lecture notes" else "buy cheap pills online now"))
      .toDF("id", "text")
    val sel1 = Analyses.dsirSelect(Analyses.dsirWeights(docs, "text", ratios), col("id"), 10)
      .select("id").as[Long].collect().toSet
    val sel2 = Analyses.dsirSelect(Analyses.dsirWeights(docs, "text", ratios), col("id"), 10)
      .select("id").as[Long].collect().toSet
    assert(sel1 === sel2) // derandomized Gumbel: stable across runs
    // the target-like docs (ids divisible by 5) dominate the selection
    assert(sel1.count(_ % 5 == 0) >= 8)
  }

  test("stripHtml: scripts, styles, comments, tags, entities, whitespace") {
    val html = """<html><head><style>p { color: red }</style></head>
      |<body><!-- comment --><p>Hello &amp; welcome</p>
      |<script>if (1 < 2) { alert("x"); }</script>
      |<p>A &lt;b&gt; c&nbsp;d &#39;q&#39;</p></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextQuality.stripHtml(col("h")).as("t")).as[String].head()
    assert(out === "Hello & welcome A <b> c d 'q'")
  }
}
