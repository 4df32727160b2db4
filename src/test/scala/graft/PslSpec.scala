package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Full publicsuffix.org semantics against the distro-shipped rule file:
  * literal longest-match, wildcard (`*.ck`), exception (`!www.ck`), implicit
  * default rule, and the ICANN/private section switch (tldextract's
  * `include_psl_private_domains` analogue).
  */
class PslSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val icann = UrlOps.loadPublicSuffixList(spark)
  private lazy val full = UrlOps.loadPublicSuffixList(spark, icannOnly = false)

  private def suffixOf(hosts: Seq[String], psl: org.apache.spark.sql.DataFrame): Map[String, String] =
    UrlOps.annotatePublicSuffix(hosts.toDF("host"), psl)
      .collect().map(r => r.getString(0) -> r.getString(r.fieldIndex("public_suffix"))).toMap

  test("literal rules: longest match wins") {
    val got = suffixOf(Seq("foo.example.co.uk", "bar.example.com", "deep.a.b.example.co.uk"), icann)
    assert(got("foo.example.co.uk") === "co.uk")
    assert(got("bar.example.com") === "com")
    assert(got("deep.a.b.example.co.uk") === "co.uk")
  }

  test("wildcard *.ck and exception !www.ck") {
    val got = suffixOf(Seq("shop.anything.ck", "www.ck", "sub.www.ck"), icann)
    assert(got("shop.anything.ck") === "anything.ck") // *.ck
    assert(got("www.ck") === "ck")                    // !www.ck beats *.ck
    // spec step 3: an exception rule prevails for ANY domain ending with it,
    // so sub.www.ck's suffix is also ck (registrable domain www.ck)
    assert(got("sub.www.ck") === "ck")
  }

  test("unmatched TLD falls back to the implicit default rule") {
    val got = suffixOf(Seq("host.nonexistenttld", "single"), icann)
    assert(got("host.nonexistenttld") === "nonexistenttld")
    assert(got("single") === "single")
  }

  test("private-section rules only apply when icannOnly = false") {
    val gotIcann = suffixOf(Seq("user.github.io"), icann)
    val gotFull = suffixOf(Seq("user.github.io"), full)
    assert(gotIcann("user.github.io") === "io")
    assert(gotFull("user.github.io") === "github.io")
  }

  test("registrable domain is public suffix + 1 label (null for bare suffix)") {
    val out = UrlOps.annotatePublicSuffix(
        Seq("deep.a.example.co.uk", "www.ck", "co.uk").toDF("host"), icann)
      .collect().map(r => r.getString(0) -> Option(r.getAs[String]("registrable_domain"))).toMap
    assert(out("deep.a.example.co.uk") === Some("example.co.uk"))
    assert(out("www.ck") === Some("www.ck")) // suffix ck via exception rule
    assert(out("co.uk") === None)
  }

  test("suffixCountsPsl aggregates over the matched suffix") {
    val hosts = Seq(("a.example.com", 2L), ("b.example.co.uk", 3L), ("c.example.com", 1L))
      .toDF("host", "cnt")
    val got = UrlOps.suffixCountsPsl(hosts, icann)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("com" -> 3L, "co.uk" -> 3L))
  }
}
