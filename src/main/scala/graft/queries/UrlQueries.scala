package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** URL mapper algebra (SURVEY §2.2 P1-P5). The synthetic tables carry no
  * URL column, so both sides first synthesize one deterministically from
  * (doc_id, source) with varied schemes / suffixes / extensions, then run
  * the real operators over it.
  */
object UrlQueries extends QueryPack {

  private def withUrl(df: DataFrame): DataFrame = {
    val scheme = when(col("doc_id") % 3 === 0, "https")
      .when(col("doc_id") % 3 === 1, "http").otherwise("ftp")
    val tld = when(col("doc_id") % 5 === 0, ".example.co.uk").otherwise(".example.com")
    val ext = when(col("doc_id") % 4 === 0, ".jpg")
      .when(col("doc_id") % 4 === 1, ".png")
      .when(col("doc_id") % 4 === 2, ".html").otherwise("")
    df.withColumn("url",
      concat(scheme, lit("://"), col("source"), tld, lit("/p/"),
        col("doc_id").cast("string"), ext))
  }

  /** Messy variant for canonicalization: case noise in the scheme, www.
    * prefixes, explicit :443, trailing slashes, tracking params, reordered
    * params, fragments — all mapping onto `doc_id % 250` logical pages so
    * distinct raw URLs collide on the canonical form.
    */
  private def withMessyUrl(df: DataFrame): DataFrame = {
    val scheme = when(col("doc_id") % 2 === 0, "HTTPS").otherwise("https")
    val www = when(col("doc_id") % 3 === 0, "www.").otherwise("")
    val port = when(col("doc_id") % 5 === 0, ":443").otherwise("")
    val slash = when(col("doc_id") % 2 === 0, "/").otherwise("")
    // gclid/fbclid exercise the NAMED tracking-param drop branch (not just
    // the utm_ prefix); the '#sec2?x=9' fragment carries a '?' so the
    // fragment-before-query parse order is cross-checked too
    val query = when(col("doc_id") % 3 === 0, "?utm_source=feed&b=2&a=1")
      .when(col("doc_id") % 3 === 1, "?a=1&gclid=CjX12&b=2&fbclid=IwAB3").otherwise("")
    val frag = when(col("doc_id") % 7 === 0, "#sec2?x=9").otherwise("")
    df.withColumn("url",
      concat(scheme, lit("://"), www, lit("h"), (col("doc_id") % 10).cast("string"),
        lit(".example.com"), port,
        lit("/p/"), (col("doc_id") % 250).cast("string"), slash, query, frag))
  }

  private val messyUrlCte =
    """WITH u AS (SELECT *,
      | (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
      | (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || 'h' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' ||
      | (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
      | '/p/' || CAST(doc_id % 250 AS VARCHAR) ||
      | (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
      | (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
      |       WHEN doc_id % 3 = 1 THEN '?a=1&gclid=CjX12&b=2&fbclid=IwAB3' ELSE '' END) ||
      | (CASE WHEN doc_id % 7 = 0 THEN '#sec2?x=9' ELSE '' END) AS url
      | FROM documents)""".stripMargin

  // NB: interpolated into s"""…""".stripMargin blocks below, so no line here
  // may start with '|' after the first strip (it would be stripped again).
  private val urlCte =
    """WITH u AS (SELECT *,
      | (CASE WHEN doc_id % 3 = 0 THEN 'https' WHEN doc_id % 3 = 1 THEN 'http' ELSE 'ftp' END) ||
      | '://' || source ||
      | (CASE WHEN doc_id % 5 = 0 THEN '.example.co.uk' ELSE '.example.com' END) ||
      | '/p/' || CAST(doc_id AS VARCHAR) ||
      | (CASE WHEN doc_id % 4 = 0 THEN '.jpg' WHEN doc_id % 4 = 1 THEN '.png'
      |      WHEN doc_id % 4 = 2 THEN '.html' ELSE '' END) AS url
      | FROM documents)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_url_host" -> ((s, dir) =>
      UrlOps.hostCounts(withUrl(Tables(s, dir, "documents")), "url").orderBy("host")),

    // per-domain report card: corpusReport's metrics faceted by host —
    // doc/token counts, mean length, unique texts, exact-dup fraction
    "r_domain_report" -> ((s, dir) =>
      graft.Pipeline.domainReport(withUrl(Tables(s, dir, "documents")),
        parse_url(col("url"), lit("HOST")), "text").orderBy("host")),

    "p2_url_per_tok" -> ((s, dir) =>
      UrlOps.hostTokenCounts(withUrl(Tables(s, dir, "documents")), "url", "text",
        uax29 = false).orderBy("host")),

    "p3_url_scheme" -> ((s, dir) =>
      UrlOps.schemeCounts(withUrl(Tables(s, dir, "documents")), "url").orderBy("scheme")),

    "p4_domain_suffix" -> ((s, dir) =>
      UrlOps.suffixCounts(
        UrlOps.hostCounts(withUrl(Tables(s, dir, "documents")), "url"),
        psl = Seq("co.uk", "com", "uk")).orderBy("suffix")),

    "p5_url_extension" -> ((s, dir) =>
      UrlOps.extensionCounts(withUrl(Tables(s, dir, "documents")), "url").orderBy("extension")),

    // full publicsuffix.org list (wildcards + exceptions), distro-shipped
    // rule file; the oracle derives the expected suffix independently from
    // the synthesized host shapes
    "p4_psl_full" -> ((s, dir) =>
      UrlOps.suffixCountsPsl(
        UrlOps.hostCounts(withUrl(Tables(s, dir, "documents")), "url"),
        UrlOps.loadPublicSuffixList(s)).orderBy("suffix")),

    // URL canonicalization → duplicate-URL groups: messy synthesized URLs
    // (case noise, www., :443, trailing slash, tracking params, fragments,
    // param order) collapse to one canonical form; groups with >1 doc are
    // URL-level duplicates (the URL-keyed sibling of J1)
    "p18_url_canonical" -> ((s, dir) =>
      // repartition: single-file input, but the canonical projection is a
      // dozen regexes + an interpreted HOF filter per row — CPU-bound
      UrlOps.urlDuplicateCounts(
        withMessyUrl(Tables(s, dir, "documents"))
          .repartition(s.sparkContext.defaultParallelism), "url")
        .orderBy("canonical_url")),

    // UT1-style domain blocklist (broadcast suffix-join path): docs kept
    // after dropping blocked domains and their subdomains, per source
    "p19_blocklist" -> ((s, dir) =>
      UrlOps.domainBlocklistFilter(withUrl(Tables(s, dir, "documents")), "url",
          blocked = Seq("example.co.uk", "src3.example.com"), asJoin = true)
        .groupBy("source").agg(count(lit(1)).as("cnt"))
        .orderBy("source")),

    // J6: the overlap lattice keyed on the URL host (reference
    // run_get_urls.sh), datasets = languages the host serves
    "j6_url_overlap" -> ((s, dir) =>
      graft.operators.Dedup.overlapSets(withUrl(Tables(s, dir, "documents")),
        regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1), col("lang"),
        hashKeys = true)
        .select(concat_ws(",", col("datasets")).as("datasets"), col("n_keys"))
        .orderBy("datasets"))
  )

  override val oracles: Map[String, String] = Map(
    "p18_url_canonical" ->
      s"""$messyUrlCte,
         |parts AS (SELECT
         |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |  lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hostraw,
         |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pathraw,
         |  regexp_extract(regexp_replace(url, '#.*', ''), '\\?(.*)', 1) AS qraw
         | FROM u),
         |canon AS (SELECT scheme || '://' ||
         |  regexp_replace(CASE WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$$', '')
         |    WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$$', '')
         |    ELSE hostraw END, '^www\\.', '') ||
         |  (CASE WHEN regexp_replace(pathraw, '/+$$', '') = '' THEN '/'
         |    ELSE regexp_replace(pathraw, '/+$$', '') END) ||
         |  (CASE WHEN coalesce(array_to_string(list_sort(list_filter(string_split(qraw, '&'),
         |      p -> NOT regexp_matches(p, '^utm_') AND p <> ''
         |        AND NOT regexp_matches(p, '^(fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)(=|$$)'))), '&'), '') = '' THEN ''
         |    ELSE '?' || array_to_string(list_sort(list_filter(string_split(qraw, '&'),
         |      p -> NOT regexp_matches(p, '^utm_') AND p <> ''
         |        AND NOT regexp_matches(p, '^(fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)(=|$$)'))), '&') END) AS canonical_url
         | FROM parts)
         |SELECT canonical_url, count(*) AS cnt FROM canon
         |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,

    "p19_blocklist" ->
      s"""$urlCte,
         |k AS (SELECT source, lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host FROM u)
         |SELECT source, count(*) AS cnt FROM k
         |WHERE NOT (host = 'example.co.uk' OR host LIKE '%.example.co.uk'
         |  OR host = 'src3.example.com' OR host LIKE '%.src3.example.com')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j6_url_overlap" ->
      s"""$urlCte,
         |per_key AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         |  array_to_string(list_sort(list(DISTINCT lang)), ',') AS datasets
         | FROM u GROUP BY 1)
         |SELECT datasets, count(*) AS n_keys FROM per_key GROUP BY 1 ORDER BY 1""".stripMargin,

    "p1_url_host" ->
      s"""$urlCte
         |SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host, count(*) AS cnt
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "r_domain_report" ->
      s"""$urlCte,
         |b AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         |  md5(text) AS h, len(string_split(text, ' ')) AS nt FROM u),
         |g AS (SELECT host, h, count(*) AS c, sum(nt) AS nt FROM b GROUP BY 1, 2)
         |SELECT host, CAST(sum(c) AS BIGINT) AS n_docs,
         | CAST(sum(nt) AS BIGINT) AS n_tokens,
         | round(sum(nt) / CAST(sum(c) AS DOUBLE), 6) AS mean_doc_tokens,
         | count(*) AS n_unique_texts,
         | round(CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS DOUBLE)
         |   / sum(c), 6) AS exact_dup_frac
         |FROM g GROUP BY host ORDER BY host""".stripMargin,

    "p2_url_per_tok" ->
      s"""$urlCte
         |SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "p3_url_scheme" ->
      s"""$urlCte
         |SELECT regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) AS scheme,
         | count(*) AS cnt
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "p4_domain_suffix" ->
      s"""$urlCte,
         |hosts AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         |  count(*) AS cnt FROM u GROUP BY 1)
         |SELECT (CASE WHEN host LIKE '%.co.uk' THEN 'co.uk'
         |  WHEN host LIKE '%.com' THEN 'com'
         |  WHEN host LIKE '%.uk' THEN 'uk' END) AS suffix,
         | CAST(sum(cnt) AS BIGINT) AS cnt
         |FROM hosts WHERE suffix IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "p4_psl_full" ->
      s"""$urlCte,
         |hosts AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         |  count(*) AS cnt FROM u GROUP BY 1)
         |SELECT (CASE WHEN host LIKE '%.co.uk' THEN 'co.uk' ELSE 'com' END) AS suffix,
         | CAST(sum(cnt) AS BIGINT) AS cnt
         |FROM hosts GROUP BY 1 ORDER BY 1""".stripMargin,

    "p5_url_extension" ->
      s"""$urlCte,
         |e AS (SELECT lower(regexp_extract(regexp_extract(url, '^[a-z]+://[^/]*(/[^?#]*)', 1),
         |  '\\.([^./]+)$$', 1)) AS raw FROM u)
         |SELECT (CASE WHEN raw IN ('jpg', 'jpeg', 'png') THEN raw ELSE 'other' END) AS extension,
         | count(*) AS cnt
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
