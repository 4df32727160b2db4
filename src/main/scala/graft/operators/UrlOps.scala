package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL analyses (reference wimbd/{url_counts,scheme_counts,
  * high_level_domain_counts,extension_counts,url_per_tok_counts}/map_count.py
  * — SURVEY §2.2 P1-P5). All pure column pipelines ending in a partial-agg
  * group-by; at 100 TB the only shuffle is on the (low-cardinality) grouped
  * key.
  */
object UrlOps {

  /** P1: url → registered host, counted (reference wimbd/url_counts/map_count.py:17-19). */
  def hostCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(parse_url(col(urlCol), lit("HOST")).as("host"))
      .where(col("host").isNotNull && col("host") =!= "")
      .groupBy("host").agg(count(lit(1)).as("cnt"))

  /** P2: host weighted by per-doc token count (reference wimbd/url_per_tok_counts/map_count.py:18-22). */
  def hostTokenCounts(df: DataFrame, urlCol: String, textCol: String, uax29: Boolean = true): DataFrame =
    df.select(parse_url(col(urlCol), lit("HOST")).as("host"),
        size(NgramOps.tokens(col(textCol), uax29)).cast("long").as("toks"))
      .where(col("host").isNotNull && col("host") =!= "")
      .groupBy("host").agg(sum("toks").as("tokens"))

  /** P3: url → scheme (reference wimbd/scheme_counts/map_count.py:17-19;
    * parse_url has no PROTOCOL key, so a RFC-3986 scheme regex).
    */
  def schemeCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(regexp_extract(col(urlCol), "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1).as("scheme"))
      .where(col("scheme") =!= "")
      .groupBy("scheme").agg(count(lit(1)).as("cnt"))

  /** P5: url → file extension bucketed to {jpg, jpeg, png, other}
    * (reference wimbd/extension_counts/map_count.py:18-23).
    */
  def extensionCounts(df: DataFrame, urlCol: String,
                      keep: Seq[String] = Seq("jpg", "jpeg", "png")): DataFrame = {
    val ext = lower(regexp_extract(parse_url(col(urlCol), lit("PATH")), "\\.([^./]+)$", 1))
    df.select(when(ext.isin(keep: _*), ext).otherwise(lit("other")).as("extension"))
      .groupBy("extension").agg(count(lit(1)).as("cnt"))
  }

  /** Longest public-suffix match of a host against a suffix list. The when
    * chain stays in codegen for small lists; for the full PSL (~9k rules)
    * use [[suffixCountsJoin]].
    */
  def suffixOf(host: Column, psl: Seq[String]): Column = {
    val ordered = psl.sortBy(-_.count(_ == '.')) // longest (most-label) rules first
    ordered.foldLeft(lit(null).cast("string")) { (acc, s) =>
      coalesce(acc, when(host === s || host.endsWith("." + s), lit(s)))
    }
  }

  /** P4: high-level domain suffix counts, composing over a `{host, cnt}`
    * table the way the reference composes over url_counts output
    * (reference wimbd/high_level_domain_counts/map_count.py:17-21).
    */
  def suffixCounts(hostCounts: DataFrame, psl: Seq[String]): DataFrame =
    hostCounts.select(suffixOf(col("host"), psl).as("suffix"), col("cnt"))
      .where(col("suffix").isNotNull)
      .groupBy("suffix").agg(sum("cnt").as("cnt"))

  /** P4 at full-PSL scale: broadcast the rule table and join on every
    * dot-suffix of the host (a host has ≤ ~6 labels, so the explode is
    * bounded), keeping the longest matching rule.
    */
  def suffixCountsJoin(hostCounts: DataFrame, psl: DataFrame): DataFrame = {
    val suffixes = hostCounts
      .withColumn("parts", split(col("host"), "\\."))
      .withColumn("i", explode(sequence(lit(1), size(col("parts")))))
      .select(col("host"), col("cnt"),
        concat_ws(".", slice(col("parts"), col("i"), size(col("parts")))).as("cand"),
        size(col("parts")).minus(col("i")).as("depth"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy(desc("labels"))
    suffixes.join(broadcast(psl.withColumn("labels", size(split(col("rule"), "\\.")))),
        col("cand") === col("rule"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("rule").as("suffix")).agg(sum("cnt").as("cnt"))
      .select(col("suffix"), col("cnt"))
  }
}
