package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.RegexMatchOffsets

/** `wimbd search --with-locations` (reference src/cmd/search.rs:74-330):
  * per-pattern regex match counts plus per-document match-location records
  * with submatch offsets.
  */
object SearchOps {

  /** Column of [start_col, end_col) offsets for every match of `pattern`
    * in `text`. Char (UTF-16) offsets, not the reference's byte offsets —
    * identical on ASCII text.
    */
  def matchOffsets(text: org.apache.spark.sql.Column,
                   pattern: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Bridge.column(RegexMatchOffsets(Bridge.expression(text), Bridge.expression(pattern)))

  /** One row per (pattern, matching doc): doc pointer (`line_num`, from
    * `idCol`), the text, and the submatch offset structs — the reference's
    * MatchLocation record (src/cmd/search.rs:188-216). `locationsLimit`
    * caps collected matches per pattern as the reference's
    * `--locations-limit` does, but deterministically: docs are taken in
    * `idCol` order until the cap is reached (the reference keeps the first
    * N encountered under thread interleaving).
    */
  def regexLocations(docs: DataFrame, textCol: String, idCol: String,
                     patterns: Seq[String],
                     locationsLimit: Option[Int] = None): DataFrame = {
    // one corpus pass: each doc emits one (pattern, submatches) struct per
    // pattern, exploded — not one scan per pattern
    val perPattern = docs.select(col(idCol).as("line_num"), col(textCol).as("text"),
        explode(array(patterns.map { p =>
          struct(lit(p).as("pattern"), matchOffsets(col(textCol), lit(p)).as("submatches"))
        }: _*)).as("pm"))
      .select(col("pm.pattern").as("pattern"), col("line_num"), col("text"),
        col("pm.submatches").as("submatches"))
      .where(size(col("submatches")) > 0)
    locationsLimit match {
      case None => perPattern
      case Some(lim) =>
        val w = Window.partitionBy("pattern").orderBy("line_num")
          .rowsBetween(Window.unboundedPreceding, -1)
        perPattern
          .withColumn("prior",
            coalesce(F.sum(size(col("submatches"))).over(w), lit(0)))
          .where(col("prior") < lim).drop("prior")
    }
  }

  /** Flattened per-doc view with the span totals (n_matches, matched
    * chars) — the oracle-checkable projection of [[regexLocations]].
    */
  def locationSummary(docs: DataFrame, textCol: String, idCol: String,
                      patterns: Seq[String]): DataFrame =
    regexLocations(docs, textCol, idCol, patterns)
      .select(col("pattern"), col("line_num"),
        size(col("submatches")).cast("long").as("n_matches"),
        aggregate(transform(col("submatches"),
          s => s.getField("end_col") - s.getField("start_col")),
          lit(0), (acc, x) => acc + x).cast("long").as("matched_chars"))

  /** Concordance / KWIC: one row per occurrence of a LITERAL phrase with
    * up to `ctx` characters of context on each side — the "show me the
    * hits in context" reading surface next to E2's whole-document
    * retrieval (corpus browsing reports print exactly this table).
    *
    * Defined over the phrase-split pieces of the document (occurrence i
    * sits between piece i and i+1), so occurrences are non-overlapping
    * and context never crosses an adjacent occurrence — a definition both
    * engines can evaluate identically, which is what makes it
    * oracle-checkable. Pure scan projection + explode: no shuffle, no
    * join; at 100 TB it is scan-speed like every other per-row surface.
    */
  def concordance(docs: DataFrame, idCol: String, textCol: String,
                  phrase: String, ctx: Int = 30): DataFrame = {
    require(phrase.nonEmpty, "concordance needs a non-empty phrase")
    require(ctx >= 0, "context width must be >= 0")
    val pieces = split(col(textCol), java.util.regex.Pattern.quote(phrase))
    def lastChars(s: org.apache.spark.sql.Column) =
      s.substr(greatest(length(s) - ctx + 1, lit(1)), lit(ctx))
    def firstChars(s: org.apache.spark.sql.Column) = s.substr(lit(1), lit(ctx))
    val occs = transform(sequence(lit(1), size(pieces) - 1), i =>
      struct(i.cast("long").as("occ"),
        lastChars(element_at(pieces, i)).as("left_ctx"),
        firstChars(element_at(pieces, i + 1)).as("right_ctx")))
    docs.where(col(textCol).contains(phrase))
      .select(col(idCol), explode(occs).as("o"))
      .select(col(idCol), col("o.occ").as("occ"), col("o.left_ctx").as("left_ctx"),
        col("o.right_ctx").as("right_ctx"))
  }
}
