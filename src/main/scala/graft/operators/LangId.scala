package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{CtKernel, CtLangId}

/** Model-path language identification: Cavnar\u2013Trenkle character-n-gram
  * profiles (the public 1994 algorithm) trained either on embedded seed
  * text \u2014 zero external data dependency, mirroring how the reference
  * ships a pre-trained compiled model (wimbd/language/map_count.py:7-49
  * uses pycld2) \u2014 or distributed on a labeled corpus.
  *
  * The classifier itself is [[graft.functions.expressions.CtLangId]]: the
  * trained profiles ride inside the expression, so corpus scoring is a
  * zero-shuffle codegen'd scan projection (the same inline-model shape as
  * BPE's merge table and the pruned unigram LM). The stopword heuristic
  * ([[Analyses.langIdHeuristic]]) stays as the cheap path.
  */
object LangId {

  /** Embedded training seeds \u2014 original sentences authored for this
    * library, 37 languages across 12 scripts (see [[LangIdSeeds]] for the
    * authoring conventions: lowercase, BMP-only, NFC, unicode-escaped in
    * source and `chr(n)` in the DuckDB oracle so both engines parse
    * identical text).
    */
  val seeds: Seq[(String, String)] = LangIdSeeds.all

  /** Train a profile per language from (lang, text) seed pairs \u2014 pure JVM,
    * runs at plan-construction time (seeds are KBs, not data).
    */
  def ctProfiles(seedTexts: Seq[(String, String)] = seeds,
                 topK: Int = CtKernel.DefaultTopK): Seq[(String, Seq[String])] =
    seedTexts.map { case (lang, text) =>
      lang -> CtKernel.profile(text, topK).toSeq
    }

  /** Distributed profile training on a lang-labeled corpus: char-gram
    * histogram per language (one explode + partial agg), per-language rank
    * window over the aggregated vocab, top-K collected to the driver
    * (K \u00d7 |langs| rows \u2014 bounded by the parameter, not the data).
    */
  def trainProfiles(df: DataFrame, textCol: String, langCol: String,
                    topK: Int = CtKernel.DefaultTopK): Seq[(String, Seq[String])] = {
    import org.apache.spark.sql.expressions.Window
    val g = explode(charGrams(col(textCol))).as("g")
    df.select(col(langCol).as("__lang"), g)
      .groupBy("__lang", "g").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        Window.partitionBy("__lang").orderBy(col("c").desc, col("g").asc)))
      .where(col("r") <= topK)
      .groupBy("__lang").agg(sort_array(collect_list(struct(col("r"), col("g")))).as("gs"))
      .collect()
      .map(row => row.getString(0) ->
        row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)))
      .sortBy(_._1).toSeq
  }

  /** All padded CT char n-grams of a document as array<string> (with
    * duplicates \u2014 counts matter), for distributed training. Built from
    * stock expressions so it mirrors [[CtKernel.grams]] exactly.
    */
  def charGrams(text: Column): Column = {
    val words = filter(split(lower(text), "[^\\p{L}\\p{M}]+"), w => length(w) > 0)
    flatten(transform(words, w => {
      val pw = concat(lit("_"), w, lit("_"))
      // sequence(1, stop) with stop < 1 generates a DESCENDING [1, 0] in
      // Spark — guard short words to an empty gram list instead
      flatten(transform(sequence(lit(1), lit(CtKernel.MaxN)), n =>
        when(length(pw) - n + 1 >= 1,
          transform(sequence(lit(1), length(pw) - n + 1),
            i => substring(pw, i, n)))
        .otherwise(array().cast("array<string>"))))
    }))
  }

  /** Predicted language code for a text column under trained profiles. */
  def langIdModel(text: Column,
                  profiles: Seq[(String, Seq[String])],
                  topK: Int = CtKernel.DefaultTopK): Column =
    Bridge.column(CtLangId(Bridge.expression(text), profiles, topK))

  /** (label, predicted, count) confusion counts over a labeled corpus.
    * The classifier is ~100µs/doc of per-row CPU, so a small single-file
    * scan (one input partition) would serialize it — fan out first
    * (no-op on real multi-split corpora).
    */
  def confusion(df: DataFrame, textCol: String, labelCol: String,
                profiles: Seq[(String, Seq[String])],
                topK: Int = CtKernel.DefaultTopK): DataFrame =
    graft.Par.fanOut(df.select(col(labelCol).as("lang"), col(textCol)))
      .select(col("lang"), langIdModel(col(textCol), profiles, topK).as("pred"))
      .groupBy("lang", "pred").agg(count(lit(1)).as("cnt"))

  /** Predicted-language histogram (the P6 shape, model path). */
  def langIdModelCounts(df: DataFrame, textCol: String,
                        profiles: Seq[(String, Seq[String])],
                        topK: Int = CtKernel.DefaultTopK): DataFrame =
    graft.Par.fanOut(df.select(col(textCol)))
      .select(langIdModel(col(textCol), profiles, topK).as("pred"))
      .groupBy("pred").agg(count(lit(1)).as("cnt"))
}
