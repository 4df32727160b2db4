package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.ProfanityModel

/** The P8 model path: LR over taxonomy-weak-labeled hit densities, doc
  * and sentence granularity. The headline assertion is the one the doc
  * granularity cannot satisfy: a long document whose ONLY hit is inside a
  * single sentence scores clean per-doc but flagged per-sentence.
  */
class ProfanityModelSpec extends SparkTestBase {

  private val lists = Map("bad" -> Seq("darn", "heck"))

  private def corpus = {
    import spark.implicits._
    val clean = (0 until 20).map(i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog. " +
        s"every morning the children walk to the market for fresh bread. " +
        s"the weather is cold but the sun shines over the mountains."))
    val dirty = (20 until 40).map(i =>
      (i.toLong, s"darn heck darn heck number $i darn. heck darn heck darn heck."))
    (clean ++ dirty).toDF("doc_id", "text")
  }

  test("fit separates clean from saturated docs; scoring is column algebra") {
    val m = ProfanityModel.fitOnTaxonomy(corpus, "doc_id", "text", lists)
    val scored = ProfanityModel.scoreDocs(corpus, "doc_id", "text", lists, m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cleanMax = (0 until 20).map(i => scored(i.toLong)).max
    val dirtyMin = (20 until 40).map(i => scored(i.toLong)).min
    assert(cleanMax < 0.5 && dirtyMin > 0.5,
      s"cleanMax=$cleanMax dirtyMin=$dirtyMin")
  }

  test("sentence mode flags a doc whose only hit is sentence-local") {
    import spark.implicits._
    val m = ProfanityModel.fitOnTaxonomy(corpus, "doc_id", "text", lists)
    // 1 profane sentence buried in 9 clean ones: doc-level density dilutes
    val mixed = Seq((100L,
      (Seq.fill(9)("the calm garden holds many green trees near the quiet river.") :+
        "darn heck darn heck darn.").mkString(" "))).toDF("doc_id", "text")
    val doc = ProfanityModel.scoreDocs(mixed, "doc_id", "text", lists, m)
      .collect().head.getDouble(1)
    val sent = ProfanityModel.scoreSentences(mixed, "doc_id", "text", lists, m)
      .collect().head
    val maxSentence = sent.getDouble(1)
    assert(sent.getLong(2) === 10L, s"expected 10 sentences, got ${sent.getLong(2)}")
    assert(doc < 0.5, s"doc-granularity score should stay clean, got $doc")
    assert(maxSentence > 0.5,
      s"sentence-granularity max should flag the buried sentence, got $maxSentence")
  }

  test("sentenceSplit: terminator runs, closing quotes, decimals, blanks") {
    import spark.implicits._
    val got = Seq("one two. three four!? five \"six.\" seven 2.0 eight. ")
      .toDF("t").select(TextFunctions.sentenceSplit(col("t")).as("s"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("one two.", "three four!?", "five \"six.\"",
      "seven 2.0 eight."))
    val noBoundary = Seq("no terminator here at all").toDF("t")
      .select(TextFunctions.sentenceSplit(col("t")).as("s"))
      .collect().head.getSeq[String](0)
    assert(noBoundary === Seq("no terminator here at all"))
  }
}
