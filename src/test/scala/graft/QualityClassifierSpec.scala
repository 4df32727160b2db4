package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val bank = Seq("quick", "brown", "animal", "number", "jumps",
    "over", "lazy", "river", "walks", "into", "town", "market", "bright",
    "morning", "evening", "people", "stories", "garden", "window", "mountain")

  /** ~60 varied words, stopwords sprinkled, no repeated n-gram runs (the
    * quadratic stride breaks periodicity) — passes the Gopher gate.
    */
  private def goodDoc(i: Int): String =
    (0 until 60).map { k =>
      if (k % 6 == 0) Seq("the", "and", "of", "to", "in", "that")(k / 6 % 6)
      else bank((i + 7 * k + k * k) % bank.size) +
        (if (k % 5 == 2) s"${i + k}" else "")
    }.mkString(" ")

  private def junkDoc(i: Int): String =
    (s"zz$i " * 3 + "x y z " * 2).trim

  test("fit separates curated positives from junk; scoring is column algebra") {
    val docs = ((1 to 40).map(i => (i.toLong, goodDoc(i), 1.0)) ++
      (41 to 80).map(i => (i.toLong, junkDoc(i), 0.0)))
      .toDF("id", "text", "label")
    val labeled = QualityClassifier.features(docs, "id", "text")
      .join(docs.select(col("id"), col("label")), Seq("id"))
    val model = QualityClassifier.fit(labeled, "label")
    assert(model.weights.length === QualityClassifier.FeatureCols.length)
    val scores = QualityClassifier.score(docs, "id", "text", model)
      .select("id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val goodMin = (1 to 40).map(i => scores(i.toLong)).min
    val junkMax = (41 to 80).map(i => scores(i.toLong)).max
    assert(goodMin > junkMax,
      s"separable data must separate: goodMin=$goodMin junkMax=$junkMax")
    // scoring stayed declarative: no UDF, no mllib node in the plan
    val plan = QualityClassifier.score(docs, "id", "text", model)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"))
  }

  test("gopher weak-label bootstrap orders a mixed corpus sensibly") {
    val good = (1 to 60).map(i => (i.toLong, goodDoc(i)))
    val junk = (61 to 90).map(i => (i.toLong, junkDoc(i)))
    val docs = (good ++ junk).toDF("id", "text")
    val model = QualityClassifier.fitOnGopherLabels(docs, "id", "text")
    val scores = QualityClassifier.score(docs, "id", "text", model)
      .select("id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgGood = good.map(g => scores(g._1)).sum / good.size
    val avgJunk = junk.map(j => scores(j._1)).sum / junk.size
    assert(avgGood > avgJunk)
  }
}
