package graft

import org.apache.spark.sql.functions._

import graft.search.PromptTemplates
import graft.search.PromptTemplates.PromptTemplate

class PromptTemplatesSpec extends SparkTestBase {
  import spark.implicits._

  test("field extraction: optional spaces, order of appearance, dedup") {
    assert(PromptTemplates.extractFields("q: {{question}} a: {{ answer }}") ===
      Seq("question", "answer"))
    assert(PromptTemplates.extractFields("{{x}} then {{ x }} then {{y-z_1}}") ===
      Seq("x", "y-z_1"))
    assert(PromptTemplates.extractFields("no placeholders") === Seq.empty)
  }

  test("TSV parsing: 3-column, 2-column, blank lines, malformed") {
    val tpls = PromptTemplates.parseTsv(Seq(
      "anli\tr1\t{{premise}} implies {{hypothesis}}?",
      "",
      "piqa\t\t{{goal}}",
      "squad\t{{context}} {{question}}"))
    assert(tpls.map(_.name) === Seq("anli/r1", "piqa", "squad"))
    assert(tpls.head.fields === Seq("premise", "hypothesis"))
    intercept[IllegalArgumentException] {
      PromptTemplates.parseTsv(Seq("only-one-column"))
    }
  }

  test("rendering is column algebra: literals, field order, null => empty") {
    val bench = Seq(("what is spark", Some("an engine")), ("why scale", None))
      .toDF("question", "answer")
    val t = PromptTemplate("d", "", "q: {{ question }} a: {{ answer }}")
    val got = PromptTemplates.renderPrompts(bench, t)
      .select("prompt").as[String].collect().toSeq
    assert(got === Seq("q: what is spark a: an engine", "q: why scale a: "))
  }

  test("template contamination: rendered spans found, prefixed spans clean") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "the quick brown fox jumps"),
      (3L, "unrelated words entirely here")).toDF("doc_id", "text")
    val bench = Seq(("alpha beta", "gamma"), ("quick brown", "fox"))
      .toDF("q", "a")
    val tpls = PromptTemplates.parseTsv(Seq(
      "hit\t\t{{q}} {{a}}",
      "miss\t\tzzz {{q}}"))
    val rows = PromptTemplates.contaminationFromTemplates(corpus, "text",
        tpls.map(t => t -> bench), uax29 = false)
      .orderBy("benchmark").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("hit", 2L, 2L), ("miss", 2L, 0L)))
  }
}
