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

  test("templates sharing a benchmark frame render in ONE pass over it") {
    val corpus = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("bench evals")
    val bench = spark.sparkContext
      .parallelize(Seq(("alpha beta", "gamma"), ("beta gamma", "alpha")), 2)
      .map { x => acc.add(1); x }.toDF("q", "a")
    val tpls = PromptTemplates.parseTsv(Seq(
      "t1\t\t{{q}} {{a}}", "t2\t\t{{a}} {{q}}", "t3\t\tzzz {{q}}"))
    val out = PromptTemplates.contaminationFromTemplates(corpus, "text",
        tpls.map(t => t -> bench), uax29 = false)
      .orderBy("benchmark").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // t1 row1 and t2 row2 both render the corpus span "alpha beta gamma"
    assert(out === Seq(("t1", 2L, 1L), ("t2", 2L, 1L), ("t3", 2L, 0L)))
    // one render projection per FRAME: each of the 2 source rows evaluated
    // once, not once per template (the per-template shape would read 6)
    assert(acc.value === 2L)
  }

  test("interleaved distinct frames: grouped rendering matches per-template results") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val benchA = Seq(("alpha beta", "gamma")).toDF("q", "a")
    val benchB = Seq(("quick brown", "fox")).toDF("q", "a")
    val t1 = PromptTemplate("a1", "", "{{q}} {{a}}")
    val t2 = PromptTemplate("b1", "", "{{q}} {{a}}")
    val t3 = PromptTemplate("a2", "", "zzz {{q}}")
    // frames interleave (A, B, A) — grouping reorders the gathered phrase
    // list; the per-benchmark aggregate must not notice
    val got = PromptTemplates.contaminationFromTemplates(corpus, "text",
        Seq(t1 -> benchA, t2 -> benchB, t3 -> benchA), uax29 = false)
      .orderBy("benchmark").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a1", 1L, 1L), ("a2", 1L, 0L), ("b1", 1L, 1L)))
  }

  test("rendered-prompt budget: an over-sized benchmark frame fails loudly") {
    val corpus = Seq((1L, "alpha")).toDF("doc_id", "text")
    val bench = (1 to 10).map(i => (s"q$i", s"a$i")).toDF("q", "a")
    val tpls = PromptTemplates.parseTsv(Seq("t1\t\t{{q}}", "t2\t\t{{a}}"))
    val e = intercept[IllegalArgumentException] {
      PromptTemplates.contaminationFromTemplates(corpus, "text",
        tpls.map(t => t -> bench), uax29 = false, maxPrompts = 10)
    }
    assert(e.getMessage.contains("benchmark-sized"))
  }
}
