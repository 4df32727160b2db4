package graft

import java.nio.file.{Files, Paths}

/** CLI `contaminate`: the measurement half of `decontaminate` — the
  * reference's contamination runner scripts as one subcommand, driven
  * end-to-end through [[Cli.run]] with JSONL corpora on disk.
  */
class CliContaminateSpec extends SparkTestBase {

  private def writeJsonl(dir: String, name: String, lines: Seq[String]): String = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    s"$dir/$name"
  }

  private def fresh(): String =
    Files.createTempDirectory("cli_contaminate").toString

  private def readOut(path: String): Seq[Map[String, Any]] = {
    // the report's own schema, not the corpus one
    spark.read.json(path).collect().map { r =>
      r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap
    }.toSeq
  }

  test("summary card: phrase presence fraction from a benchmark column") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq(
      """{"text":"alpha beta gamma delta"}""",
      """{"text":"the quick brown fox"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"text":"alpha beta"}""",
      """{"text":"quick brown"}""",
      """{"text":"zz never present"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--out", s"$root/out", "--force"))
    val rows = readOut(s"$root/out")
    assert(rows.length === 1)
    assert(rows.head("n_phrases") === 3L)
    assert(rows.head("n_contaminated") === 2L)
  }

  test("--per-phrase emits the count rows; --fields runs paired examples") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq(
      """{"text":"alpha beta gamma delta"}""",
      """{"text":"alpha only here"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"q":"alpha","a":"gamma","text":"alpha"}""",
      """{"q":"alpha","a":"zz","text":"zz"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--per-phrase", "--out", s"$root/pp", "--force"))
    val pp = readOut(s"$root/pp").map(m => (m("phrase"), m("n_docs"))).toSet
    assert(pp === Set(("alpha", 2L), ("zz", 0L)))
    // paired: a doc must hold BOTH fields — only row 1 (alpha + gamma)
    // is contained in one document together
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--fields", "q,a", "--out", s"$root/paired", "--force"))
    val paired = readOut(s"$root/paired").head
    assert(paired("n_examples") === 2L)
    assert(paired("n_contaminated") === 1L)
  }

  test("--templates renders the TSV against the benchmark rows") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq(
      """{"text":"q alpha a gamma end"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"q":"alpha","a":"gamma","text":"x"}"""))
    val tsv = s"$root/templates.tsv"
    Files.write(Paths.get(tsv),
      "hit\t\tq {{q}} a {{a}}\nmiss\t\tzz {{q}}\n".getBytes("UTF-8"))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--templates", tsv, "--out", s"$root/tpl", "--force"))
    val rows = readOut(s"$root/tpl")
      .map(m => (m("benchmark"), m("n_contaminated"))).toSet
    assert(rows === Set(("hit", 1L), ("miss", 0L)))
  }

  test("empty benchmark: summary reports zeros; missing column fails loudly") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq("""{"text":"alpha"}"""))
    // a benchmark whose rows all lack text values → zero phrases, zero
    // contamination, never nulls
    val bench = writeJsonl(root, "bench.jsonl", Seq("""{"other":"x"}"""))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
        "--out", s"$root/out", "--force"))
    }
    assert(e.getMessage.contains("no 'text' column"), e.getMessage)
    // present column but all-null values → (0, 0, 0.0) card
    val bench2 = writeJsonl(root, "bench2.jsonl", Seq("""{"text":null}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench2,
      "--out", s"$root/out2", "--force"))
    val row = readOut(s"$root/out2").head
    assert(row("n_phrases") === 0L && row("n_contaminated") === 0L)
  }

  test("missing --bench fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("contaminate", "/nonexistent/*.jsonl"))
    }
    assert(e.getMessage.contains("--bench"))
  }
}
