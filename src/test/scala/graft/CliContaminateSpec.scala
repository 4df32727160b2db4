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

  test("--follow: durable totals accumulate, replay converges, drifting bench refuses") {
    val root = fresh()
    val state = s"$root/state"
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"text":"alpha beta"}""",
      """{"text":"zz never"}"""))
    writeJsonl(s"$root/drop/day1", "a.jsonl", Seq(
      """{"text":"alpha beta gamma"}""",
      """{"text":"unrelated words here"}"""))
    def run(extra: String*): Unit =
      Cli.run(spark, Array("contaminate", s"$root/drop/*", "--bench", bench,
        "--follow", state, "--per-phrase",
        "--out", s"$root/out", "--force") ++ extra)
    def totals(): Map[String, Long] = readOut(s"$root/out")
      .map(m => (m("phrase").toString, m("n_docs").asInstanceOf[Long])).toMap
    run()
    assert(totals() === Map("alpha beta" -> 1L, "zz never" -> 0L))
    // no new shards: report only, totals unchanged (idempotent)
    run()
    assert(totals() === Map("alpha beta" -> 1L, "zz never" -> 0L))
    // a second drop accumulates into the durable counts
    writeJsonl(s"$root/drop/day2", "b.jsonl", Seq(
      """{"text":"alpha beta again"}""",
      """{"text":"zz never shows"}"""))
    run()
    assert(totals() === Map("alpha beta" -> 2L, "zz never" -> 1L))
    // crash replay: manifest lost AFTER the batch dirs landed — the
    // batch ids recompute identically, dirs overwrite, totals converge
    Files.delete(Paths.get(state, "manifest"))
    run()
    assert(totals() === Map("alpha beta" -> 2L, "zz never" -> 1L))
    // a drifting benchmark must refuse loudly (totals would silently
    // stop being comparable across invocations)
    val bench2 = writeJsonl(root, "bench2.jsonl", Seq(
      """{"text":"different battery"}"""))
    val e = intercept[RuntimeException] {
      Cli.run(spark, Array("contaminate", s"$root/drop/*", "--bench", bench2,
        "--follow", state, "--per-phrase", "--out", s"$root/out2", "--force"))
    }
    assert(e.getMessage.contains("benchKey"))
    // and a pinned-dial mismatch too
    val e2 = intercept[RuntimeException] { run("--slop", "3") }
    assert(e2.getMessage.contains("slop"))
  }

  test("--follow: orphan batch (counts without _shards) is swept, never double-counted") {
    // the r15-advice crash window: dies between the counts parquet commit
    // and the _shards record, and NEW shards arrive before the replay.
    // The recomputed fresh set then gets a DIFFERENT batch id, so without
    // the sweep the orphan dir stays in the totals read while its shards
    // are recounted under the new id — double-counting.
    val root = fresh()
    val state = s"$root/state"
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"text":"alpha beta"}""",
      """{"text":"zz never"}"""))
    def run(): Unit =
      Cli.run(spark, Array("contaminate", s"$root/drop/*", "--bench", bench,
        "--follow", state, "--per-phrase",
        "--out", s"$root/out", "--force"))
    def totals(): Map[String, Long] = readOut(s"$root/out")
      .map(m => (m("phrase").toString, m("n_docs").asInstanceOf[Long])).toMap
    writeJsonl(s"$root/drop/day1", "a.jsonl",
      Seq("""{"text":"alpha beta gamma"}"""))
    run()
    writeJsonl(s"$root/drop/day2", "b.jsonl", Seq(
      """{"text":"alpha beta again"}""",
      """{"text":"zz never shows"}"""))
    run()
    assert(totals() === Map("alpha beta" -> 2L, "zz never" -> 1L))
    // simulate the crash: find day2's batch, delete its _shards record
    // AND drop its shards from the manifest (neither write happened)
    val countsDir = Paths.get(state, "counts")
    val day2Batch = Files.list(countsDir).toArray.map(_.toString)
      .filter(_.contains("batch="))
      .find(d => Files.exists(Paths.get(d, "_shards")) &&
        new String(Files.readAllBytes(Paths.get(d, "_shards")), "UTF-8")
          .contains("day2"))
      .getOrElse(fail("no batch dir holds day2"))
    Files.delete(Paths.get(day2Batch, "_shards"))
    val manifest = Paths.get(state, "manifest")
    val kept = new String(Files.readAllBytes(manifest), "UTF-8")
      .split("\n").filterNot(_.contains("day2"))
    Files.write(manifest, (kept.mkString("\n") + "\n").getBytes("UTF-8"))
    // the raw-nio rewrite above invalidates Hadoop LocalFileSystem's CRC
    // sidecar — drop it (the simulated crash never wrote the manifest, so
    // no sidecar mismatch exists in the real scenario)
    Files.deleteIfExists(Paths.get(state, ".manifest.crc"))
    // NEW shards arrive before the replay — the regrouped fresh set
    // {day2, day3} mints a different batch id than day2 alone did
    writeJsonl(s"$root/drop/day3", "c.jsonl",
      Seq("""{"text":"alpha beta third"}"""))
    run()
    // exactly-once totals: day1 (1) + day2 (1) + day3 (1) alpha-beta hits,
    // day2's zz hit once — the orphan's counts must NOT survive alongside
    // the recount
    assert(totals() === Map("alpha beta" -> 3L, "zz never" -> 1L))
    // and the orphan dir itself is gone
    assert(!Files.exists(Paths.get(day2Batch)) ||
      Files.exists(Paths.get(day2Batch, "_shards")))
    // replay with no further arrivals stays converged
    run()
    assert(totals() === Map("alpha beta" -> 3L, "zz never" -> 1L))
  }

  test("--follow: a maintenance run omitting a pinned fold flag adopts the pin") {
    // the battery folds under the PINNED analyzed value, so omitting
    // --analyzed on run 2 must NOT shift batteryKey into a bogus
    // "benchmark drift" refusal — the adopt-the-pin contract
    val root = fresh()
    val state = s"$root/state"
    val bench = writeJsonl(root, "bench.jsonl", Seq("""{"text":"Alpha BETA"}"""))
    writeJsonl(s"$root/drop/day1", "a.jsonl", Seq("""{"text":"alpha beta here"}"""))
    Cli.run(spark, Array("contaminate", s"$root/drop/*", "--bench", bench,
      "--follow", state, "--analyzed", "--per-phrase",
      "--out", s"$root/o1", "--force"))
    val t1 = readOut(s"$root/o1")
      .map(m => (m("phrase").toString, m("n_docs").asInstanceOf[Long])).toMap
    assert(t1 === Map("alpha beta" -> 1L)) // analyzer folded the battery
    writeJsonl(s"$root/drop/day2", "b.jsonl", Seq("""{"text":"alpha beta twice"}"""))
    // run 2 omits --analyzed: pin adopted, same folded battery, totals grow
    Cli.run(spark, Array("contaminate", s"$root/drop/*", "--bench", bench,
      "--follow", state, "--per-phrase", "--out", s"$root/o2", "--force"))
    val t2 = readOut(s"$root/o2")
      .map(m => (m("phrase").toString, m("n_docs").asInstanceOf[Long])).toMap
    assert(t2 === Map("alpha beta" -> 2L))
  }

  test("--lucene-slop selects the move-distance dialect on the scan tier") {
    // "beta alpha" is a TRANSPOSITION of the benchmark phrase: lucene
    // slop 2 matches it (move-distance budget), the insertion-budget
    // default never does — the dialect the index tier's --slop already
    // speaks, now selectable on contaminate
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq(
      """{"text":"beta alpha gamma"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"text":"alpha beta"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--slop", "2", "--out", s"$root/ins", "--force"))
    assert(readOut(s"$root/ins").head("n_contaminated") === 0L)
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--slop", "2", "--lucene-slop", "--out", s"$root/luc", "--force"))
    assert(readOut(s"$root/luc").head("n_contaminated") === 1L)
    // paired mode takes the dialect too
    val bench2 = writeJsonl(root, "bench2.jsonl", Seq(
      """{"q":"alpha beta","a":"gamma"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench2,
      "--fields", "q,a", "--slop", "2", "--lucene-slop",
      "--out", s"$root/lucp", "--force"))
    assert(readOut(s"$root/lucp").head("n_contaminated") === 1L)
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

  test("--analyzed folds benchmark fields like the corpus side") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq(
      """{"text":"Hello, World! end"}"""))
    // raw field value differs in case and punctuation — only the analyzer
    // fold on BOTH sides makes it match
    val bench = writeJsonl(root, "bench.jsonl", Seq("""{"q":"hello WORLD"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--field", "q", "--analyzed", "--out", s"$root/out", "--force"))
    val row = readOut(s"$root/out").head
    assert(row("n_contaminated") === 1L, row)
  }

  test("paired rows with a null/empty field are excluded; all-excluded zero card") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq("""{"text":"alpha beta"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"q":"alpha","a":null}""", """{"q":"","a":"beta"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--fields", "q,a", "--out", s"$root/out", "--force"))
    val row = readOut(s"$root/out").head
    // both rows excluded (null a; empty q) → the zero card, one row, no
    // degraded single-field probes
    assert(row("n_examples") === 0L && row("n_contaminated") === 0L)
  }

  test("analyzer-stripped and mojibake benchmark fields fold like the corpus") {
    val root = fresh()
    // a punctuation-only field ANALYZES to "" — the match-everything
    // empty phrase under uax29 — so exclusion must run AFTER the fold
    val corpus = writeJsonl(root, "corpus.jsonl", Seq("""{"text":"alpha beta"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"q":"???"}""", """{"q":"alpha"}"""))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
      "--field", "q", "--analyzed", "--out", s"$root/o1", "--force"))
    val r1 = readOut(s"$root/o1").head
    assert(r1("n_phrases") === 1L && r1("n_contaminated") === 1L, r1)
    // --fix-mojibake folds gathered fields too: the bench carries the
    // same mangled bytes as the corpus; both repair to "café"
    val corpus2 = writeJsonl(root, "corpus2.jsonl",
      Seq("""{"text":"cafÃ© one"}"""))
    val bench2 = writeJsonl(root, "bench2.jsonl",
      Seq("""{"q":"cafÃ©"}"""))
    Cli.run(spark, Array("contaminate", corpus2, "--bench", bench2,
      "--field", "q", "--fix-mojibake", "--out", s"$root/o2", "--force"))
    val r2 = readOut(s"$root/o2").head
    assert(r2("n_contaminated") === 1L, r2)
  }

  test("templates: missing field fails loudly, blank renders are dropped") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq("""{"text":"alpha beta"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq(
      """{"q":"alpha beta"}""", """{"q":null}"""))
    val tsvBad = s"$root/bad.tsv"
    java.nio.file.Files.write(java.nio.file.Paths.get(tsvBad),
      "d\t\t{{nosuch}}\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
        "--templates", tsvBad))
    }
    assert(e.getMessage.contains("no 'nosuch' column"), e.getMessage)
    // a bare {{q}} over the null-q row renders "" — dropped, so the card
    // counts ONE prompt (contaminated), not a match-everything blank; a
    // template whose EVERY render drops surfaces as an explicit zero
    // card rather than vanishing from the audit
    val bench2 = writeJsonl(root, "bench2.jsonl", Seq(
      """{"q":"alpha beta","r":null}""", """{"q":null,"r":null}"""))
    val tsv = s"$root/t.tsv"
    java.nio.file.Files.write(java.nio.file.Paths.get(tsv),
      "d\t\t{{q}}\ne\t\t{{r}}\n".getBytes("UTF-8"))
    Cli.run(spark, Array("contaminate", corpus, "--bench", bench2,
      "--templates", tsv, "--out", s"$root/o3", "--force"))
    val rows = readOut(s"$root/o3")
      .map(m => m("benchmark") -> (m("n_phrases"), m("n_contaminated"))).toMap
    assert(rows("d") === ((1L, 1L)), rows)
    assert(rows("e") === ((0L, 0L)), rows)
  }

  test("conflicting modes and the slop phrase cap fail loudly") {
    val root = fresh()
    val corpus = writeJsonl(root, "corpus.jsonl", Seq("""{"text":"alpha"}"""))
    val bench = writeJsonl(root, "bench.jsonl", Seq("""{"text":"alpha"}"""))
    val tsv = s"$root/t.tsv"
    java.nio.file.Files.write(java.nio.file.Paths.get(tsv),
      "d\t\t{{text}}\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("contaminate", corpus, "--bench", bench,
        "--templates", tsv, "--per-phrase"))
    }
    assert(e1.getMessage.contains("does not compose"))
    // --slop at battery scale rides the kernel (no per-column plan, no
    // cap): 520 phrases, one of them a slop-1 hit
    val big = writeJsonl(root, "big.jsonl",
      (1 to 519).map(i => s"""{"text":"w$i phrase"}""") :+
        """{"text":"alpha gamma"}""")
    val corpus2 = writeJsonl(root, "corpus2.jsonl",
      Seq("""{"text":"alpha beta gamma"}"""))
    Cli.run(spark, Array("contaminate", corpus2, "--bench", big,
      "--slop", "1", "--out", s"$root/o2", "--force"))
    val row = readOut(s"$root/o2").head
    assert(row("n_phrases") === 520L && row("n_contaminated") === 1L, row)
  }
}
