package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LinkProbe}

class MiscOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("J6: url-keyed overlap lattice (overlapSets on the url column)") {
    val df = Seq(
      ("A", "https://x.com/1"), ("A", "https://x.com/2"),
      ("B", "https://x.com/1"), ("B", "https://y.com/9"),
      ("C", "https://x.com/1"), ("C", "https://x.com/2")
    ).toDF("dataset", "url")
    val out = Dedup.overlapSets(df, col("url"), col("dataset"))
      .collect().map(r => r.getSeq[String](0).mkString(",") -> r.getLong(1)).toMap
    assert(out("A,B,C") === 1L) // x.com/1 in all three
    assert(out("A,C") === 1L)   // x.com/2 in A and C
    assert(out("B") === 1L)     // y.com/9 only in B
    // hashed-key production mode: identical lattice, 16-byte shuffle keys
    val hashed = Dedup.overlapSets(df, col("url"), col("dataset"), hashKeys = true)
      .collect().map(r => r.getSeq[String](0).mkString(",") -> r.getLong(1)).toMap
    assert(hashed === out)
    val pairs = Dedup.overlapMatrix(df, col("url"), col("dataset"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pairsHashed = Dedup.overlapMatrix(df, col("url"), col("dataset"), hashKeys = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairsHashed === pairs)
  }

  test("J9: corpus-pair Jaccard and containment from the membership masks") {
    val df = Seq(
      ("A", "k1"), ("A", "k2"), ("A", "k3"),
      ("B", "k1"), ("B", "k4"),
      ("C", "k9")
    ).toDF("dataset", "key")
    val rows = Dedup.corpusSimilarity(df, col("key"), col("dataset"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    // only overlapping pairs appear (C shares nothing)
    assert(rows.keySet === Set(("A", "B")))
    val (shared, na, nb, jac, ca, cb) = rows(("A", "B"))
    assert((shared, na, nb) === ((1L, 3L, 2L)))
    assert(math.abs(jac - 0.25) < 1e-9)        // 1 / (3 + 2 - 1)
    assert(math.abs(ca - 1.0 / 3) < 1e-9)
    assert(math.abs(cb - 0.5) < 1e-9)
    // hashed-key production mode is result-identical
    val hashed = Dedup.corpusSimilarity(df, col("key"), col("dataset"),
        hashKeys = true)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(hashed === rows)
  }

  test("P15: link probe runs per-partition with a pluggable prober") {
    val df = Seq("https://ok.example.com/a", "not a url", "http://fine.io").toDF("url")
    val out = LinkProbe.probe(df, "url").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("https://ok.example.com/a"))
    assert(!out("not a url"))
    assert(out("http://fine.io"))
    // custom prober injection
    val all = LinkProbe.probe(df, "url", () => _ => true).collect()
    assert(all.forall(_.getBoolean(1)))
  }

  test("A10 locations: match offsets are [start,end) char spans per doc") {
    val df = Seq((1L, "spark sparse xx"), (2L, "no hits here"), (3L, "spot"))
      .toDF("doc_id", "text")
    val out = graft.operators.SearchOps
      .regexLocations(df, "text", "doc_id", Seq("sp[a-z]+"))
      .orderBy("line_num").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 3L))
    val subs = out.head.getSeq[org.apache.spark.sql.Row](3)
    assert(subs.map(r => (r.getInt(0), r.getInt(1))) === Seq((0, 5), (6, 12)))
    assert(out(1).getSeq[org.apache.spark.sql.Row](3)
      .map(r => (r.getInt(0), r.getInt(1))) === Seq((0, 4)))
  }

  test("A10 locations: locationsLimit caps matches per pattern in doc order") {
    val df = Seq((1L, "aa aa"), (2L, "aa"), (3L, "aa aa aa")).toDF("doc_id", "text")
    val out = graft.operators.SearchOps
      .regexLocations(df, "text", "doc_id", Seq("aa"), locationsLimit = Some(3))
      .orderBy("line_num").collect()
    // doc 1 contributes 2 matches (prior=0 < 3), doc 2 one more (prior=2 < 3),
    // doc 3 is cut (prior=3)
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("mixture plan derives min(1, target/available); sample is deterministic") {
    import graft.operators.Analyses
    // srcA: 4 docs × 2 tokens = 8 available; srcB: 1 doc × 4 tokens
    val df = (1L to 4L).map(i => (i, "a b", "srcA")).toSeq
      .++(Seq((9L, "w x y z", "srcB")))
      .toDF("doc_id", "text", "source")
    val plan = Analyses.mixturePlan(df, col("source"), "text",
        Map("srcA" -> 0.5, "srcB" -> 0.5), tokenBudget = 8L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(plan("srcA") === ((4L, 8L, 4L, 0.5)))
    assert(plan("srcB") === ((1L, 4L, 4L, 1.0))) // capped at the whole source
    val s1 = Analyses.mixtureSample(df, col("doc_id"), col("source"), "text",
      Map("srcA" -> 0.5, "srcB" -> 0.5), 8L).collect().map(_.getLong(0)).toSet
    val s2 = Analyses.mixtureSample(df, col("doc_id"), col("source"), "text",
      Map("srcA" -> 0.5, "srcB" -> 0.5), 8L).collect().map(_.getLong(0)).toSet
    assert(s1 === s2)          // rerun-reproducible
    assert(s1.contains(9L))    // fraction-1.0 source is taken whole
  }

  test("mixtureUpsample: targets above availability repeat the source deterministically") {
    import graft.operators.Analyses
    // srcA: 8 tokens available; srcB: 4 — target srcA at 2.5 epochs
    val df = (1L to 4L).map(i => (i, "a b", "srcA")).toSeq
      .++(Seq((9L, "w x y z", "srcB")))
      .toDF("doc_id", "text", "source")
    val up = Analyses.mixtureUpsample(df, col("doc_id"), col("source"), "text",
      Map("srcA" -> 1.0, "srcB" -> 0.0), tokenBudget = 20L)
    val rows = up.collect().map(r => (r.getLong(0), r.getLong(3)))
    // f = 20/8 = 2.5: every srcA doc appears at epochs 0 and 1...
    (1L to 4L).foreach { id =>
      assert(rows.count(_ == (id, 0L)) === 1); assert(rows.count(_ == (id, 1L)) === 1)
    }
    // ...plus a strict hash-subset at the remainder epoch 2, and nothing past it
    val rem = rows.filter(_._2 === 2L).map(_._1).toSet
    assert(rem.subsetOf(Set(1L, 2L, 3L, 4L)) && rows.forall(_._2 <= 2L))
    // weight-0 source dropped entirely
    assert(rows.forall(_._1 !== 9L))
    // rerun-reproducible (no rand())
    val again = Analyses.mixtureUpsample(df, col("doc_id"), col("source"), "text",
      Map("srcA" -> 1.0, "srcB" -> 0.0), 20L).collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(again.sorted.toSeq === rows.sorted.toSeq)
    // integer f: exactly f epochs, remainder epoch empty
    val exact = Analyses.mixtureUpsample(df, col("doc_id"), col("source"), "text",
      Map("srcA" -> 1.0), tokenBudget = 16L).collect().map(_.getLong(3))
    assert(exact.count(_ == 0L) === 4 && exact.count(_ == 1L) === 4 && exact.forall(_ <= 1L))
    // remainder-epoch membership matches the hashStratifiedSample rule at frac(f)
    val half = Analyses.hashStratifiedSample(df.where(col("source") === "srcA"),
      col("doc_id"), col("source"), Map("srcA" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(rem === half) // frac(2.5) = 0.5 — same md5-bucket cut
  }

  test("Pipeline facade composes gate -> dedup -> decontaminate") {
    val long = (1 to 60).map(i => s"the tok$i").mkString(" ")
    val docs = Seq(
      (1L, long), (2L, long),                 // exact duplicates, pass the gate
      (3L, "too short")                       // fails the gate
    ).toDF("doc_id", "text")
    val gated = graft.Pipeline.gopherGate(docs, "doc_id", "text")
    assert(gated.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    val deduped = graft.Pipeline.dedupExact(gated, "text", Seq(col("doc_id")))
    assert(deduped.collect().map(_.getLong(0)).toSet === Set(1L))
    val bench = Seq(Tuple1(long)).toDF("text")
    assert(graft.Pipeline.decontaminate(deduped, bench).count() === 0L)
  }

  test("Pipeline curation rungs: boilerplate surgery, exemplars, cluster sample on text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Accept cookies now! Alpha bravo charlie delta."),
      (2L, "Accept cookies now! Echo foxtrot golf hotel."),
      (3L, "India juliett kilo lima mike november oscar papa.")
    ).toDF("doc_id", "text")
    val clean = graft.Pipeline.removeBoilerplateSentences(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(clean(0) === "Alpha bravo charlie delta.")
    assert(clean(2).startsWith("India"))
    val ex = graft.Pipeline.diverseExemplarsText(docs, "doc_id", "text", k = 2)
      .collect()
    // WHICH docs: seed = min id 1; doc 3 shares no tokens with it (cos 0)
    // while doc 2 shares the banner tokens — 3 must be the second pick
    assert(ex.map(_.getLong(0)).toSet === Set(1L, 3L))
    val cs = graft.Pipeline.curationSample(docs, "doc_id", "text",
      step = 2, perCluster = 1)
    assert(cs.count() >= 1)
  }
}
