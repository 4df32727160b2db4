package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's stall-window detector (pure logic — no Spark session):
  * round-over-round comparison must re-measure exactly the queries whose
  * scored min is both ≥1 s and >2× the previous committed value, and the
  * previous-round parse must survive absent/corrupt artifacts.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("parsePrevQueries extracts the flat queries map from a bench line") {
    val line = """{"metric":"total","value":95.9,"unit":"sec","queries":{"q1_agg":0.213,"t_unigram_lm":3.467,"d_minhash_lsh":0.778},"derived":{"topk3_docs_per_sec":8511.0},"samples":{"q1_agg":[0.3,0.21,0.22]},"sf":"/root/testdata/sf0.1"}"""
    val got = Bench.parsePrevQueries(line)
    assert(got === Map("q1_agg" -> 0.213, "t_unigram_lm" -> 3.467,
      "d_minhash_lsh" -> 0.778))
  }

  test("parsePrevQueries degrades to empty on corrupt or missing input") {
    assert(Bench.parsePrevQueries("") === Map.empty)
    assert(Bench.parsePrevQueries("{\"metric\":\"total\"}") === Map.empty)
    assert(Bench.parsePrevQueries("{\"queries\":{") === Map.empty)
    // non-numeric value rows are skipped, not thrown on
    assert(Bench.parsePrevQueries("""{"queries":{"a":1.5,"b":oops}}""")
      === Map("a" -> 1.5))
  }

  test("needsRemeasure: >=1s AND >2x previous, with missing/zero prev excluded") {
    // the r12 casualty: 3.467 s vs 0.521 s previous — re-measure
    assert(Bench.needsRemeasure(3.467, Some(0.521)))
    // genuine slow query holding trend: no re-measure
    assert(!Bench.needsRemeasure(3.4, Some(3.1)))
    // sub-second spike: median scoring owns it, no re-measure
    assert(!Bench.needsRemeasure(0.9, Some(0.1)))
    // exactly 2x is trend drift, not a stall
    assert(!Bench.needsRemeasure(2.0, Some(1.0)))
    // new query this round (no previous value): nothing to compare
    assert(!Bench.needsRemeasure(5.0, None))
    // zero/garbage previous value must not divide into a re-measure storm
    assert(!Bench.needsRemeasure(5.0, Some(0.0)))
  }
}
