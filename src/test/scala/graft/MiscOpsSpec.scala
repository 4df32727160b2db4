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
}
