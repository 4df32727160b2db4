package graft.tools
import graft.functions.expressions.CtKernel
import graft.operators.LangId
object KernelBench {
  def main(args: Array[String]): Unit = {
    val profiles = LangId.ctProfiles()
    val idx = new CtKernel.RankIndex(profiles, CtKernel.DefaultTopK)
    val ranks = profiles.sortBy(_._1).map { case (l, gs) => (l, CtKernel.rankMap(gs)) }.toArray
    val rng = new scala.util.Random(7)
    val words = "the quick brown fox jumps over lazy dog und der die das les un une chat perro gato".split(" ")
    val docs = (1 to 5000).map(_ => (1 to 50).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    for (r <- 1 to 3) {
      var t0 = System.nanoTime(); var s = 0
      docs.foreach(d => s += CtKernel.classifyIndexed(d, idx).length)
      println(f"indexed: ${(System.nanoTime()-t0)/1e9}%.3f s  ($s)")
      t0 = System.nanoTime(); s = 0
      docs.foreach(d => s += CtKernel.classify(d, ranks, 300).length)
      println(f"legacy:  ${(System.nanoTime()-t0)/1e9}%.3f s  ($s)")
    }
  }
}
