package graft.queries

/** Wall-clock stage attribution for the composed lifecycle queries
  * (streaming decontamination, stream+compact, diff-driven refresh):
  * their driver lambdas run several EAGER actions (index build, micro-
  * batch stream, compaction) before returning the lazily-evaluated
  * verification frame, so a single bench number is a black box — a
  * regression in any stage surfaces as an unattributable total. The
  * lambdas mark stage boundaries here; Bench drains the marks after
  * timing and emits them alongside the per-query totals (the remainder —
  * total minus the marked stages — is the final lazy verify/count).
  *
  * `start` resets a query's marks, so when Bench repeats a query the
  * recorded stages describe the LAST run (totals report min/median across
  * runs — stage values are attribution, not the scored number).
  * Thread-safe; zero overhead for queries that never call it.
  */
object StageTimer {
  private val marks =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, List[(String, Double)])]()

  def start(q: String): Unit = marks.put(q, (System.nanoTime(), Nil))

  /** Record the time since the previous mark (or start) as `stage`. */
  def mark(q: String, stage: String): Unit =
    marks.computeIfPresent(q, (_, v) => {
      val now = System.nanoTime()
      (now, v._2 :+ (stage -> (now - v._1) / 1e9))
    })

  def stages(q: String): List[(String, Double)] =
    Option(marks.get(q)).map(_._2).getOrElse(Nil)

  def recorded: Seq[String] = {
    import scala.jdk.CollectionConverters._
    marks.keySet().asScala.toSeq.sorted
  }
}
