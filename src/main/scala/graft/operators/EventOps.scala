package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-keyed operators over the events table. The reference has no
  * event-time processing (SURVEY §2.8) — these are the Spark-native
  * extension surface; the streaming twins live in graft.streaming.
  */
object EventOps {

  /** Tumbling-window aggregate, batch form. Emits the window start as a
    * formatted string so results are precision-portable.
    */
  def tumblingCounts(df: DataFrame, tsCol: String, unit: String = "hour"): DataFrame =
    df.select(date_format(date_trunc(unit, col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .groupBy("window_start", "event_type").agg(count(lit(1)).as("cnt"))

  /** Sliding-window aggregate, batch form: each event lands in
    * lenMinutes/slideMinutes overlapping windows (Spark's `window(ts, len,
    * slide)` generator — the explode happens in the scan stage, then one
    * hash aggregate). Window starts formatted like [[tumblingCounts]].
    */
  def slidingCounts(df: DataFrame, tsCol: String, lenMinutes: Int,
                    slideMinutes: Int): DataFrame =
    df.select(window(col(tsCol), s"$lenMinutes minutes", s"$slideMinutes minutes")
          .as("w"), col("event_type"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .groupBy("window_start", "event_type").agg(count(lit(1)).as("cnt"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. One shuffle
    * (partition by user), one per-user sort.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, orderCol: String,
                 gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      col(tsCol).cast("double") - prev.cast("double") > gapMinutes * 60.0, 1L).otherwise(0L)
    df.withColumn("session_id", sum(newSession).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats on top of [[sessionize]]. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, orderCol: String,
                   gapMinutes: Int): DataFrame =
    sessionize(df, userCol, tsCol, orderCol, gapMinutes)
      .groupBy(userCol)
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))

  /** Month-over-month retention: for each activity month, how many
    * distinct users were active and what fraction returned the NEXT
    * month — the cohort-health card of every event-log analysis. One
    * distinct (user, month) aggregate (corpus → user×month cardinality),
    * one user-partitioned lead window, one month-cardinality aggregate.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val m = (year(col(tsCol)) * 12 + month(col(tsCol))).cast("long")
    val um = df.select(col(userCol).as("u"), m.as("month_idx")).distinct()
    val next = lead(col("month_idx"), 1)
      .over(Window.partitionBy("u").orderBy("month_idx"))
    um.withColumn("nx", next === col("month_idx") + 1)
      .groupBy("month_idx")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("nx"), 1L).otherwise(0L)).as("n_retained"))
      .withColumn("retention_rate",
        round(col("n_retained") / col("n_users").cast("double"), 6))
  }

  /** Ordered event-type sequence per session (`types` array, one row per
    * session). Lists are session-bounded, so the object aggregate never
    * sort-falls-back on real logs.
    */
  private def sessionTypeSeqs(df: DataFrame, userCol: String, tsCol: String,
                              orderCol: String, gapMinutes: Int): DataFrame =
    sessionize(df, userCol, tsCol, orderCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(orderCol), col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))

  /** Top-k n-step event-type paths over gap sessions — sequence mining on
    * the event log ("what do users do in order"), the n-gram surface
    * transplanted from text to sessions. One user-partitioned window
    * (sessionize), one per-session collect, then the standard n-gram
    * explode → count → TakeOrderedAndProject.
    */
  def topPaths(df: DataFrame, userCol: String, tsCol: String, orderCol: String,
               gapMinutes: Int, n: Int, k: Int): DataFrame =
    sessionTypeSeqs(df, userCol, tsCol, orderCol, gapMinutes)
      .select(explode(
        graft.functions.TextFunctions.ngrams(col("types"), n)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("path")).limit(k)

  /** Funnel analysis: for each step of an ordered event-type funnel, how
    * many sessions reach it as a SUBSEQUENCE (steps in order, any gaps) —
    * the conversion card. Depth is computed positionally (first index of
    * step 1, first index of step 2 after it, ...) with a null-chained
    * march both engines evaluate identically: absent → position 0 →
    * NULLIF → null propagates through the remaining steps. Per-session
    * work is array arithmetic in the scan stage; the result is ONE scalar
    * aggregation row exploded to step-cardinality.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, orderCol: String,
             gapMinutes: Int, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def pos0(arr: Column, s: String): Column = {
      val p = array_position(arr, s)
      when(p === 0, lit(null)).otherwise(p)
    }
    val positions = steps.tail.scanLeft(pos0(col("types"), steps.head)) {
      case (cur, s) =>
        cur + pos0(slice(col("types"), cur + 1, size(col("types")) - cur), s)
    }
    val aggs = count(lit(1)).cast("double").as("n_sessions") +:
      positions.zipWithIndex.map { case (p, i) => count(p).as(s"c$i") }
    val row = sessionTypeSeqs(df, userCol, tsCol, orderCol, gapMinutes)
      .agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(steps.indices.map { i =>
        struct(lit(i + 1L).as("step"), lit(steps(i)).as("step_name"),
          col(s"c$i").cast("long").as("n_reached"),
          // ANSI `/` throws on zero even for doubles: an empty log still
          // emits the (all-zero) step rows, so guard the denominator
          when(col("n_sessions") > 0,
            round(col(s"c$i") / col("n_sessions"), 6))
            .otherwise(lit(0.0)).as("frac_of_sessions"))
      }: _*)).as("f"))
      .select(col("f.step").as("step"), col("f.step_name").as("step_name"),
        col("f.n_reached").as("n_reached"),
        col("f.frac_of_sessions").as("frac_of_sessions"))
  }
}
