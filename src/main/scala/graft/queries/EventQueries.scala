package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyses, EventOps}

/** Date/time operators over the events table: P13 utterance dates plus the
  * Spark-native windowing extensions (tumbling counts, sessionization).
  */
object EventQueries extends QueryPack {

  /** Normalize the events `ts` to a session-zone TIMESTAMP whatever the
    * parquet wrote: TIMESTAMP(NANOS) arrives as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong (set in our session builders) —
    * convert like DuckDB's ns→µs cast; TIMESTAMP(MICROS, no UTC adjust)
    * arrives as TIMESTAMP_NTZ — reinterpret in the session zone (UTC
    * everywhere here), which both matches DuckDB's naive read AND keeps
    * the epoch-seconds `cast(ts as long)` downstream legal (ANSI allows
    * LTZ→BIGINT but rejects NTZ→BIGINT — the exact break when the corpus
    * generator switched ns → µs).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p13_dates" -> ((s, dir) =>
      events(s, dir)
        .select(year(col("ts")).cast("long").as("year"),
          month(col("ts")).cast("long").as("month"))
        .groupBy("year", "month").agg(count(lit(1)).as("cnt"))
        .orderBy("year", "month")),

    "w_tumble_hour" -> ((s, dir) =>
      EventOps.tumblingCounts(events(s, dir), "ts", "hour")
        .orderBy("window_start", "event_type")),

    "w_slide_30m" -> ((s, dir) =>
      EventOps.slidingCounts(events(s, dir), "ts", lenMinutes = 60, slideMinutes = 30)
        .orderBy("window_start", "event_type")),

    "w_sessionize" -> ((s, dir) =>
      EventOps.sessionStats(
        events(s, dir).withColumn("ts", col("ts").cast("long")),
        "user_id", "ts", "event_id", gapMinutes = 30)
        .orderBy("user_id")),

    "e6_by_id" -> ((s, dir) =>
      events(s, dir)
        .where(col("event_id").isin(1L, 17L, 99L, 123L))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")),

    // session path mining: top 3-step event-type sequences (whole-second
    // timestamps like w_sessionize for ns/µs portability)
    "w_top_paths" -> ((s, dir) =>
      EventOps.topPaths(events(s, dir).withColumn("ts", col("ts").cast("long")),
        "user_id", "ts", "event_id", gapMinutes = 30, n = 3, k = 10)),

    // month-over-month cohort retention
    "w_retention" -> ((s, dir) =>
      EventOps.retention(events(s, dir), "user_id", "ts").orderBy("month_idx")),

    // subsequence funnel: view -> click -> purchase conversion per session
    "w_funnel" -> ((s, dir) =>
      EventOps.funnel(events(s, dir).withColumn("ts", col("ts").cast("long")),
        "user_id", "ts", "event_id", gapMinutes = 30,
        steps = Seq("view", "click", "purchase")).orderBy("step"))
  )

  override val oracles: Map[String, String] = Map(
    "p13_dates" ->
      """SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
        | count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w_tumble_hour" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // each event lands in the two 60m windows whose 30m-grid starts cover
    // it (epoch-aligned, exactly Spark's window(ts, len, slide) contract)
    "w_slide_30m" ->
      """WITH g AS (SELECT event_type,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800 AS BIGINT) AS grid
        | FROM events),
        |w AS (SELECT event_type,
        |  strftime(make_timestamp((grid - 1800 * k.k) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start
        | FROM g, (SELECT unnest(generate_series(0, 1)) AS k) k)
        |SELECT window_start, event_type, count(*) AS cnt
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // both sides sessionize on whole-second timestamps (ns↔µs portability)
    "w_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events),
        |flags AS (SELECT user_id,
        |  (CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |   THEN 1 ELSE 0 END) AS new_session
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM flags GROUP BY 1 ORDER BY 1""".stripMargin,

    "e6_by_id" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_id IN (1, 17, 99, 123) ORDER BY event_id""".stripMargin,

    "w_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events),
        |f AS (SELECT *, (CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |   THEN 1 ELSE 0 END) AS ns
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |seq AS (SELECT user_id, sid, list(event_type ORDER BY sec, event_id) AS types
        | FROM s GROUP BY 1, 2),
        |p AS (SELECT unnest(list_transform(generate_series(1, len(types) - 2),
        |  i -> array_to_string(list_slice(types, i, i + 2), ' '))) AS path FROM seq)
        |SELECT path, count(*) AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, path LIMIT 10""".stripMargin,

    "w_retention" ->
      """WITH um AS (SELECT DISTINCT user_id AS u,
        |  CAST(year(ts) * 12 + month(ts) AS BIGINT) AS month_idx FROM events),
        |r AS (SELECT u, month_idx,
        |  (lead(month_idx) OVER (PARTITION BY u ORDER BY month_idx) = month_idx + 1) AS nx
        | FROM um)
        |SELECT month_idx, count(*) AS n_users,
        | CAST(sum(CASE WHEN nx THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        | round(sum(CASE WHEN nx THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
        |   AS retention_rate
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "w_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec FROM events),
        |f AS (SELECT *, (CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |   THEN 1 ELSE 0 END) AS ns
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |seq AS (SELECT user_id, sid, list(event_type ORDER BY sec, event_id) AS types
        | FROM s GROUP BY 1, 2),
        |d0 AS (SELECT types, NULLIF(list_position(types, 'view'), 0) AS f0 FROM seq),
        |d1 AS (SELECT *, f0 + NULLIF(list_position(
        |   list_slice(types, f0 + 1, len(types)), 'click'), 0) AS f1 FROM d0),
        |d2 AS (SELECT *, f1 + NULLIF(list_position(
        |   list_slice(types, f1 + 1, len(types)), 'purchase'), 0) AS f2 FROM d1)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |  CAST(count(f0) AS BIGINT) AS n_reached,
        |  round(count(f0) / CAST(count(*) AS DOUBLE), 6) AS frac_of_sessions FROM d2
        | UNION ALL
        | SELECT 2, 'click', CAST(count(f1) AS BIGINT),
        |  round(count(f1) / CAST(count(*) AS DOUBLE), 6) FROM d2
        | UNION ALL
        | SELECT 3, 'purchase', CAST(count(f2) AS BIGINT),
        |  round(count(f2) / CAST(count(*) AS DOUBLE), 6) FROM d2
        |) ORDER BY step""".stripMargin
  )
}
