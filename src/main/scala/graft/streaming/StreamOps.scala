package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators. The reference
  * has no streaming (SURVEY §2.8); this is the Spark-native extension
  * surface: a landing directory of JSONL/parquet events becomes an
  * incremental pipeline with the same schema and aggregates as EventOps.
  */
object StreamOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(lastSec: Long, sessions: Long, events: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** File-source stream over a landing directory (JSONL by default —
    * matching the corpus shard format).
    */
  def readEventStream(spark: SparkSession, path: String,
                      format: String = "json"): DataFrame = {
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    spark.readStream.schema(schema).format(format).load(path)
  }

  /** Tumbling event-time window counts with a watermark for late data —
    * the streaming twin of EventOps.tumblingCounts.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))

  /** Stateful gap sessionization via mapGroupsWithState — the streaming twin
    * of EventOps.sessionize. State per user: last event second + counters.
    */
  def sessionCounts(events: Dataset[Event], gapMinutes: Int): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapSec = gapMinutes * 60L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        (user, batch, state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            val newSession = s.lastSec == Long.MinValue || sec - s.lastSec > gapSec
            s = SessionState(sec, s.sessions + (if (newSession) 1 else 0), s.events + 1)
          }
          state.update(s)
          SessionUpdate(user, s.sessions, s.events)
      }
  }

  /** Write helper: append stream to parquet with a checkpoint. */
  def sinkParquet(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint).format("parquet").option("path", path)

  /** Streaming keep-first exact dedup — the incremental twin of
    * Dedup.keepFirst (J2): documents whose content hash was already seen in
    * ANY earlier micro-batch are dropped. State is Spark's streaming
    * dropDuplicates store keyed on the hash; with a watermark column
    * present, state for hashes older than the horizon is evicted (bounded
    * state at 100 TB/day ingest — dedup-within-horizon), without one it is
    * exact-forever.
    */
  def dedupStream(docs: DataFrame, textCol: String,
                  watermarkCol: Option[(String, String)] = None): DataFrame = {
    val hashed = docs.withColumn("__h", md5(col(textCol)))
    val withWm = watermarkCol match {
      case Some((c, delay)) =>
        hashed.withWatermark(c, delay).dropDuplicatesWithinWatermark("__h")
      case None => hashed.dropDuplicates("__h")
    }
    withWm.drop("__h")
  }
}
