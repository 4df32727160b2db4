package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streaming tumbling counts match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumble").outputMode(OutputMode.Complete).start()
    input.addData(
      Event(1, ts(10), 1, "click", 1.0), Event(2, ts(20), 1, "click", 1.0),
      Event(3, ts(70), 2, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("tumble").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      ("1970-01-01 00:00:00", "click", 2L),
      ("1970-01-01 01:00:00", "view", 1L)))
  }

  test("stateful sessionization counts sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionCounts(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Update).start()
    input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(100), 7, "click", 1.0)) // gap > 30min ⇒ new session
    q.processAllAvailable()
    val last = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).last
    q.stop()
    assert(last === ((7L, 2L, 3L))) // 2 sessions, 3 events, state survived batches
  }

  test("streaming dedup drops repeat hashes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dedupStream(input.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append).start()
    input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    input.addData((4L, "beta"), (5L, "gamma")) // beta already seen in batch 1
    q.processAllAvailable()
    val kept = spark.table("dedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept === Set(1L, 2L, 5L))
  }
}
