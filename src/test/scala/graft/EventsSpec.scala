package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Events

/** Gap sessionization: hand-built timelines, boundary semantics,
  * partition-independence.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("sessionize splits on gaps > gap and keeps boundary-exact events") {
    val events = Seq(
      // user 1: 10:00, 10:10 together; 10:50 is 40 min after → new session
      (0L, t("10:00"), 1L, 1.0),
      (1L, t("10:10"), 1L, 2.0),
      (2L, t("10:50"), 1L, 4.0),
      // user 2: single event
      (3L, t("09:00"), 2L, 8.0),
      // user 3: exactly 30 min apart → SAME session (strict >)
      (4L, t("08:00"), 3L, 16.0),
      (5L, t("08:30"), 3L, 32.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Events.sessionize(events, gapMinutes = 30)
      .as[(Long, Long, Timestamp, Timestamp, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got((1L, 1L)) ===
      ((1L, 1L, t("10:00"), t("10:10"), 2L, 3.0)))
    assert(got((1L, 2L)) === ((1L, 2L, t("10:50"), t("10:50"), 1L, 4.0)))
    assert(got((2L, 1L)) === ((2L, 1L, t("09:00"), t("09:00"), 1L, 8.0)))
    assert(got((3L, 1L)) === ((3L, 1L, t("08:00"), t("08:30"), 2L, 48.0)))
    assert(got.size == 4)
  }

  test("sessionize ties on ts break by event_id; result partition-independent") {
    val events = Seq(
      (10L, t("12:00"), 7L, 1.0),
      (9L, t("12:00"), 7L, 2.0), // same ts: event_id 9 sorts first
      (11L, t("13:30"), 7L, 4.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val a = Events.sessionize(events, 60).as[(Long, Long, Timestamp, Timestamp, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val b = Events.sessionize(events.repartition(7, col("event_id")), 60)
      .as[(Long, Long, Timestamp, Timestamp, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._5).toSeq == Seq(2L, 1L)) // 12:00 pair, then 13:30
  }

  test("sessionizeStream: session_window merges within gap, emits on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val sessions = Events.sessionizeStream(
      input.toDF().toDF("ts", "user_id", "value"),
      gapMinutes = 10, watermark = "10 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("stream_sessions").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    def ts(min: Int) = new Timestamp(86400000L + min * 60000L)
    // user 1: two events 5 min apart (one session), a third 30 min later
    input.addData((ts(0), 1L, 1.0), (ts(5), 1L, 2.0), (ts(35), 1L, 4.0))
    q.processAllAvailable()
    // push the watermark far past everything so all sessions close
    input.addData((ts(300), 9L, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("stream_sessions")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 % 1440,
        r.getLong(2), r.getDouble(3)))
      .filter(_._1 == 1L).toSet
    assert(rows == Set((1L, 0L, 2L, 3.0), (1L, 35L, 1L, 4.0)))
  }
}
