package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (the batch-side
  * complement of the streaming surface in `streaming/CrawlStream`).
  */
object Events {

  /** Gap-based sessionization: a user's events belong to one session
    * while consecutive events are at most `gapMinutes` apart; a longer
    * silence starts the next session. Returns one row per session:
    * (user_id, session_id, session_start, session_end, n_events,
    * total_value) — the classic funnel/engagement primitive.
    *
    * Semantics are order-exact: events sort by (ts, event_id) within
    * the user, the gap test is timestamp-interval arithmetic
    * (microsecond-exact, no epoch-seconds truncation), and session_id
    * is the running count of session-opening events — so output is
    * deterministic under any partitioning.
    *
    * Scale shape: one shuffle on the 8-byte user_id, then two window
    * passes over each user's slice (lag + running sum) and a map-side
    * combinable (user, session) aggregation that reuses the same
    * partitioning. Sessionizing one entity is inherently sequential —
    * a pathological single bot user serializes into one task; the
    * mitigation at that extreme is a per-(user, day) pre-split before
    * this op, which this function deliberately does not hide inside
    * itself because it changes session identity at day boundaries.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val opens = when(
      prevTs.isNull ||
        col("ts") > prevTs + expr(s"INTERVAL $gapMinutes MINUTES"),
      1L).otherwise(0L)
    events
      .withColumn("session_id", sum(opens).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Streaming counterpart of [[sessionize]] over an unbounded event
    * stream: Structured Streaming's built-in `session_window` merges
    * events within `gapMinutes` of inactivity per user, the watermark
    * bounds both state retention and how late an event may arrive, and
    * sessions emit once the watermark passes their close (Append
    * mode) — exactly-once per session under checkpointed restarts.
    *
    * Boundary note vs the batch op: `session_window` windows are
    * half-open `[first, last + gap)`, so an event arriving EXACTLY
    * `gap` after its predecessor starts a NEW session, where the
    * batch op's strict-greater test keeps it. The batch op is the
    * semantic of record (it matches the DuckDB oracle); the streaming
    * surface documents the off-by-an-instant difference rather than
    * re-deriving session identity in custom keyed state.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
}
