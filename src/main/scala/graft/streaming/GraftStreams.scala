package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10 / M5). The reference's
  * streaming story is CDC streams + scheduled TASKs
  * (src/query/storages/stream/src/stream_table.rs;
  * src/common/cloud_control/); Spark-native streaming is strictly
  * richer: watermarks, windowed aggregation, and arbitrary keyed state.
  * These transforms are defined once and run identically in batch and
  * streaming (same DataFrame programs), which is how TASK-style
  * incremental pipelines are expressed Spark-first: readStream ->
  * transform -> foreachBatch/sink with Trigger.AvailableNow.
  */
object GraftStreams {

  /** Tumbling-window event counts with a watermark for late data. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  case class Ev(user_id: Long, tus: Long)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Int)
  case class SessState(start: Long, last: Long, n: Int)

  /** Gap-based sessionization with arbitrary keyed state
    * (mapGroupsWithState): emits closed sessions when the gap elapses.
    * State per user is O(1) — this is the stateful-processor shape the
    * reference's CDC-driven TASKs would need at 100 TB.
    */
  def sessionize(events: Dataset[Ev], gapMicros: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[List[SessState]]) =>
          // arriving micro-batch, time-ordered within the group
          val sorted = rows.toSeq.sortBy(_.tus)
          var sessions = state.getOption.getOrElse(Nil)
          var closed = List.empty[SessionOut]
          for (e <- sorted) {
            sessions match {
              case cur :: rest if e.tus - cur.last <= gapMicros =>
                sessions = cur.copy(last = e.tus, n = cur.n + 1) :: rest
              case cur :: rest =>
                closed ::= SessionOut(user, cur.start, cur.n)
                sessions = SessState(e.tus, e.tus, 1) :: rest
              case Nil =>
                sessions = SessState(e.tus, e.tus, 1) :: Nil
            }
          }
          state.update(sessions)
          closed.reverseIterator
      }
  }

  /** Watermarked stream-stream interval join (click-attribution shape):
    * each click joins the same user's impression at most `within`
    * earlier. Both sides carry watermarks, so the join state is bounded
    * and old impressions are evicted — the property that makes
    * stream-stream joins viable at 100 TB/day. Works identically on
    * batch DataFrames (no watermark needed, same condition).
    */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val i0 = impressions.select(col("user_id").as("i_user"), col("ts").as("imp_ts"))
    val c0 = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val (i, c) =
      if (impressions.isStreaming)
        (i0.withWatermark("imp_ts", within), c0.withWatermark("click_ts", within))
      else (i0, c0)
    i.join(c, expr(
        s"i_user = c_user AND click_ts >= imp_ts AND click_ts <= imp_ts + interval $within"))
      .select(col("i_user").as("user_id"), col("imp_ts"), col("click_ts"))
  }

  /** Flush any open sessions (used at end-of-stream in tests/batch). */
  def openSessions(events: Dataset[Ev], gapMicros: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user, rows) =>
      val sorted = rows.toSeq.sortBy(_.tus)
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      var start = -1L; var last = -1L; var n = 0
      for (e <- sorted) {
        if (start < 0) { start = e.tus; last = e.tus; n = 1 }
        else if (e.tus - last <= gapMicros) { last = e.tus; n += 1 }
        else { out += SessionOut(user, start, n); start = e.tus; last = e.tus; n = 1 }
      }
      if (start >= 0) out += SessionOut(user, start, n)
      out.iterator
    }
  }
}
