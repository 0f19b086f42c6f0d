package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Timer-closed sessionization via `transformWithState` with
  * EVENT-TIME timers — the watermark-driven way to emit a session
  * exactly once, when it is PROVABLY over.
  *
  * Each user keeps a LIST of open sessions `(start, end, count)` in
  * state, kept disjoint under the gap invariant: consecutive spans
  * are separated by MORE than `gap`. Incoming events are sorted and
  * interval-merged into that list, so a single batch holding events
  * more than `gap` apart yields multiple open sessions — replaying
  * history in one AvailableNow batch produces the same sessions as
  * live ingestion (batch boundaries cannot glue a gap shut). Each
  * open session owns one event-time timer at `end + gap`; events
  * that extend or merge sessions re-derive the timer set, and a
  * session row is emitted from `handleExpiredTimer` only once the
  * watermark passes its close time.
  *
  * Versus `EventsStream.sessionize` (flatMapGroupsWithState +
  * GroupStateTimeout): timers are per-key first-class objects — no
  * manual timeout bookkeeping — and emission is tied to the
  * watermark. State is O(open sessions); closed sessions leave the
  * store immediately.
  */
object SessionTimerState {

  case class SessionEvent(user_id: Long, ts_ms: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long)

  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var open: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[(Long, Long, Long)]("open",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    /** Interval-merge spans under the gap rule: after sorting by
      * start, a span whose start is within `gap` of the running end
      * joins the current session; otherwise it opens a new one.
      */
    private def mergeSpans(spans: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
      val out = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      spans.sortBy(s => (s._1, s._2)).foreach { s =>
        if (out.nonEmpty && s._1 <= out.last._2 + gapMs) {
          val l = out.last
          out(out.size - 1) = (l._1, math.max(l._2, s._2), l._3 + s._3)
        } else out += s
      }
      out.toSeq
    }

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[ClosedSession] = {
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      val incoming = rows.map(e => (e.ts_ms, e.ts_ms, 1L)).toSeq
      if (incoming.nonEmpty) {
        val merged = mergeSpans(existing ++ incoming)
        open.clear()
        open.appendList(merged.toArray)
        // re-derive the timer set: one close timer per open session
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        merged.foreach(s => getHandle.registerTimer(s._2 + gapMs))
      }
      Iterator.empty // sessions emit only when the watermark closes them
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val expiry = expired.getExpiryTimeInMs
      val sessions = if (open.exists()) open.get().toSeq else Seq.empty
      val (closed, stillOpen) = sessions.partition(_._2 + gapMs <= expiry)
      open.clear()
      if (stillOpen.nonEmpty) open.appendList(stillOpen.toArray)
      closed.sortBy(_._1).iterator
        .map { case (s, e, n) => ClosedSession(key, s, e, n) }
    }
  }

  /** `events` needs (user_id, ts timestamp); emits one row per closed
    * session once the watermark passes session end + gap.
    */
  def timerSessions(events: DataFrame, gapMinutes: Int = 30,
                    watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .selectExpr("user_id", "unix_millis(ts) AS ts_ms")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60L * 1000L),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[ClosedSession]])
  }
}
