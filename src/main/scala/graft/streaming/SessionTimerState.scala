package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-closed sessionization via `transformWithState` with
  * EVENT-TIME timers — the watermark-driven way to emit a session
  * exactly once, when it is PROVABLY over: each user's open session
  * keeps (start, end, count) in a ValueState plus one registered
  * timer at `end + gap`; events extend the session and slide the
  * timer, and when the watermark passes the timer the session row is
  * emitted from `handleExpiredTimer` and the state cleared.
  *
  * Versus `EventsStream.sessionize` (flatMapGroupsWithState +
  * GroupStateTimeout): timers are per-key first-class objects — no
  * manual timeout bookkeeping — and emission is tied to the
  * watermark, so results are deterministic under replay regardless
  * of batch boundaries. State is O(open sessions); closed sessions
  * leave the store immediately.
  */
object SessionTimerState {

  case class SessionEvent(user_id: Long, ts_ms: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long)

  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[ClosedSession] = {
      var (start, end, n) =
        if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
      val hadTimer = sess.exists()
      rows.foreach { e =>
        start = math.min(start, e.ts_ms)
        end = math.max(end, e.ts_ms)
        n += 1
      }
      // slide the close timer to the new session end + gap
      if (hadTimer) getHandle.deleteTimer(sess.get()._2 + gapMs)
      sess.update((start, end, n))
      getHandle.registerTimer(end + gapMs)
      Iterator.empty // sessions emit only when the watermark closes them
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out =
        if (sess.exists()) {
          val (start, end, n) = sess.get()
          Iterator.single(ClosedSession(key, start, end, n))
        } else Iterator.empty
      sess.clear()
      out
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
