package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Running per-user profile via Spark 4's `transformWithState` — the
  * successor API to `flatMapGroupsWithState` (typed state variables,
  * per-state TTL, RocksDB-backed). Each micro-batch folds a user's
  * events into a single `ValueState[(Long, Double)]` (event count,
  * decimal-cents spend) and emits the updated profile row — the
  * standard "feature store freshness" pattern: state is O(users), one
  * row per active user per batch reaches the sink, and the store
  * compacts/evicts via TTL rather than hand-rolled timeout logic.
  *
  * Spend accumulates in integer CENTS inside the state (exact —
  * replays and partition order can't perturb it) and surfaces as a
  * double only in the emitted row.
  */
object UserProfileState {

  case class ProfileEvent(user_id: Long, value: Double)
  case class UserProfile(user_id: Long, n_events: Long, total_value: Double)

  private class ProfileProcessor
      extends StatefulProcessor[Long, ProfileEvent, UserProfile] {
    @transient private var profile: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[(Long, Long)]("profile",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ProfileEvent],
                                 timers: TimerValues): Iterator[UserProfile] = {
      var (n, cents) = if (profile.exists()) profile.get() else (0L, 0L)
      rows.foreach { e =>
        n += 1
        cents += math.round(e.value * 100)
      }
      profile.update((n, cents))
      Iterator.single(UserProfile(key, n, cents / 100.0))
    }
  }

  /** `events` needs (user_id, value); emits one updated profile row
    * per active user per micro-batch (update semantics).
    */
  def runningProfiles(events: DataFrame): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[ProfileEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update(), implicitly[
          org.apache.spark.sql.Encoder[UserProfile]])
  }
}
