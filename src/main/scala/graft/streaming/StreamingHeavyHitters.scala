package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming Misra–Gries heavy hitters via `transformWithState`: one
  * bounded MG summary per group key (e.g. per language), folded
  * incrementally across micro-batches — the streaming face of
  * [[graft.functions.HeavyHitters]].
  *
  * Scale shape: state is O(groups × capacity) REGARDLESS of how many
  * distinct items flow through — the property that makes frequency
  * tracking viable on an unbounded stream (an exact
  * groupBy(item).count() in update mode grows state with the
  * vocabulary forever). Each batch applies the classic MG update per
  * arriving item (amortized O(1)); the emitted row carries the
  * current top items, so downstream sees a fresh leaderboard per
  * group per batch.
  *
  * Same guarantee as the batch aggregate, per group: any item whose
  * true frequency within the group exceeds n/(capacity+1) of the n
  * rows observed so far is present, and every estimate lies in
  * [true − n/(capacity+1), true]. When capacity ≥ the group's
  * distinct-item count the summary is exact — the condition
  * `StreamingHeavyHittersSpec` uses to pin stream ≡ batch.
  */
object StreamingHeavyHitters {

  case class Item(group: String, item: String)
  case class GroupHitters(group: String, n_seen: Long,
                          items: Array[String], ests: Array[Long])

  private class MgProcessor(capacity: Int)
      extends StatefulProcessor[String, Item, GroupHitters] {
    @transient private var state: ValueState[(Long, Map[String, Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Map[String, Long])]("mg",
        Encoders.tuple(Encoders.scalaLong,
          Encoders.kryo[Map[String, Long]]), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Item],
                                 timers: TimerValues): Iterator[GroupHitters] = {
      var (n, m) = if (state.exists()) state.get() else (0L, Map.empty[String, Long])
      rows.foreach { r =>
        n += 1
        m.get(r.item) match {
          case Some(c) => m = m.updated(r.item, c + 1)
          case None if m.size < capacity => m = m.updated(r.item, 1L)
          case None =>
            // MG decrement: one uncounted arrival cancels one unit of
            // every tracked counter (and itself)
            m = m.flatMap { case (k, c) =>
              if (c - 1 == 0L) None else Some(k -> (c - 1)) }
        }
      }
      state.update((n, m))
      val sorted = m.toSeq.sortBy { case (k, c) => (-c, k) }
      Iterator.single(GroupHitters(key, n,
        sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
  }

  /** `rows` needs (group, item) string columns; emits one updated
    * leaderboard row per active group per micro-batch.
    */
  def perGroupHitters(rows: DataFrame, capacity: Int = 32): Dataset[GroupHitters] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("group", "item").as[Item]
      .groupByKey(_.group)
      .transformWithState(new MgProcessor(capacity),
        TimeMode.None(), OutputMode.Update(), implicitly[
          org.apache.spark.sql.Encoder[GroupHitters]])
  }
}
