package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface over the `events` table.
  *
  * The reference is batch-only (`schedule_interval='@once'`,
  * `orders_ETL.py:37`) — its natural streaming upgrade is a
  * file-source stream with `Trigger.AvailableNow`: each run drains
  * whatever landed since the last checkpoint and stops, giving the
  * reference's one-shot semantics plus incremental re-runs for free
  * (SURVEY.md §1.2).
  *
  * Scale notes: windowed aggregation state is bounded by the
  * watermark horizon; sessionization state is per-user and dropped on
  * timeout. Both shuffle once on the grouping key — identical plan
  * shape to the batch equivalents, so the 100 TB sizing story
  * (partitions, skew, AQE) carries over.
  */
object EventsStream extends StreamingProvider {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long,
                           start: java.sql.Timestamp, end: java.sql.Timestamp,
                           total_value: Double)

  /** File-source stream of events.parquet under `dir`, normalized to
    * microsecond timestamps (the parquet carries TIMESTAMP(NANOS),
    * surfaced as epoch-nano longs — see Tables.events).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-source streams take a directory; select just the events
    // table out of the shared sf directory
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Hourly tumbling-window counts with a watermark — the streaming
    * twin of the batch `events_hourly` query (late data beyond 1h is
    * dropped deterministically once the watermark passes).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // decimal sum: exact and order-invariant, so micro-batch
      // boundaries (stream) and shuffle order (batch) can never
      // flip a last-ulp double — the same dsum discipline the batch
      // relational queries use
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Per-user gap-based sessionization via flatMapGroupsWithState:
    * events more than `gapMinutes` apart start a new session. Emits
    * closed sessions (Append mode); open sessions survive in state.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[Event], state: GroupState[List[Event]]) =>
          val sorted = (state.getOption.getOrElse(Nil) ++ events.toList)
            .sortBy(_.ts.getTime)
          // split into gap-separated runs; keep the last run open in state
          val runs = sorted.foldLeft(List.empty[List[Event]]) {
            case (Nil, e) => List(List(e))
            case (cur :: done, e) =>
              if (e.ts.getTime - cur.head.ts.getTime > gapMs) List(e) :: cur :: done
              else (e :: cur) :: done
          }.map(_.reverse).reverse
          val (closed, open) = runs.splitAt(math.max(runs.length - 1, 0))
          state.update(open.flatten)
          closed.iterator.map { run =>
            Session(userId, run.length.toLong, run.head.ts, run.last.ts,
              run.map(_.value).sum)
          }
      }
  }

  /** Streaming exact dedup: drops re-deliveries of the same event_id
    * arriving within the watermark horizon — the at-least-once →
    * effectively-once repair stage a training-data ingest runs first.
    * State is keyed on event_id and EVICTED once the watermark passes
    * (`dropDuplicatesWithinWatermark`), so memory is O(events per
    * horizon), not O(stream history) — the property that makes
    * streaming dedup viable on an unbounded 100 TB/day feed. A
    * duplicate arriving later than the horizon is by contract no
    * longer detectable; size the horizon to the delivery-retry bound.
    */
  def dedupStream(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join: each purchase joins the clicks
    * the same user made in the preceding `windowMinutes`. Both sides
    * carry a watermark and the join condition bounds click_ts to a
    * closed interval around purchase_ts, so Spark can EVICT join
    * state once the watermark passes — state is O(events per horizon)
    * per side, the property that keeps an unbounded ad-attribution
    * join viable. Physically this is one shuffle of each side onto
    * user_id, identical to the batch interval-join shape.
    */
  def attributionJoin(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"), col("click_ts"), col("purchase_ts"),
        col("value"))
  }

  /** Drain-everything-now run to an in-memory table; returns once all
    * available files are processed (Trigger.AvailableNow). The
    * throwaway checkpoint dir is deleted on the way out — a bench
    * suite invoking oracle rows twice per recording would otherwise
    * leak one /tmp tree per invocation (r9 advice).
    */
  def runAvailableNow(df: DataFrame, queryName: String,
                      outputMode: String = "append"): Unit = {
    val ck = java.nio.file.Files.createTempDirectory(s"graft-ck-$queryName")
    try {
      val q = df.writeStream
        .format("memory").queryName(queryName)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck.toString)
        .start()
      q.awaitTermination()
    } finally deleteRecursively(ck)
  }

  private[streaming] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
    }
  }

  /** Run `body` with the RocksDB state-store provider active, then
    * (a) restore whatever provider conf the session had before — a
    * session-wide conf set inside a query closure must not bleed into
    * later queries — and (b) UNLOAD the loaded state-store providers
    * (`StateStore.stop()`), releasing RocksDB's native (off-JVM-heap)
    * allocations. Without (b), every oracle invocation in a long
    * bench suite parks tens of MB of native memory that the JVM's GC
    * can never reclaim — the prime suspect for the r9 warm-pass
    * inflation. `stop()` is safe mid-session: the next streaming
    * query lazily reloads providers and restarts maintenance.
    */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }
  }

  /** Arbitrary-sink streaming via foreachBatch: each micro-batch is
    * handed to `f` as a plain DataFrame with its batch id, so sinks
    * Spark lacks natively (idempotent upserts, JDBC merges, multi-
    * table writes) reuse the whole batch API. AvailableNow + the
    * checkpoint give exactly-once batch ids across restarts.
    */
  def runForeachBatch(df: DataFrame, checkpoint: String)
                     (f: (DataFrame, Long) => Unit): Unit = {
    val q = df.writeStream
      .foreachBatch(f)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  /** Streaming sink to parquet for production runs. */
  def runToParquet(df: DataFrame, path: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet").option("path", path)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  /** Oracle-pinned BATCH registrations of the streaming transforms.
    *
    * The streaming operators were previously only spec-tested
    * (stream ≡ batch suites); these rows put the SAME code paths
    * under the driver's DuckDB hash gate too. `withWatermark` is a
    * no-op on a batch Dataset (Catalyst's EliminateEventTimeWatermark
    * removes the node when the child isn't streaming), so calling
    * the transform on the batch events table executes the identical
    * declarative plan a micro-batch would — one function, two
    * execution modes, which is the whole point of Structured
    * Streaming's unified model.
    */
  /** The two batch-executed transform rows are safe outside the
    * isolated streaming phase: `withWatermark` on a batch Dataset is
    * a no-op (see the scaladoc above), so neither boots a streaming
    * engine or a state store inside the timed window.
    * `stream_sessions` stays isolated (RocksDB via [[sessionize]]'s
    * drain).
    */
  override def batchPhaseOk: Set[String] =
    Set("stream_hourly_counts", "stream_attribution_join")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly_counts" -> ((s, dir) =>
      hourlyCounts(graft.catalog.Tables(s, dir).events)),
    "stream_attribution_join" -> ((s, dir) =>
      attributionJoin(graft.catalog.Tables(s, dir).events)),
    // Oracle-pinned run of the REAL sessionization dataflow: the
    // events table drained as an AvailableNow file stream through
    // [[sessionize]] (flatMapGroupsWithState, per-user event-list
    // state, closed-session Append emission), landed in a memory
    // sink. Append mode emits every session EXCEPT each user's last
    // (still open in state) — the oracle states exactly that with a
    // max-session-id exclusion. Boundaries are emitted at MILLISECOND
    // granularity: the processor sorts by Timestamp.getTime (ms), so
    // among same-ms ties the head/tail micros are arrival-order-
    // dependent while the ms values are not — ms output is the
    // deterministic face of the same sessions (gap flags compare ms
    // on both engines, so the session SPLITS are tie-invariant too).
    "stream_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, unix_millis}
      runAvailableNow(sessionize(readEvents(s, dir)).toDF(),
        "stream_sessions_sink")
      s.table("stream_sessions_sink")
        .select(col("user_id"), col("n_events"),
          unix_millis(col("start")).as("start_ms"),
          unix_millis(col("end")).as("end_ms"))
    })
  )

  def oracles: Map[String, String] = Map(
    // tumbling 1h window ≡ date_trunc on the window start; decimal
    // sum on both sides so neither engine's order can flip an ulp
    "stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  cast(count(*) AS bigint) AS cnt,
        |  cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the stream-stream interval join is, declaratively, a plain
    // interval equi+range join — the batch oracle states exactly that
    "stream_attribution_join" ->
      """WITH clicks AS (
        |  SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id AS p_user, ts AS purchase_ts,
        |         event_id AS purchase_id, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT purchase_id, click_id, p_user AS user_id,
        |  click_ts, purchase_ts, value
        |FROM purchases JOIN clicks
        |  ON p_user = c_user
        | AND click_ts <= purchase_ts
        | AND click_ts >= purchase_ts - INTERVAL 30 MINUTE""".stripMargin,
    // gap sessionization in ms, excluding each user's LAST session
    // (open in stream state, never emitted in Append mode). Gap flags
    // and boundaries all compare epoch-ms — the granularity the
    // stream's Timestamp.getTime sort actually uses.
    "stream_sessions" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > ${30L * 60L * 1000L}
         |         THEN 1 ELSE 0 END AS gap_flag
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
         |sessions AS (
         |  SELECT user_id, ts,
         |    sum(gap_flag) OVER (PARTITION BY user_id
         |      ORDER BY epoch_ms(ts), event_id
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flagged),
         |agg AS (
         |  SELECT user_id, sid, cast(count(*) AS bigint) AS n_events,
         |    cast(min(epoch_ms(ts)) AS bigint) AS start_ms,
         |    cast(max(epoch_ms(ts)) AS bigint) AS end_ms
         |  FROM sessions GROUP BY 1, 2)
         |SELECT user_id, n_events, start_ms, end_ms
         |FROM agg
         |QUALIFY sid < max(sid) OVER (PARTITION BY user_id)""".stripMargin
  )
}
