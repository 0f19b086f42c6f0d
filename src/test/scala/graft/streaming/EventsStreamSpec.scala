package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts equal the batch aggregation (AvailableNow drain)") {
    val stream = EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf))
    EventsStream.runAvailableNow(stream, "hourly_test", outputMode = "complete")
    val streamed = spark.table("hourly_test")
      .select($"hour", $"event_type", $"cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = Tables(spark, sf).events
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed == batch)
  }

  test("sessionization: closed sessions respect the gap and never overlap") {
    val sessions = EventsStream.sessionize(
      EventsStream.readEvents(spark, sf), gapMinutes = 30)
    EventsStream.runAvailableNow(sessions.toDF(), "sessions_test")
    val out = spark.table("sessions_test").as[EventsStream.Session]
      .collect().groupBy(_.user_id)

    assert(out.nonEmpty)
    out.foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.start.getTime)
      sorted.foreach { s =>
        assert(s.start.getTime <= s.end.getTime)
        assert(s.n_events >= 1)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts > 30 min after the previous one ended
          assert(b.start.getTime - a.end.getTime > 30 * 60 * 1000L)
        case _ =>
      }
    }
  }

  test("session event counts cover all but the open tail sessions") {
    val sessions = EventsStream.sessionize(
      EventsStream.readEvents(spark, sf), gapMinutes = 30)
    EventsStream.runAvailableNow(sessions.toDF(), "sessions_cov")
    val closed = spark.table("sessions_cov")
      .agg(sum($"n_events")).collect()(0).getLong(0)
    val total = Tables(spark, sf).events.count()
    val users = Tables(spark, sf).events.select($"user_id").distinct().count()
    // every event lands in exactly one session; at most one open
    // session per user is withheld
    assert(closed <= total)
    assert(closed + users * 50 >= total) // open sessions are short tails
  }
}
