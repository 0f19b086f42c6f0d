package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization covers every event exactly once") {
    val sessions = run("events_sessionize")
    val total = graft.catalog.Tables(spark, sf).events.count()
    assert(sessions.agg(sum($"n_events")).as[Long].collect()(0) == total)
    // session bounds ordered
    assert(sessions.filter($"session_start" > $"session_end").count() == 0)
  }

  test("as-of join: purchase timestamps never in the future of the event") {
    val out = run("asof_last_purchase")
    assert(out.count() > 0)
    assert(out.filter($"last_purchase_ts" > $"ts").count() == 0)
    assert(out.filter($"micros_since_purchase" < 0).count() == 0)
    // users with no prior purchase yield nulls, not dropped rows
    assert(out.filter($"last_purchase_ts".isNull).count() >= 0)
  }

  test("as-of join picks the LATEST prior purchase (literal check)") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "purchase", 1.0),
      (2L, "2024-01-01 11:00:00", 7L, "purchase", 2.0),
      (3L, "2024-01-01 12:00:00", 7L, "click", 0.0),
      (4L, "2024-01-01 09:00:00", 8L, "click", 0.0)
    ).toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"tss")).drop("tss")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = events
      .withColumn("last_purchase_ts",
        last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true).over(w))
      .filter($"event_type" =!= "purchase")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.sql.Timestamp]("last_purchase_ts"))).toMap
    assert(out(3L).get.toString.startsWith("2024-01-01 11:00:00")) // latest, not first
    assert(out(4L).isEmpty) // no prior purchase
  }

  test("approx_count_distinct (HLL sketch) lands within 5% of exact") {
    val li = graft.catalog.Tables(spark, sf).lineitem
    val exact = li.select($"l_partkey").distinct().count()
    val approx = li.agg(approx_count_distinct($"l_partkey")).as[Long].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("outlier z-scores are extreme by construction") {
    val out = run("value_outliers")
    assert(out.filter(abs($"z") <= 3.0).count() == 0)
  }

  test("rollup: grand total row equals sum of detail rows") {
    val out = run("rollup_revenue").collect()
    val grand = out.find(r => r.getInt(0) == 1 && r.getInt(1) == 1).get
    val detail = out.filter(r => r.getInt(0) == 0 && r.getInt(1) == 0)
    assert(math.abs(detail.map(_.getAs[Double]("revenue")).sum -
      grand.getAs[Double]("revenue")) < 1e-4)
    assert(detail.map(_.getAs[Long]("cnt")).sum == grand.getAs[Long]("cnt"))
  }

  test("set ops partition the BUILDING segment") {
    val out = run("set_ops_customers")
    val both = out.filter($"tag" === "both").count()
    val only = out.filter($"tag" === "building_only").count()
    val building = graft.catalog.Tables(spark, sf).customer
      .filter($"c_mktsegment" === "BUILDING").count()
    assert(both + only == building)
    // disjoint
    assert(out.groupBy($"custkey").count().filter($"count" > 1).count() == 0)
  }

  test("semi + anti partition the part table") {
    val r = run("semi_anti_parts").collect()(0)
    val total = graft.catalog.Tables(spark, sf).part.count()
    assert(r.getAs[Long]("n_parts_heavy") + r.getAs[Long]("n_parts_not_heavy") == total)
  }

  test("open-orders sweep: non-negative backlog, conserved opens/closes") {
    val ts = run("open_orders_timeseries").orderBy($"day").collect()
    assert(ts.nonEmpty && ts.forall(_.getAs[Long]("n_open") >= 0L))
    val t = graft.catalog.Tables(spark, sf)
    val total = t.orders.count()
    val withLines = t.lineitem.select($"l_orderkey").distinct()
      .join(t.orders.select($"o_orderkey".as("l_orderkey")), Seq("l_orderkey"))
      .count()
    // every order opens once; every order with at least one shipped
    // line closes once; the series ends at the never-shipped backlog
    assert(ts.map(_.getAs[Long]("n_opened")).sum == total)
    assert(ts.map(_.getAs[Long]("n_closed")).sum == withLines)
    assert(ts.last.getAs[Long]("n_open") == total - withLines)
  }

  test("joint histogram covers every order once and bounds the grid") {
    val out = run("joint_histogram").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val vb = r.getAs[Long]("vb")
      assert(vb >= 0 && vb <= 15)
      assert(r.getAs[Long]("n_lines") >= 1 && r.getAs[Long]("n_lines") <= 16)
    }
    // conservation: every order with lines lands in exactly one cell
    val t = graft.catalog.Tables(spark, sf)
    val expected = t.orders.join(
      t.lineitem.select($"l_orderkey".as("o_orderkey")).distinct(),
      Seq("o_orderkey")).count()
    assert(out.map(_.getAs[Long]("n_orders")).sum == expected)
  }

  test("transition dwell: ordered gaps are non-negative, p90 >= p50, counts match") {
    val out = run("transition_dwell").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("p50_sec") >= 0.0)
      assert(r.getAs[Double]("p90_sec") >= r.getAs[Double]("p50_sec"))
    }
    // total pairs = total events - one open tail per user
    val ev = graft.catalog.Tables(spark, sf).events
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum == expected)
  }

  test("A/B significance flag equals the double-precision z-test") {
    val r = run("ab_test_report").collect()(0)
    val na = r.getAs[Long]("n_a").toDouble; val ca = r.getAs[Long]("c_a").toDouble
    val nb = r.getAs[Long]("n_b").toDouble; val cb = r.getAs[Long]("c_b").toDouble
    assert(na > 0 && nb > 0)
    assert(ca + cb > 0 && ca + cb < na + nb,
      "conversion must be non-degenerate for the test to have teeth")
    val p = (ca + cb) / (na + nb)
    val z2 = math.pow(ca / na - cb / nb, 2) /
      (p * (1 - p) * (1 / na + 1 / nb))
    assert(r.getAs[Boolean]("significant") == (z2 > 3.84),
      s"flag disagrees with z²=$z2")
    // arms are a hash split of all users
    val users = graft.catalog.Tables(spark, sf).events
      .select($"user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
  }
}
