package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the time-series family and the Pareto frontier
  * (the DuckDB hash gate proves cross-engine equality; these pin the
  * SEMANTICS against independently computed truths).
  */
class TimeseriesSpec extends SparkSpec {

  test("gapfill spine is dense per series and consistent on the corpus") {
    val out = run("timeseries_gapfill").cache()
    try {
      // dense: per series, #rows == datediff(max, min) + 1, no dup days
      val span = out.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("expect"),
          countDistinct(col("day")).as("nd"))
        .collect()
      assert(span.nonEmpty)
      span.foreach { r =>
        assert(r.getAs[Long]("n") == r.getAs[Int]("expect").toLong)
        assert(r.getAs[Long]("nd") == r.getAs[Long]("n"))
      }
      // is_gap <=> no observation; LOCF == observation on observed days
      assert(out.filter(col("is_gap") =!= col("observed_e6").isNull).count() == 0)
      assert(out.filter(!col("is_gap") &&
        col("locf_e6") =!= col("observed_e6")).count() == 0)
    } finally out.unpersist()
  }

  test("LOCF fills synthetic gaps with the latest preceding observation") {
    // the test corpora are gap-free at every sf (each type fires
    // daily), so the fill path is pinned on a sparse synthetic series
    import spark.implicits._
    val sparse = Seq(
      ("a", "2024-01-01", 2L, 100L),
      ("a", "2024-01-04", 1L, 400L), // 2 gap days before
      ("a", "2024-01-05", 3L, 500L),
      ("b", "2024-01-02", 1L, 20L),
      ("b", "2024-01-06", 2L, 60L)   // 3 gap days before
    ).toDF("series", "day_s", "n_events", "value_e6")
      .select(col("series"), to_date(col("day_s")).as("day"),
        col("n_events"), col("value_e6"))
    val out = Timeseries.gapfillLocf(sparse, "series")
      .orderBy(col("series"), col("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getBoolean(3), Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(out.length == 5 + 5) // a: 5 days, b: 5 days
    val a = out.filter(_._1 == "a")
    assert(a.map(_._2) sameElements
      Array("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))
    assert(a.map(_._5) sameElements Array(Some(100L), Some(100L), Some(100L),
      Some(400L), Some(500L)))
    assert(a.map(_._4) sameElements Array(false, true, true, false, false))
    assert(a.map(_._3) sameElements Array(2L, 0L, 0L, 1L, 3L))
    val b = out.filter(_._1 == "b")
    assert(b.map(_._5) sameElements Array(Some(20L), Some(20L), Some(20L),
      Some(20L), Some(60L)))
  }

  test("anomaly flag equals the double-arithmetic z>3 rule away from ties") {
    val out = run("anomaly_days_dow").cache()
    try {
      assert(out.count() > 0)
      // recompute z in plain double from the emitted day counts and
      // compare flags; the integer form only differs where z is
      // EXACTLY 3, which the corpus doesn't hit
      val stats = out.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).cast("double").as("m"),
          sum(col("x")).cast("double").as("s"),
          sum(col("x") * col("x")).cast("double").as("q"))
      val z2 = out.join(stats, Seq("event_type", "dow"))
        .withColumn("num", (col("m") * col("x") - col("s")) *
          (col("m") * col("x") - col("s")))
        .withColumn("den", col("m") * col("q") - col("s") * col("s"))
        .withColumn("flag2", col("num") > col("den") * 9.0)
      assert(z2.filter(col("is_anomaly") =!= col("flag2")).count() == 0)
    } finally out.unpersist()
  }

  test("windowed CUSUM closed form equals the sequential recurrence") {
    val out = run("changepoint_cusum")
      .orderBy(col("event_type"), col("day")).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val m = rows.length.toLong
      val s = rows.map(_.getAs[Long]("x")).sum
      var st = 0L
      rows.foreach { r =>
        st = math.max(0L, st + (m * r.getAs[Long]("x") - s))
        assert(r.getAs[Long]("cusum") == st,
          s"closed form diverges from recurrence at ${r.get(1)}")
      }
    }
  }

  test("forecast backtest scores months where both lags exist; winner consistent") {
    val out = run("forecast_backtest").collect()
    assert(out.nonEmpty)
    // expected scored set computed independently under the CALENDAR
    // join semantics (r11 advice): a month scores iff it has a
    // previous OBSERVED month (naive) AND its exact month − 12 exists
    // in the nation's set (seasonal) — on a sparse series lag(y, 12)
    // would instead grab whatever row sits 12 back, which is exactly
    // the silent-shift bug this pins against
    val monthSets = graft.catalog.Tables(spark, sf).orders
      .join(graft.catalog.Tables(spark, sf).customer,
        col("o_custkey") === col("c_custkey"))
      .join(graft.catalog.Tables(spark, sf).nation,
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        trunc(to_date(col("o_orderdate")), "month").as("month"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .map { case (n, rs) => n -> rs.map(_.getDate(1).toLocalDate).toSet }
    out.foreach { r =>
      val ms = monthSets(r.getString(0))
      val first = ms.min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val expectScored = ms.count(m => m != first && ms.contains(m.minusMonths(12)))
      assert(r.getAs[Long]("n_scored") == expectScored.toLong)
      val (an, as_) = (r.getAs[Long]("ae_naive_cents"),
        r.getAs[Long]("ae_snaive_cents"))
      val expect = if (as_ < an) "seasonal" else if (as_ > an) "naive" else "tie"
      assert(r.getAs[String]("winner") == expect)
    }
  }

  test("trend slope matches double-precision OLS per nation") {
    val out = run("sales_trend_slope").collect()
    assert(out.length > 0)
    val daily = graft.catalog.Tables(spark, sf).orders
      .join(graft.catalog.Tables(spark, sf).customer,
        col("o_custkey") === col("c_custkey"))
      .join(graft.catalog.Tables(spark, sf).nation,
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy(col("nation"), col("x"))
      .agg(sum(col("cents")).as("y"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val pts = daily(r.getString(0)).map(p => (p.getLong(1).toDouble,
        p.getLong(2).toDouble))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getAs[Long]("n_days") == pts.length.toLong)
      assert(math.abs(r.getAs[Long]("slope_e6") - slope * 1e6) <= 2.0,
        s"slope off for ${r.getString(0)}: ${r.getAs[Long]("slope_e6")} vs ${slope * 1e6}")
    }
  }

  test("pareto frontier matches the brute-force skyline") {
    val out = run("pareto_frontier").cache()
    try {
      val pts = graft.catalog.Tables(spark, sf).part
        .groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("size")).collect()
        .map(r => (r.getDouble(0), r.getInt(1)))
      val brute = pts.filter { case (p, sz) =>
        !pts.exists { case (q, qs) => q < p && qs >= sz }
      }.toSet
      val got = out.collect()
        .map(r => (r.getAs[Double]("price"), r.getAs[Int]("size"))).toSet
      assert(got == brute)
      assert(got.nonEmpty)
      // n_parts counts the parts at each frontier point
      val n = out.agg(sum(col("n_parts"))).collect()(0).getLong(0)
      val expect = graft.catalog.Tables(spark, sf).part
        .filter(brute.map { case (p, sz) =>
          col("p_retailprice") === p && col("p_size") === sz
        }.reduce(_ || _)).count()
      assert(n == expect)
    } finally out.unpersist()
  }
}
