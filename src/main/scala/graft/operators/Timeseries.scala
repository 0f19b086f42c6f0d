package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Time-series resampling and anomaly operators over the event
  * stream: calendar gap-fill with last-observation-carried-forward,
  * and day-of-week seasonal anomaly flagging in exact integer
  * arithmetic.
  *
  * Scale shape (both queries): the ONLY corpus-sized operation is
  * the first per-(series, day) aggregate, which map-side combines
  * before its shuffle. Everything downstream — the calendar spine,
  * the LOCF windows, the seasonal baselines — runs over relations
  * bounded by |series| × |calendar days| (thousands of rows at ANY
  * corpus size; doubling the data widens the date range, not the
  * per-day relation). Windows partition by the series key, so no
  * global sort ever sees corpus-scale input.
  *
  * Cross-engine exactness: event values are quantized PER ROW with
  * the proven `floor(x·1e6 + 0.5)` primitive before summing, so all
  * aggregates are integer and hash-stable; the anomaly test
  * compares (m·x − S)² against 9·(m·Q − S²) — the z > 3 rule with
  * both sides multiplied out to integers, no division or sqrt.
  */
object Timeseries {

  /** Per-row 1e6 fixed-point quantization — the cross-engine-stable
    * way to hash doubles (BASELINE.md round-8 note).
    */
  private def e6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("long")

  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        e6(col("value")).as("v_e6"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("v_e6")).as("value_e6"))

  /** The reusable resampler: given an already-aggregated relation
    * (seriesCol, day, n_events, value_e6), build each series' dense
    * daily spine, flag the days with no observation, and carry the
    * last observed value forward. Input and output are bounded by
    * |series| × |calendar days| regardless of corpus size (the
    * corpus-scale work happens in the caller's aggregate).
    *
    * LOCF segments are keyed on the OBSERVATION (n_events non-null —
    * a day the left join matched), not on the value: a day with
    * events whose values are all NULL starts its own segment and
    * carries locf_e6 = NULL forward, rather than silently re-serving
    * the previous observation as if nothing had happened (r11 advice
    * — latent with the current fixtures, where observed days always
    * carry a value, but the honest semantics once values go nullable).
    */
  def gapfillLocf(dailyAgg: DataFrame, seriesCol: String): DataFrame = {
    val spine = dailyAgg.groupBy(col(seriesCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(seriesCol), explode(sequence(col("d0"), col("d1"))).as("day"))
    val joined = spine.join(dailyAgg, Seq(seriesCol, "day"), "left")
    val wOrd = Window.partitionBy(col(seriesCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val grouped = joined
      .withColumn("obs_grp", count(col("n_events")).over(wOrd))
    val wGrp = Window.partitionBy(col(seriesCol), col("obs_grp"))
    grouped.select(col(seriesCol), col("day"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      col("n_events").isNull.as("is_gap"),
      col("value_e6").as("observed_e6"),
      max(col("value_e6")).over(wGrp).as("locf_e6"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Calendar gap-fill + LOCF: resample each event-type series onto
    // its full daily calendar (sequence/explode builds the spine from
    // the per-series min/max — never a driver collect), mark the
    // missing days, and carry the last observed daily value forward.
    // The LOCF window is the portable count-non-null grouping trick
    // (a running count of observations names the segment each gap
    // belongs to; the segment max is the carried value), which the
    // DuckDB oracle replays verbatim — no reliance on IGNORE NULLS
    // support. Spine and windows are calendar-bounded (see object
    // doc); the join back to observations is keyed and tiny.
    "timeseries_gapfill" -> ((s, dir) =>
      gapfillLocf(daily(s, dir), "event_type")),

    // The same resampler with DETERMINISTICALLY SYNTHESIZED gaps: the
    // events corpus is gap-free at every sf (TESTDATA), so the plain
    // row's oracle only ever proves the dense case and the actual
    // LOCF carry lived in specs alone (r11 verdict gap #2). Dropping
    // the ~25% of (series, day) rows whose md5 leads with 0–3 BEFORE
    // the spine is built — both engines hash the same strings, so
    // both drop the same days — puts is_gap=true rows and the
    // carried-forward values themselves under the cross-engine hash
    // gate. Same calendar-bounded scale shape as the dense row.
    "timeseries_gapfill_sparse" -> ((s, dir) =>
      gapfillLocf(
        daily(s, dir).filter(
          substring(md5(concat_ws("|", col("event_type"),
            col("day").cast("string"))), 1, 1) > "3"),
        "event_type")),

    // Day-of-week seasonal anomaly days: for each (event_type,
    // weekday) cell the baseline is the mean daily event count over
    // the corpus; a day is anomalous when its count sits more than
    // 3σ from that mean. Both sides are multiplied out so the test
    // is pure bigint — flag ⇔ (m·x − S)² > 9·(m·Q − S²) with
    // m = #days, S = Σx, Q = Σx² in the cell — and the emitted mean
    // is truncating-integer-scaled, so the row hashes identically in
    // DuckDB. The squared/product terms (Q = Σx², S², m·Q, dev²,
    // S·1e6) run in decimal(38,0) / HUGEINT: bigint wraps SILENTLY in
    // Spark where DuckDB raises, so the hash gate would diverge
    // exactly at the overflow (r11 advice) — dev² clears to |dev| <
    // 1e19 this way instead of 3e9. The linear terms (x, S) stay
    // bigint: safe below Σx per cell < 9.2e18, i.e. any corpus whose
    // per-(type, dow) event total fits an int64. Baselines live on a
    // |types|×7 relation; every day is emitted with its flag (a
    // filtered variant can be vacuously green on a well-behaved
    // corpus — the flag column keeps the oracle's teeth).
    "anomaly_days_dow" -> ((s, dir) => {
      val counts = daily(s, dir)
        .select(col("event_type"), col("day"), col("n_events").as("x"),
          dayofweek(col("day")).as("dow"))
      val base = counts.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("m"), sum(col("x")).as("s"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
      val dev = col("m").cast("decimal(38,0)") * col("x") - col("s")
      val bound = (col("m") * col("q") -
        col("s").cast("decimal(38,0)") * col("s")) * lit(9L)
      counts.join(base, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("dow"), col("x"),
          expr("CAST((CAST(s AS DECIMAL(38,0)) * 1000000) DIV m AS BIGINT)")
            .as("mean_e6"),
          (dev * dev > bound).as("is_anomaly"))
    }),

    // CUSUM changepoint detection over each event-type's daily
    // counts. The textbook recurrence s_t = max(0, s_{t-1} + d_t) is
    // sequential — useless as-is on a cluster — but the closed form
    // s_t = S_t − min(0, min_{j≤t} S_j) (prefix sum minus running
    // prefix minimum) turns it into TWO stacked keyed windows, both
    // over the calendar-bounded daily relation. Everything is
    // integer: d_t = m·x_t − S (the deviation scaled by m so no
    // division), and the alarm compares cusum² against 25·(m·Q − S²)
    // — i.e. cusum > 5σ in the same m-scaled units, multiplied out
    // so no sqrt runs. An upward level shift accumulates in s_t
    // until the alarm fires; the statistic resets itself through the
    // running minimum. The squared/product terms (Q = Σx², m·Q, S²,
    // cusum²) run in decimal(38,0) / HUGEINT — Spark bigint wraps
    // silently where DuckDB raises, so the hash gate would diverge at
    // the overflow (r11 advice). The LINEAR recurrence terms (d, S_t,
    // the emitted cusum) stay bigint by contract: safe while
    // m·(Σx per series) < 9.2e18 — the same int64 bound every keyed
    // prefix sum on the board carries, documented here because the
    // streaming twin's Long state shares it.
    "changepoint_cusum" -> ((s, dir) => {
      val counts = daily(s, dir)
        .select(col("event_type"), col("day"), col("n_events").as("x"))
      val base = counts.groupBy(col("event_type"))
        .agg(count(lit(1)).as("m"), sum(col("x")).as("ssum"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      counts.join(base, Seq("event_type"))
        .withColumn("d", col("m") * col("x") - col("ssum"))
        .withColumn("st", sum(col("d")).over(wCum))
        .withColumn("mt", least(min(col("st")).over(wCum), lit(0L)))
        .select(col("event_type"), col("day"), col("x"),
          (col("st") - col("mt")).as("cusum"),
          ((col("st") - col("mt")).cast("decimal(38,0)") *
            (col("st") - col("mt")) >
            lit(25L) * (col("m") * col("q") -
              col("ssum").cast("decimal(38,0)") * col("ssum")))
            .as("alarm"))
    }),

    // Forecast backtest: score the two standard baseline forecasters
    // — naive (last observed month) and seasonal naive (same month
    // last year) — against realized monthly revenue, per nation. The
    // eval pattern every forecasting pipeline needs before trusting a
    // model: only months where BOTH predictors exist are scored (fair
    // comparison), absolute errors accumulate in integer cents, and
    // the winner column is a pure integer comparison. The seasonal
    // baseline is a CALENDAR self-join on month − 12 months, not
    // lag(y, 12): a 12-row lag equals same-month-last-year only when
    // every nation-month is present, and one missing month silently
    // shifts the whole seasonal baseline onto the wrong month with
    // both engines agreeing — the hash gate can't catch semantic
    // drift that's mirrored in the oracle (r11 advice). lag(y, 1)
    // stays for the naive arm — "last OBSERVED value" is that
    // forecaster's definition, gap or no gap. Monthly relation is
    // |nations|×|months|-bounded; the corpus-sized work is one
    // map-side-combined aggregate.
    "forecast_backtest" -> ((s, dir) => {
      val t = Tables(s, dir)
      val monthly = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          trunc(to_date(col("o_orderdate")), "month").as("month"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy(col("nation"), col("month"))
        .agg(sum(col("cents")).as("y"))
      val w = Window.partitionBy(col("nation")).orderBy(col("month"))
      monthly
        .withColumn("naive", lag(col("y"), 1).over(w))
        .join(monthly.select(col("nation"),
          add_months(col("month"), 12).as("month"), col("y").as("snaive")),
          Seq("nation", "month"), "left")
        .filter(col("naive").isNotNull && col("snaive").isNotNull)
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_scored"),
          sum(abs(col("y") - col("naive"))).as("ae_naive_cents"),
          sum(abs(col("y") - col("snaive"))).as("ae_snaive_cents"))
        .withColumn("winner",
          when(col("ae_snaive_cents") < col("ae_naive_cents"), "seasonal")
            .when(col("ae_snaive_cents") > col("ae_naive_cents"), "naive")
            .otherwise("tie"))
    }),

    // Per-nation OLS revenue trend: the least-squares slope of daily
    // order revenue (cents) against the day index, closed-form from
    // five integer moments — slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    // — accumulated per nation in ONE map-side-combined aggregate
    // (x = days since a fixed origin; slope is shift-invariant, so
    // any origin works and no per-nation min pass is needed). The
    // numerator×1e6 runs in decimal(38,0) (it clears bigint at
    // larger SFs) and the final division truncates toward zero
    // EXPLICITLY via sign-split — Spark's DIV truncates while
    // DuckDB's // floors, and a negative slope would round apart by
    // one ulp without it. Moments relation is |nations|-bounded.
    "sales_trend_slope" -> ((s, dir) => {
      val t = Tables(s, dir)
      val daily = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
            .cast("long").as("x"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy(col("nation"), col("x"))
        .agg(sum(col("cents")).as("y"))
      daily.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("num", expr(
          "CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0)) - " +
            "CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))"))
        .withColumn("den", expr("n * sxx - sx * sx"))
        .select(col("nation"), col("n").as("n_days"),
          expr("""CAST(CASE WHEN num < 0
                 |  THEN -(((-num) * 1000000) DIV den)
                 |  ELSE ((num * 1000000) DIV den) END AS BIGINT)"""
            .stripMargin).as("slope_e6"))
    })
  )

  /** Shared oracle body for the dense and synthesized-gap gap-fill
    * rows — `filterSql` splices into the daily CTE (empty = dense).
    */
  private def gapfillOracle(filterSql: String): String =
    s"""WITH daily AS (
       |  SELECT event_type, cast(ts AS date) AS day,
       |    cast(count(*) AS bigint) AS n_events,
       |    cast(sum(cast(floor(value * 1e6 + 0.5) AS bigint)) AS bigint)
       |      AS value_e6
       |  FROM events GROUP BY 1, 2),
       |kept AS (SELECT * FROM daily $filterSql),
       |spine AS (
       |  SELECT event_type, cast(unnest(generate_series(
       |      min(day), max(day), INTERVAL 1 DAY)) AS date) AS day
       |  FROM kept GROUP BY event_type),
       |joined AS (
       |  SELECT s.event_type, s.day, d.n_events, d.value_e6,
       |    count(d.n_events) OVER (PARTITION BY s.event_type
       |      ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS obs_grp
       |  FROM spine s LEFT JOIN kept d
       |    ON s.event_type = d.event_type AND s.day = d.day)
       |SELECT event_type, day,
       |  cast(coalesce(n_events, 0) AS bigint) AS n_events,
       |  n_events IS NULL AS is_gap,
       |  value_e6 AS observed_e6,
       |  max(value_e6) OVER (PARTITION BY event_type, obs_grp) AS locf_e6
       |FROM joined""".stripMargin

  def oracles: Map[String, String] = Map(
    "timeseries_gapfill" -> gapfillOracle(""),
    "timeseries_gapfill_sparse" -> gapfillOracle(
      "WHERE substring(md5(event_type || '|' || cast(day AS varchar)), 1, 1) > '3'"),
    "anomaly_days_dow" ->
      """WITH counts AS (
        |  SELECT event_type, cast(ts AS date) AS day,
        |    cast(count(*) AS bigint) AS x
        |  FROM events GROUP BY 1, 2),
        |withdow AS (
        |  SELECT event_type, day, x, dayofweek(day) + 1 AS dow FROM counts),
        |base AS (
        |  SELECT event_type, dow, cast(count(*) AS bigint) AS m,
        |    cast(sum(x) AS bigint) AS s, sum(x::HUGEINT * x) AS q
        |  FROM withdow GROUP BY 1, 2)
        |SELECT c.event_type, c.day, cast(c.dow AS int) AS dow, c.x,
        |  cast((b.s::HUGEINT * 1000000) // b.m AS bigint) AS mean_e6,
        |  (b.m::HUGEINT * c.x - b.s) * (b.m::HUGEINT * c.x - b.s)
        |    > 9 * (b.m * b.q - b.s::HUGEINT * b.s) AS is_anomaly
        |FROM withdow c JOIN base b
        |  ON c.event_type = b.event_type AND c.dow = b.dow""".stripMargin,
    "changepoint_cusum" ->
      """WITH counts AS (
        |  SELECT event_type, cast(ts AS date) AS day,
        |    cast(count(*) AS bigint) AS x
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, cast(count(*) AS bigint) AS m,
        |    cast(sum(x) AS bigint) AS ssum,
        |    sum(x::HUGEINT * x) AS q
        |  FROM counts GROUP BY 1),
        |pre AS (
        |  SELECT c.event_type, c.day, c.x, b.m, b.ssum, b.q,
        |    cast(sum(b.m * c.x - b.ssum) OVER (PARTITION BY c.event_type
        |      ORDER BY c.day ROWS UNBOUNDED PRECEDING) AS bigint) AS st
        |  FROM counts c JOIN base b ON c.event_type = b.event_type),
        |mn AS (
        |  SELECT *, least(min(st) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS mt
        |  FROM pre)
        |SELECT event_type, day, x,
        |  cast(st - mt AS bigint) AS cusum,
        |  (st::HUGEINT - mt) * (st::HUGEINT - mt)
        |    > 25 * (m * q - ssum::HUGEINT * ssum) AS alarm
        |FROM mn""".stripMargin,
    "forecast_backtest" ->
      """WITH monthly AS (
        |  SELECT n_name AS nation,
        |    cast(date_trunc('month', cast(o_orderdate AS date)) AS date)
        |      AS month,
        |    cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) AS bigint))
        |      AS bigint) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT m.nation, m.month, m.y,
        |    lag(m.y, 1) OVER (PARTITION BY m.nation ORDER BY m.month) AS naive,
        |    p.y AS snaive
        |  FROM monthly m LEFT JOIN monthly p
        |    ON p.nation = m.nation
        |    AND p.month = cast(m.month - INTERVAL 12 MONTH AS date)),
        |sc AS (SELECT * FROM lagged
        |       WHERE naive IS NOT NULL AND snaive IS NOT NULL)
        |SELECT nation, cast(count(*) AS bigint) AS n_scored,
        |  cast(sum(abs(y - naive)) AS bigint) AS ae_naive_cents,
        |  cast(sum(abs(y - snaive)) AS bigint) AS ae_snaive_cents,
        |  CASE WHEN sum(abs(y - snaive)) < sum(abs(y - naive)) THEN 'seasonal'
        |       WHEN sum(abs(y - snaive)) > sum(abs(y - naive)) THEN 'naive'
        |       ELSE 'tie' END AS winner
        |FROM sc GROUP BY nation""".stripMargin,
    "sales_trend_slope" ->
      """WITH daily AS (
        |  SELECT n_name AS nation,
        |    cast(cast(o_orderdate AS date) - DATE '1992-01-01' AS bigint) AS x,
        |    cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) AS bigint))
        |      AS bigint) AS y
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT nation, cast(count(*) AS bigint) AS n,
        |    cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
        |    cast(sum(x * x) AS bigint) AS sxx,
        |    cast(sum(x * y) AS bigint) AS sxy
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT nation, n,
        |    n::HUGEINT * sxy - sx::HUGEINT * sy AS num,
        |    n * sxx - sx * sx AS den
        |  FROM m)
        |SELECT nation, n AS n_days,
        |  cast(CASE WHEN num < 0
        |    THEN -(((-num) * 1000000) // den::HUGEINT)
        |    ELSE ((num * 1000000) // den::HUGEINT) END AS bigint) AS slope_e6
        |FROM f""".stripMargin
  )
}
