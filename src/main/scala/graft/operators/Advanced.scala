package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.Tables

/** Advanced relational operators beyond the reference's surface:
  * batch sessionization, as-of join, rollup, set operations,
  * semi/anti joins, exact percentiles — the rest of what a complete
  * analytics engine offers, each DuckDB-oracle-verified.
  *
  * Scale notes: sessionization and as-of join are single-shuffle
  * window plans (partition by the entity key, order within
  * partition) — state never leaves the executor, no driver
  * involvement, and skew is bounded by per-user event counts. The
  * as-of join is the standard Spark-first composition: tag the two
  * streams, union, and carry the last-seen right-side row forward
  * with an ignore-nulls window — no custom physical operator needed
  * because the semantics decompose onto sort-within-partition.
  */
object Advanced {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private val SessionGapMin = 30

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interval sweep-line: daily backlog of OPEN orders (placed, last
    // line not yet shipped) — the concurrent-intervals operator
    // (inventory over time, active sessions, in-flight requests).
    // Each order contributes +1 at its open date and −1 the day after
    // its close; the daily running sum of deltas IS the backlog. The
    // ONLY ordered-global window runs over the per-day delta
    // relation, which is bounded by the calendar (thousands of rows
    // at any corpus size — date-bounded, not corpus-bounded), after a
    // map-side-combined per-day aggregate; the corpus-sized work is
    // all keyed shuffles. Orders with no shipped line yet never
    // emit a close event — the running count simply stays up, exactly
    // the real semantics.
    "open_orders_timeseries" -> ((s, dir) => {
      val close = Tables(s, dir).lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(max(col("l_shipdate")).as("close_date"))
      val orders = Tables(s, dir).orders
        .join(close, Seq("o_orderkey"), "left")
      val deltas = orders
        .select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
        .unionAll(orders.filter(col("close_date").isNotNull)
          .select(date_add(to_date(col("close_date")), 1).as("day"),
            lit(-1L).as("delta")))
        .groupBy(col("day"))
        .agg(sum(col("delta")).as("net"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_opened"),
          sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_closed"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas
        .withColumn("n_open", sum(col("net")).over(w))
        .select(col("day"), col("n_opened"), col("n_closed"), col("n_open"))
    }),
    // user-behavior Markov transition matrix: P(next event type |
    // current) from per-user event sequences — one user-keyed window
    // (lead) for the consecutive pairs, one map-side-combined count,
    // and the row normalizer rides a window over the AGGREGATED
    // 4×4-ish matrix (bounded by event-type cardinality², never the
    // stream). Probabilities divide exact ints, rounded once.
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables(s, dir).events
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
      val counts = pairs.groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("row_total").cast("double"), 4)
            .as("p"))
    }),

    // Transition dwell times — the TIMING complement of
    // event_transitions' counts: for each (event_type → next_type)
    // step, how long do users sit between the two? Same single
    // user-keyed lead window builds the consecutive pairs (gap in
    // exact integer micros); per-transition p50/p90 round to 4 dp on
    // both engines before comparison, the established interpolated-
    // percentile discipline. The quantile aggregate runs on the
    // |types|²-bounded group set.
    "transition_dwell" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .select(col("user_id"), col("event_type"), col("ts"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
            .as("gap_us"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"),
          round(percentile(col("gap_us").cast("double") / 1e6, lit(0.5)), 4)
            .as("p50_sec"),
          round(percentile(col("gap_us").cast("double") / 1e6, lit(0.9)), 4)
            .as("p90_sec"))
    }),

    // Sequential-pattern MINING (the discovery complement of the
    // fixed-pattern funnels): frequent ordered event-type trigram
    // motifs across user streams, with occurrence and distinct-user
    // support. One user-keyed window (two leads) makes the trigram
    // stream; the motif space is |event types|³-bounded, so the
    // aggregate and the top-20 heap never scale with the corpus.
    "event_motifs" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(desc("n_occurrences"), asc("e1"), asc("e2"), asc("e3"))
        .limit(20)
    }),

    // gap-based sessionization, batch form (streaming twin lives in
    // graft.streaming): flag gaps > 30 min, running-sum the flags
    // into session ids, aggregate per session
    "events_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapUs = SessionGapMin * 60L * 1000000L
      Tables(s, dir).events
        .withColumn("gap_flag",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("gap_flag")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          dsum(col("value"), 2).as("total_value"))
    }),

    // as-of join: for every non-purchase event, the same user's most
    // recent purchase at or before it (union + ignore-nulls window)
    "asof_last_purchase" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables(s, dir).events
        .withColumn("last_purchase_ts",
          last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          col("last_purchase_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_purchase_ts")))
            .as("micros_since_purchase"))
    }),

    // rollup with grouping flags (subtotals + grand total)
    "rollup_revenue" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .select(col("g_flag"), col("g_status"),
          col("l_returnflag"), col("l_linestatus"), col("revenue"), col("cnt"))
    }),

    // CUBE: all subtotal combinations with grouping flags
    "cube_revenue" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .select(col("g_flag"), col("g_status"),
          col("l_returnflag"), col("l_linestatus"), col("revenue"), col("cnt"))
    }),

    // explicit GROUPING SETS: exactly the two one-dimension rollups,
    // no cross terms (cheaper than CUBE when the lattice isn't needed)
    "grouping_sets_revenue" -> ((s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT cast(grouping(l_returnflag) AS int) AS g_flag,
          |  cast(grouping(l_linestatus) AS int) AS g_status,
          |  l_returnflag, l_linestatus,
          |  cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |  count(*) AS cnt
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
    }),

    // INTERSECT / EXCEPT composition over customer segments
    "set_ops_customers" -> ((s, dir) => {
      val t = Tables(s, dir)
      val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val openOrderers = t.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      building.intersect(openOrderers).withColumn("tag", lit("both"))
        .unionAll(building.except(openOrderers).withColumn("tag", lit("building_only")))
    }),

    // EXCEPT ALL / INTERSECT ALL — the multiset (bag) semantics the
    // distinct variants above can't express: multiplicities subtract
    // resp. take the minimum. Spark plans both as aggregate+generate
    // (count per row value, then replicate), no join explosion.
    "set_ops_all" -> ((s, dir) => {
      val t = Tables(s, dir)
      val open = t.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_orderpriority"))
      val finished = t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority"))
      open.exceptAll(finished).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("except_all"))
        .unionAll(
          open.intersectAll(finished).groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"))
            .withColumn("tag", lit("intersect_all")))
    }),

    // left-semi / left-anti joins (EXISTS / NOT EXISTS)
    "semi_anti_parts" -> ((s, dir) => {
      val t = Tables(s, dir)
      val heavy = t.lineitem.filter(col("l_quantity") >= 40)
      val used = t.part.join(heavy, col("p_partkey") === col("l_partkey"), "left_semi")
      val unused = t.part.join(heavy, col("p_partkey") === col("l_partkey"), "left_anti")
      used.agg(count(lit(1)).as("n_parts_heavy"))
        .crossJoin(unused.agg(count(lit(1)).as("n_parts_not_heavy")))
    }),

    // GROUP BY ... HAVING over a fact join (TPC-H Q18 shape)
    "having_large_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150) // HAVING
      big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"), col("total_qty"))
    }),

    // correlated min-per-group pattern (TPC-H Q2 shape) via a window
    // min instead of a correlated subquery re-scan
    "cheapest_per_brand" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
      Tables(s, dir).part
        .withColumn("min_price", min(col("p_retailprice")).over(w))
        .filter(col("p_retailprice") === col("min_price"))
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    }),

    // z-score outliers with exact-decimal moments: mean and variance
    // from decimal Σx and Σx² so the statistics (and therefore the
    // outlier set) are order-independent and engine-identical
    "value_outliers" -> ((s, dir) => {
      val events = Tables(s, dir).events
      val stats = events.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sx"),
        sum((col("value") * col("value")).cast(DecimalType(28, 4))).cast("double")
          .as("sxx"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("variance",
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
      events.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 4).as("z"))
    }),

    // exact interpolated percentiles per group
    "value_percentiles" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.95)), 4).as("p95"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // Robust (MAD-based) outlier counts per event type — the
    // median-absolute-deviation variant of value_outliers' z-score:
    // immune to the outliers it hunts. Two small aggregates (medians
    // per type) + one broadcast join each; deviations are ROUNDED
    // before thresholding on both engines so an interpolation ulp
    // can't flip a row at the boundary.
    "value_outliers_mad" -> ((s, dir) => {
      val events = Tables(s, dir).events
      val med = events.groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 4).as("med"))
      val withDev = events.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", round(abs(col("value") - col("med")), 4))
      val mad = withDev.groupBy(col("event_type"))
        .agg(round(percentile(col("dev"), lit(0.5)), 4).as("mad"))
      withDev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("dev") > lit(3 * 1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
    }),

    // Equi-depth (decile) bucketing of order values — feature binning
    // for training pipelines. Scale shape: exact percentile boundaries
    // in ONE aggregate (not a global-ORDER ntile window, which funnels
    // the whole table through a single window task), broadcast as a
    // 1-row cross join, bucket assignment as a pure map over the
    // boundary array. Boundaries are rounded to 4 dp on BOTH engines
    // so interpolation ulps can't flip a row at a bucket edge.
    "equi_depth_buckets" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val cuts = o.agg(transform(percentile(col("o_totalprice"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)),
        c => round(c, 4)).as("cuts"))
      o.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          (aggregate(transform(col("cuts"),
            c => when(col("o_totalprice") > c, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v) + 1).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
    }),

    // Joint (2D) histogram of order value × line count — the
    // two-column statistics a cost-based optimizer needs to estimate
    // correlated predicates (`price > X AND lines > Y`), where
    // independent per-column histograms multiply into garbage. 16×16
    // equi-width grid: the value axis quantizes against a broadcast
    // 1-row min/max (integer cents, the zorder quantizer), the line
    // count IS an integer. One corpus aggregate per axis input, one
    // grid aggregate out; 256 cells regardless of scale.
    "joint_histogram" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val lines = Tables(s, dir).lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
      val base = o.join(lines, Seq("o_orderkey"))
        .select(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"), least(col("n_lines"), lit(16L)).as("n_lines"))
      val range = base.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      base.crossJoin(broadcast(range))
        .withColumn("vb", expr("((cents - lo) * 15) DIV greatest(1, hi - lo)"))
        .groupBy(col("vb"), col("n_lines"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).as("sum_cents"))
    }),

    // Exact Pearson correlation between price and quantity: all five
    // moments accumulate in exact decimals in ONE pass, the closed
    // form runs in double on the driver-free aggregate row — engine
    // summation order can't perturb the result, unlike corr()'s
    // streaming covariance.
    "price_quantity_corr" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      val x = col("l_extendedprice")
      val y = col("l_quantity")
      l.agg(
        count(lit(1)).cast("double").as("n"),
        sum(x.cast(DecimalType(18, 2))).cast("double").as("sx"),
        sum(y.cast(DecimalType(18, 2))).cast("double").as("sy"),
        sum((x * x).cast(DecimalType(28, 4))).cast("double").as("sxx"),
        sum((y * y).cast(DecimalType(18, 2))).cast("double").as("syy"),
        sum((x * y).cast(DecimalType(28, 4))).cast("double").as("sxy"))
        .select(round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 4)
          .as("corr_price_qty"))
    }),

    // A/B experiment readout with an EXACT significance flag: users
    // hash-split into two arms (md5 parity — deterministic,
    // assignment survives reruns and engine changes), conversion =
    // "ever made a high-value (> $180) purchase" (~26% of users —
    // every user purchases SOMETHING in this corpus, so the plain
    // definition is vacuous), and the two-proportion z-test at 95%
    // (z² > 3.84 = 96/25) multiplied out into one integer
    // inequality: 25·(c₁n₂ − c₂n₁)²·N > 96·C·(N−C)·n₁·n₂ (pooled
    // variance, C = c₁+c₂, N = n₁+n₂). No division, no sqrt, no
    // float — the flag can't flip on an engine ulp. One user-keyed
    // aggregate then one 1-row fold; the wide arithmetic runs in
    // decimal(38,0), whose headroom is N ≈ 3.6e7 users — the left
    // side grows as 25·N⁵/16 worst-case (c₁=n₁, c₂=0), so 38 digits
    // clear at N = (16e38/25)^(1/5), NOT at 1e9 (r11 advice; the
    // earlier claim sized the quadratic factor only). Past that bound
    // Spark's decimal overflow yields NULL `significant` while DuckDB
    // HUGEINT (~1.7e38) raises — a loud stop either way, never a
    // silently wrong flag. The deploy-scale fix is standard: test on
    // counts divided by a common factor (z is scale-free up to the
    // rounding of c/k), or fold the z-test from per-bucket counts the
    // way feature_auc quantizes ranks.
    "ab_test_report" -> ((s, dir) => {
      val arm = pmod(conv(substring(md5(col("user_id").cast("string")), 1, 15),
        16, 10).cast("long"), lit(2L))
      val users = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 180.0,
          1L).otherwise(0L)).as("conv"))
        .withColumn("arm", arm)
      users.agg(
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("c_a"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("c_b"))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          expr("(c_a * 1000000) DIV n_a").as("p_a_e6"),
          expr("(c_b * 1000000) DIV n_b").as("p_b_e6"),
          expr("""25 * POW_D2 * (n_a + n_b) >
                 |  96 * CAST(c_a + c_b AS DECIMAL(38,0)) *
                 |  ((n_a + n_b) - (c_a + c_b)) * n_a * n_b"""
            .stripMargin.replace("POW_D2",
              "(CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a) * " +
                "(CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)"))
            .as("significant"))
    }),

    // Pareto frontier (2D skyline): the price/size points no other
    // part dominates (strictly cheaper with at-least-equal size, or
    // equal price with strictly larger size). The naive formulation
    // is an O(n²) NOT-EXISTS self-join (that's the ORACLE, where
    // DuckDB can afford it); the engine runs the scale-safe
    // two-phase plan: (1) collapse to per-price max size (keyed
    // agg), bucket prices into 256 fixed-width ranges and compute
    // each bucket's max size — a point dominated by ANY earlier
    // bucket's max dies map-side against the broadcast 256-row
    // bucket relation (prices in earlier buckets are strictly
    // cheaper, so the prune is lossless); (2) the exact running-max
    // sweep runs only over the survivors, whose expected size is
    // O(log n) for any non-adversarial distribution — the global
    // window never sees corpus-scale input. Survival is transitive:
    // every pruned dominator is itself dominated by some surviving
    // candidate, so phase 2 over candidates alone is exact.
    "pareto_frontier" -> ((s, dir) => {
      val pts = Tables(s, dir).part
        .groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("size"))
      val nBuckets = 256
      val stats = pts.agg(min(col("price")).as("lo"), max(col("price")).as("hi"))
      val bucketed = pts.crossJoin(broadcast(stats))
        .withColumn("bucket",
          least(lit(nBuckets - 1), floor((col("price") - col("lo")) *
            lit(nBuckets) / (col("hi") - col("lo") + lit(1e-9)))))
        .select(col("price"), col("size"), col("bucket"))
      val wB = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prev = bucketed.groupBy(col("bucket"))
        .agg(max(col("size")).as("bsize"))
        .withColumn("prev_max", max(col("bsize")).over(wB))
        .select(col("bucket"), col("prev_max"))
      val candidates = bucketed.join(broadcast(prev), Seq("bucket"))
        .filter(col("prev_max").isNull || col("size") > col("prev_max"))
      val wP = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = candidates
        .withColumn("run_max", max(col("size")).over(wP))
        .filter(col("run_max").isNull || col("size") > col("run_max"))
        .select(col("price"), col("size"))
      Tables(s, dir).part
        .join(broadcast(frontier),
          col("p_retailprice") === col("price") && col("p_size") === col("size"))
        .groupBy(col("price"), col("size"))
        .agg(count(lit(1)).as("n_parts"))
    })
  )

  def oracles: Map[String, String] = Map(
    "ab_test_report" ->
      """WITH u AS (
        |  SELECT user_id,
        |    ('0x' || substr(md5(user_id::varchar), 1, 15))::bigint % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 180.0
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |agg AS (SELECT
        |  cast(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS bigint) AS n_a,
        |  cast(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS bigint) AS c_a,
        |  cast(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS bigint) AS n_b,
        |  cast(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS bigint) AS c_b
        |  FROM u)
        |SELECT n_a, c_a, n_b, c_b,
        |  cast((c_a * 1000000) // n_a AS bigint) AS p_a_e6,
        |  cast((c_b * 1000000) // n_b AS bigint) AS p_b_e6,
        |  25 * (c_a::HUGEINT * n_b - c_b::HUGEINT * n_a)
        |     * (c_a::HUGEINT * n_b - c_b::HUGEINT * n_a) * (n_a + n_b) >
        |  96 * (c_a + c_b)::HUGEINT * ((n_a + n_b) - (c_a + c_b)) * n_a * n_b
        |    AS significant
        |FROM agg""".stripMargin,
    "pareto_frontier" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS price, max(p_size) AS size
        |  FROM part GROUP BY 1),
        |f AS (
        |  SELECT price, size FROM pts p
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM pts q
        |    WHERE q.price < p.price AND q.size >= p.size))
        |SELECT f.price, cast(f.size AS int) AS size,
        |  cast(count(*) AS bigint) AS n_parts
        |FROM f JOIN part ON p_retailprice = f.price AND p_size = f.size
        |GROUP BY 1, 2""".stripMargin,
    "open_orders_timeseries" ->
      """WITH close AS (
        |  SELECT l_orderkey AS o_orderkey, max(l_shipdate) AS close_date
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT ord.o_orderkey, ord.o_orderdate, c.close_date
        |      FROM orders ord LEFT JOIN close c USING (o_orderkey)),
        |deltas AS (
        |  SELECT day, cast(sum(delta) AS bigint) AS net,
        |    cast(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS bigint) AS n_opened,
        |    cast(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS bigint) AS n_closed
        |  FROM (
        |    SELECT cast(o_orderdate AS date) AS day, 1 AS delta FROM o
        |    UNION ALL
        |    SELECT cast(close_date AS date) + 1 AS day, -1 AS delta FROM o
        |    WHERE close_date IS NOT NULL)
        |  GROUP BY day)
        |SELECT day, n_opened, n_closed,
        |  cast(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS bigint)
        |    AS n_open
        |FROM deltas""".stripMargin,
    "joint_histogram" ->
      """WITH lines AS (
        |  SELECT l_orderkey AS o_orderkey, cast(count(*) AS bigint) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |base AS (
        |  SELECT cast(floor(o_totalprice * 100.0 + 0.5) AS bigint) AS cents,
        |    least(n_lines, 16) AS n_lines
        |  FROM orders JOIN lines USING (o_orderkey)),
        |r AS (SELECT min(cents) AS lo, max(cents) AS hi FROM base)
        |SELECT ((cents - lo) * 15) // greatest(1, hi - lo) AS vb,
        |  cast(n_lines AS bigint) AS n_lines,
        |  cast(count(*) AS bigint) AS n_orders,
        |  cast(sum(cents) AS bigint) AS sum_cents
        |FROM base, r GROUP BY 1, 2""".stripMargin,
    "transition_dwell" ->
      """WITH pairs AS (
        |  SELECT event_type,
        |    lead(event_type) OVER w AS next_type,
        |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type, next_type, cast(count(*) AS bigint) AS n,
        |  round(quantile_cont(gap_us::DOUBLE / 1e6, 0.5), 4) AS p50_sec,
        |  round(quantile_cont(gap_us::DOUBLE / 1e6, 0.9), 4) AS p90_sec
        |FROM pairs WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type""".stripMargin,
    "event_motifs" ->
      """WITH tri AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, cast(count(*) AS bigint) AS n_occurrences,
        |  cast(count(DISTINCT user_id) AS bigint) AS n_users
        |FROM tri WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n_occurrences DESC, e1, e2, e3
        |LIMIT 20""".stripMargin,
    "event_transitions" ->
      """WITH pairs AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type, next_type, cast(count(*) AS bigint) AS n
        |  FROM pairs WHERE next_type IS NOT NULL
        |  GROUP BY event_type, next_type)
        |SELECT event_type, next_type, n,
        |  round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type)::DOUBLE, 4) AS p
        |FROM c""".stripMargin,
    "events_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${SessionGapMin * 60L * 1000000L}
         |         THEN 1 ELSE 0 END AS gap_flag
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT user_id, ts, value,
         |    sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM flagged)
         |SELECT user_id, cast(session_id AS bigint) AS session_id,
         |  cast(count(*) AS bigint) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
         |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "asof_last_purchase" ->
      """SELECT event_id, user_id, ts, event_type, last_purchase_ts,
        |  epoch_us(ts) - epoch_us(last_purchase_ts) AS micros_since_purchase
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS last_purchase_ts
        |  FROM events)
        |WHERE event_type != 'purchase'""".stripMargin,
    "rollup_revenue" ->
      """SELECT cast(grouping(l_returnflag) AS int) AS g_flag,
        |  cast(grouping(l_linestatus) AS int) AS g_status,
        |  l_returnflag, l_linestatus,
        |  cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
        |  cast(count(*) AS bigint) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "cube_revenue" ->
      """SELECT cast(grouping(l_returnflag) AS int) AS g_flag,
        |  cast(grouping(l_linestatus) AS int) AS g_status,
        |  l_returnflag, l_linestatus,
        |  cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
        |  cast(count(*) AS bigint) AS cnt
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "grouping_sets_revenue" ->
      """SELECT cast(grouping(l_returnflag) AS int) AS g_flag,
        |  cast(grouping(l_linestatus) AS int) AS g_status,
        |  l_returnflag, l_linestatus,
        |  cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
        |  cast(count(*) AS bigint) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "set_ops_customers" ->
      """SELECT custkey, 'both' AS tag FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT custkey, 'building_only' AS tag FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin,
    "set_ops_all" ->
      """SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  'except_all' AS tag FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  'intersect_all' AS tag FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY o_orderpriority""".stripMargin,
    "semi_anti_parts" ->
      """SELECT
        |  (SELECT cast(count(*) AS bigint) FROM part
        |   WHERE EXISTS (SELECT 1 FROM lineitem
        |                 WHERE l_partkey = p_partkey AND l_quantity >= 40)) AS n_parts_heavy,
        |  (SELECT cast(count(*) AS bigint) FROM part
        |   WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                     WHERE l_partkey = p_partkey AND l_quantity >= 40)) AS n_parts_not_heavy""".stripMargin,
    "having_large_orders" ->
      """SELECT o_orderkey, o_custkey, cast(o_orderdate AS date) AS order_date, total_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b
        |JOIN orders ON b.l_orderkey = o_orderkey""".stripMargin,
    "cheapest_per_brand" ->
      """SELECT p_brand, p_partkey, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
        |                       WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "value_outliers" ->
      """WITH stats AS (
        |  SELECT event_type, count(*) AS n,
        |    cast(sum(cast(value AS decimal(18,2))) AS double) AS sx,
        |    cast(sum(cast(value * value AS decimal(28,4))) AS double) AS sxx
        |  FROM events GROUP BY event_type),
        |enriched AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    (e.value - s.sx / s.n) / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)) AS z
        |  FROM events e JOIN stats s ON e.event_type = s.event_type)
        |SELECT event_id, event_type, value, round(z, 4) AS z
        |FROM enriched WHERE abs(z) > 3.0""".stripMargin,
    "value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value::DOUBLE, 0.5), 4) AS p50,
        |  round(quantile_cont(value::DOUBLE, 0.95), 4) AS p95,
        |  cast(count(DISTINCT user_id) AS bigint) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "value_outliers_mad" ->
      """WITH med AS (
        |  SELECT event_type,
        |    round(quantile_cont(value::DOUBLE, 0.5), 4) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, med, round(abs(e.value - med), 4) AS dev
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, round(quantile_cont(dev, 0.5), 4) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, d.med, m.mad,
        |  cast(count(*) AS bigint) AS n,
        |  cast(sum(CASE WHEN d.dev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS bigint) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type, d.med, m.mad""".stripMargin,
    "equi_depth_buckets" ->
      """WITH cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(o_totalprice::DOUBLE,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    c -> round(c, 4)) AS cuts
        |  FROM orders),
        |b AS (
        |  SELECT o_totalprice,
        |    1 + list_sum(list_transform(cuts,
        |      c -> CASE WHEN o_totalprice > c THEN 1 ELSE 0 END)) AS bucket
        |  FROM orders, cuts)
        |SELECT cast(bucket AS int) AS bucket,
        |  cast(count(*) AS bigint) AS n_orders,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS sum_price
        |FROM b GROUP BY bucket""".stripMargin,
    "price_quantity_corr" ->
      """WITH m AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sx,
        |    cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sy,
        |    cast(sum(cast(l_extendedprice * l_extendedprice AS decimal(28,4))) AS double) AS sxx,
        |    cast(sum(cast(l_quantity * l_quantity AS decimal(18,2))) AS double) AS syy,
        |    cast(sum(cast(l_extendedprice * l_quantity AS decimal(28,4))) AS double) AS sxy
        |  FROM lineitem)
        |SELECT round((n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) AS corr_price_qty
        |FROM m""".stripMargin
  )
}
