package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.Tables

/** Table-maintenance and event-attribution operators: MERGE-style
  * upsert semantics without a transactional table format, and
  * time-window attribution joins over the events stream.
  *
  * Scale notes (100 TB):
  * - The upsert is one full-outer shuffle join on the key — the same
  *   plan a MERGE INTO executes under Delta/Iceberg minus the commit
  *   protocol. Both sides pre-aggregate to one row per key BEFORE the
  *   join (map-side combined), so the join input is keys, not facts.
  *   A real deployment would bucket both tables by the key to make
  *   this a zero-shuffle storage-partitioned join — see
  *   `sources/Bucketing.scala`, which proves that plan.
  * - Attribution joins on (user_id) — an equi key — and applies the
  *   time window as a residual predicate, so it's a plain shuffle
  *   hash join with per-user fan-out bounded by per-user event
  *   counts, never a time-bin cross product. The latest-click pick
  *   is max(struct(ts, id)) inside the aggregation — no window, no
  *   second shuffle: the groupBy reuses the join's partitioning.
  */
object Maintenance {

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MERGE INTO target USING source ON key — SCD-1 accumulate:
    // target = 1995–96 per-customer totals, source = 1997+ orders.
    // Matched keys UPDATE (totals add), source-only keys INSERT,
    // target-only keys stay. The action column makes the row
    // provenance auditable, as a MERGE's metrics would be.
    "merge_upsert_customer_totals" -> ((s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("od", to_date(col("o_orderdate")))
      def totals(f: Column): DataFrame = o.filter(f)
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice"), 2).as("total"),
          count(lit(1)).as("n_orders"))
      val target = totals(col("od") < lit("1997-01-01"))
        .select(col("o_custkey"), col("total").as("t_total"),
          col("n_orders").as("t_n"))
      val source = totals(col("od") >= lit("1997-01-01"))
        .select(col("o_custkey"), col("total").as("s_total"),
          col("n_orders").as("s_n"))
      target.join(source, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          round(coalesce(col("t_total"), lit(0.0)) +
            coalesce(col("s_total"), lit(0.0)), 2).as("total"),
          (coalesce(col("t_n"), lit(0L)) + coalesce(col("s_n"), lit(0L)))
            .as("n_orders"),
          when(col("t_total").isNull, "insert")
            .when(col("s_total").isNull, "unchanged")
            .otherwise("update").as("action"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent click within the preceding 30 minutes (ties on ts break
    // by click event_id — max(struct) gives the total order).
    // Purchases with no qualifying click are kept with null credit —
    // the LEFT join preserves the fact side's row count.
    "click_attribution" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val windowUs = 30L * 60L * 1000000L
      purchases.join(clicks,
          col("user_id") === col("c_user") &&
            unix_micros(col("click_ts")) <= unix_micros(col("purchase_ts")) &&
            unix_micros(col("click_ts")) >=
              unix_micros(col("purchase_ts")) - lit(windowUs),
          "left")
        .groupBy(col("purchase_id"), col("user_id"), col("purchase_ts"))
        .agg(max(struct(col("click_ts"), col("click_id"))).as("m"))
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
          col("m.click_id").as("click_id"), col("m.click_ts").as("click_ts"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("m.click_ts")))
            .as("lag_us"))
    }),

    // Position-based (40/20/40) multi-touch attribution — the
    // multi-click generalization of click_attribution's last-touch
    // pick. Each purchase's in-window clicks split one unit of
    // credit: first and last touch get 40% each, the middles share
    // 20%. Credit is ledgered in INTEGER MICRO-SHARES so every
    // purchase's credits sum to exactly 1e6 — the integer-division
    // remainder of the middle share is assigned deterministically to
    // the earliest middle click, the same penny-allocation discipline
    // a billing system uses (a float split neither conserves nor
    // reproduces). Windows partition by purchase (fan-out bounded by
    // clicks-per-user-per-30min); the final per-click rollup reuses
    // the join's user keying.
    "multi_touch_attribution" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val windowUs = 30L * 60L * 1000000L
      val j = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            unix_micros(col("click_ts")) <= unix_micros(col("purchase_ts")) &&
            unix_micros(col("click_ts")) >=
              unix_micros(col("purchase_ts")) - lit(windowUs))
        .select(col("purchase_id"), col("click_id"), col("click_ts"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("purchase_id")).orderBy(col("click_ts"), col("click_id"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("purchase_id"))
      val credit =
        when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("rn") === 1 || col("rn") === col("n"), 400000L)
          .otherwise(expr("200000 DIV (n - 2)") +
            when(col("rn") === 2, expr("200000 % (n - 2)")).otherwise(0L))
      j.withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("credit", credit)
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("credit")).as("credit_e6"))
    }),

    // Z-ORDER layout: Morton-interleave two join/filter dimensions
    // into one clustering key, bucket the key range, and emit each
    // bucket's per-dimension min/max — exactly the footer statistics
    // parquet keeps per file, i.e. the view a multi-dimensional
    // data-skipping read would prune on. At 100 TB the deploy step
    // is `repartitionByRange(N, morton)` + write: because the Morton
    // curve alternates bits of both dimensions, every file then
    // covers ≈ 1/√N of EACH dimension's range (vs 1/N of one and ALL
    // of the other when sorting by a single column), so selective
    // predicates on either dimension — or both — skip most files.
    // This query IS the layout math (quantize → interleave → bucket
    // → per-bucket stats): all integer ops over one scan plus a
    // 1-row range broadcast. The interleave expression is the SAME
    // `sources/Layout.interleave` the write path
    // (`Layout.writeZOrdered`, locality proven by `LayoutSpec`)
    // clusters on — this row puts that shared math under the
    // cross-engine hash gate, with the oracle replaying the
    // bit-spread as the standard mask cascade (x |= x<<8, <<4, <<2,
    // <<1 under 0x00FF00FF/0x0F0F0F0F/0x33333333/0x55555555).
    // Quantization here is pure-integer DIV against a broadcast
    // min/max row (no driver collect, no double rounding to diverge
    // between engines).
    "zorder_layout" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      val stats = l.agg(
        min(col("l_partkey")).as("lox"), max(col("l_partkey")).as("hix"),
        min(col("l_suppkey")).as("loy"), max(col("l_suppkey")).as("hiy"))
      val q = l.select(col("l_partkey"), col("l_suppkey"))
        .crossJoin(broadcast(stats))
        .withColumn("qx", expr("((l_partkey - lox) * 65535) DIV greatest(1, hix - lox)"))
        .withColumn("qy", expr("((l_suppkey - loy) * 65535) DIV greatest(1, hiy - loy)"))
      q.withColumn("morton",
          graft.sources.Layout.interleave(col("qx"), col("qy"), 16))
        .withColumn("bucket", shiftright(col("morton"), 26))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
    })
  )

  def oracles: Map[String, String] = Map(
    "merge_upsert_customer_totals" ->
      """WITH t AS (
        |  SELECT o_custkey,
        |    cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS t_total,
        |    cast(count(*) AS bigint) AS t_n
        |  FROM orders WHERE cast(o_orderdate AS date) < date '1997-01-01'
        |  GROUP BY o_custkey),
        |s AS (
        |  SELECT o_custkey,
        |    cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS s_total,
        |    cast(count(*) AS bigint) AS s_n
        |  FROM orders WHERE cast(o_orderdate AS date) >= date '1997-01-01'
        |  GROUP BY o_custkey)
        |SELECT o_custkey,
        |  round(coalesce(t_total, 0) + coalesce(s_total, 0), 2) AS total,
        |  cast(coalesce(t_n, 0) + coalesce(s_n, 0) AS bigint) AS n_orders,
        |  CASE WHEN t_total IS NULL THEN 'insert'
        |       WHEN s_total IS NULL THEN 'unchanged'
        |       ELSE 'update' END AS action
        |FROM t FULL OUTER JOIN s USING (o_custkey)""".stripMargin,
    "click_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT purchase_id, p.user_id, purchase_ts, click_ts, click_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY click_ts DESC, click_id DESC) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id
        |    AND epoch_us(c.click_ts) <= epoch_us(p.purchase_ts)
        |    AND epoch_us(c.click_ts) >= epoch_us(p.purchase_ts) - 1800000000)
        |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
        |  epoch_us(purchase_ts) - epoch_us(click_ts) AS lag_us
        |FROM j WHERE rn = 1""".stripMargin,
    "multi_touch_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT purchase_id, click_id, click_ts
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND epoch_us(c.click_ts) <= epoch_us(p.purchase_ts)
        |    AND epoch_us(c.click_ts) >= epoch_us(p.purchase_ts) - 1800000000),
        |pos AS (
        |  SELECT purchase_id, click_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY click_ts, click_id) AS rn,
        |    count(*) OVER (PARTITION BY purchase_id) AS n
        |  FROM j),
        |cr AS (
        |  SELECT click_id,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN rn = 1 OR rn = n THEN 400000
        |         ELSE 200000 // (n - 2) +
        |           CASE WHEN rn = 2 THEN 200000 % (n - 2) ELSE 0 END
        |    END AS credit
        |  FROM pos)
        |SELECT click_id, cast(count(*) AS bigint) AS n_purchases,
        |  cast(sum(credit) AS bigint) AS credit_e6
        |FROM cr GROUP BY click_id""".stripMargin,
    "zorder_layout" ->
      """WITH stats AS (
        |  SELECT min(l_partkey) AS lox, max(l_partkey) AS hix,
        |         min(l_suppkey) AS loy, max(l_suppkey) AS hiy
        |  FROM lineitem),
        |q AS (
        |  SELECT l_partkey, l_suppkey,
        |    ((l_partkey - lox) * 65535) // greatest(1, hix - lox) AS qx,
        |    ((l_suppkey - loy) * 65535) // greatest(1, hiy - loy) AS qy
        |  FROM lineitem, stats),
        |s1 AS (SELECT *, (qx | (qx << 8)) & 16711935 AS x1,
        |               (qy | (qy << 8)) & 16711935 AS y1 FROM q),
        |s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |               (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |               (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |               (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
        |SELECT (y4 | (x4 << 1)) >> 26 AS bucket,
        |  cast(count(*) AS bigint) AS n_rows,
        |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
        |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
        |FROM s4 GROUP BY 1""".stripMargin
  )
}
