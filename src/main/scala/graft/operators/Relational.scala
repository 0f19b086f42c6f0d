package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.Tables

/** Relational operator coverage pack — one query per remaining row of
  * SURVEY.md §2's inventory (joins J1–J8, aggs A1–A9, window W1,
  * top-k O1/O2, predicates P4–P14), expressed as TPC-H-style analytics
  * over the testdata star schema, each with a DuckDB oracle.
  *
  * Float-safety convention shared with the oracles: money aggregates
  * accumulate in exact decimal (input values have fixed decimal
  * scale), then cast to double once — bit-identical across engines
  * regardless of summation order, which plain double sums are not.
  */
object Relational {

  /** sum(x) with exact decimal accumulation, surfaced as double. */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
  private def sqlDsum(expr: String, scale: Int): String =
    s"cast(sum(cast($expr AS decimal(18,$scale))) AS double)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3 wide group-by agg with avg/sum/count (TPC-H Q1 shape)
    "q1_pricing_summary" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      l.filter(to_date(col("l_shipdate")) <= lit("2001-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
                 * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // P4/P13 range predicates + scalar agg (TPC-H Q6 shape)
    "q6_revenue_forecast" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      l.filter(
          to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1997-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
    }),

    // J2 fact-fact + broadcast dim join, group + top-k (TPC-H Q3 shape)
    // TPC-H Q4 shape: EXISTS(lineitem late) per order → LEFT SEMI
    // join, then count by priority. The semi join shuffles on
    // orderkey and short-circuits per key — never materializing the
    // multiplicity a plain inner join would.
    "q4_priority_count" -> ((s, dir) => {
      val t = Tables(s, dir)
      // testdata lacks commit/receipt dates; 'R'-returned lines play
      // the correlated-EXISTS predicate with the same plan shape
      val late = t.lineitem
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      t.orders
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
                to_date(col("o_orderdate")) < lit("1997-01-01"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q13 shape: per-customer order counts INCLUDING zero
    // (left outer + conditional count), then the distribution of
    // customers per count — the two-level re-aggregation pattern.
    "q13_custdist" -> ((s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.customer
        .join(t.orders.filter(col("o_totalprice") < 100000),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    "q3_top_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(to_date(col("o_orderdate")) < lit("1998-01-01") &&
                to_date(col("l_shipdate")) > lit("1996-01-01"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q7 shape: bidirectional trade volume between two nations
    // — double nation-dim join (supplier's and customer's), a
    // disjunctive nation-pair predicate, yearly grouping. Both
    // nation joins broadcast; the fact chain shuffles on its keys.
    "q7_nation_volume" -> ((s, dir) => {
      val t = Tables(s, dir)
      val sn = t.nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val cn = t.nation.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      t.lineitem
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q8 shape: one nation's market share inside a region for
    // one part type — conditional-numerator / total-denominator on
    // the same aggregate pass, by year.
    "q8_market_share" -> ((s, dir) => {
      val t = Tables(s, dir)
      val sn = t.nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))
      broadcast(t.region.filter(col("r_name") === "ASIA"))
        .join(broadcast(t.nation), col("r_regionkey") === col("n_regionkey"))
        .join(t.customer, col("n_nationkey") === col("c_nationkey"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", vol).otherwise(lit(0)))
            .cast("double") /
          sum(vol).cast("double"), 4).as("mkt_share"))
    }),

    // TPC-H Q10 shape: revenue lost to returned lines per customer in
    // a quarter — 4-way join, wide group-by, top-20 with tie-break.
    "q10_returned_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
                to_date(col("o_orderdate")) < lit("1996-07-01"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q14 shape: promo revenue share over a window — two
    // decimal accumulations in one pass, one division at the end.
    "q14_promo_share" -> ((s, dir) => {
      val t = Tables(s, dir)
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))
      t.lineitem
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
                to_date(col("l_shipdate")) < lit("1996-04-01"))
        .join(broadcast(Tables(s, dir).part),
          col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0)))
              .cast("double") /
            sum(vol).cast("double"), 4).as("promo_share"))
    }),

    // TPC-H Q15 shape: supplier(s) achieving the global max quarterly
    // revenue — agg, then the scalar max as a 1-ROW broadcast joined
    // back (NOT a partition-less window: the per-supplier relation is
    // |suppliers| rows, which at scale would funnel through one
    // window task; the 1-row max broadcasts for free), equality on
    // the exact decimal-derived double.
    "q15_top_supplier" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
                to_date(col("l_shipdate")) < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // TPC-H Q19 shape: disjunction of conjunctive brackets across the
    // join — Catalyst pushes the common p-side/l-side conjuncts below
    // the join and keeps the residual OR as the join filter.
    "q19_bracket_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q22 shape: anti join against orders + a scalar subquery
    // threshold (avg positive balance) — the scalar is a 1-row
    // broadcast cross join, the anti join shuffles on custkey.
    "q22_idle_customers" -> ((s, dir) => {
      val t = Tables(s, dir)
      val avgBal = t.customer.filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
      t.customer
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t.orders.select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal"), 2).as("totacctbal"))
    }),

    // J6-style 6-table join chain (TPC-H Q5 shape)
    "q5_region_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      broadcast(t.region.filter(col("r_name") === "ASIA"))
        .join(broadcast(t.nation), col("r_regionkey") === col("n_regionkey"))
        .join(t.customer, col("n_nationkey") === col("c_nationkey"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(t.supplier,
              col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // W1 ratio-to-report window over aggregated rows
    "window_ratio_report" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pct",
          round(lit(100.0) * col("cnt") / sum(col("cnt")).over(Window.partitionBy()), 4))
    }),

    // A9 SELECT DISTINCT over a join
    "distinct_segments" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment"), col("o_orderpriority"))
        .distinct()
    }),

    // J4/P11 equi-join through an explicit cast chain (VARCHAR::INT)
    "cast_join_parts" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .withColumn("pk_str", col("l_partkey").cast("string"))
        .join(broadcast(t.part), col("pk_str").cast("int") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // O1 top-1 with deterministic tie-break
    "top1_customer" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice"), 2).as("total_spend"))
        .orderBy(desc("total_spend"), asc("o_custkey"))
        .limit(1)
    }),

    // P6 IS NULL via left join against a filtered distinct subquery
    // FULL OUTER reconciliation: per-customer spend in finished vs
    // open orders; customers active on only one side surface with a
    // zero on the other. Both inputs pre-aggregate to one row per key
    // BEFORE the join, so the full-outer shuffle carries |customers|
    // rows, not |orders| — the shape that matters when both sides are
    // fact-scale.
    "full_outer_recon" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val fin = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice"), 2).as("finished_spend"),
          count(lit(1)).as("n_finished"))
      val open = o.filter(col("o_orderstatus") === "O").groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice"), 2).as("open_spend"),
          count(lit(1)).as("n_open"))
      fin.join(open, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("finished_spend"), lit(0.0)).as("finished_spend"),
          coalesce(col("n_finished"), lit(0L)).as("n_finished"),
          coalesce(col("open_spend"), lit(0.0)).as("open_spend"),
          coalesce(col("n_open"), lit(0L)).as("n_open"))
    }),

    // UNPIVOT (wide→long): per-flag measures unstacked into
    // (measure, value) rows via stack() — the melt step feeding any
    // long-format metrics store. The stack runs AFTER the aggregate,
    // so it triples a |flags|-row relation, never the fact table.
    "unpivot_revenue" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"))
        .selectExpr("l_returnflag",
          """stack(3, 'sum_qty', sum_qty,
            |         'sum_base_price', sum_base_price,
            |         'sum_disc_price', sum_disc_price) AS (measure, value)"""
            .stripMargin)
    }),

    "left_join_nulls" -> ((s, dir) => {
      val t = Tables(s, dir)
      val heavy = t.lineitem.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey")).distinct()
      t.orders
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .agg(
          sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_orders_no_heavy"),
          count(lit(1)).as("n_orders"))
    }),

    // time bucketing + multi-agg over the events table
    "events_hourly" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value"), 2).as("sum_value"))
    }),

    // native pivot (the idiomatic form of the reference's manual
    // 12× SUM(CASE WHEN month=m) — SURVEY.md §2.4 A1 notes
    // groupBy().pivot() as the Spark-first alternative; explicit
    // value list keeps it one pass, no distinct-values pre-query)
    "pivot_priority_status" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        .na.fill(0L, Seq("n_f", "n_o", "n_p"))
    }),

    // semi-structured extraction from the JSON-ish props column
    "events_json_extract" -> ((s, dir) => {
      Tables(s, dir).events
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
    }),

    // TPC-H Q9 shape: product-line profit by supplier nation and
    // order year — a LIKE-filtered part dim (broadcast, prunes the
    // fact early), supplier→nation lookup, yearly re-grouping.
    "q9_nation_profit" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.part.filter(col("p_name").contains("gear"))),
          col("l_partkey") === col("p_partkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(to_date(col("o_orderdate"))).as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("profit"))
    }),

    // TPC-H Q11 shape: per-key value vs a global-scalar threshold —
    // the scalar (exact decimal total × fraction) broadcasts into a
    // cross join, so the HAVING-against-subquery never reshuffles
    // the per-supplier aggregate.
    "q11_supplier_share" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      val value = dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
      val perSupp = l.groupBy(col("l_suppkey")).agg(value.as("value"))
      val threshold = l.agg((value * lit(0.001)).as("threshold"))
      perSupp.crossJoin(broadcast(threshold))
        .filter(col("value") > col("threshold"))
        .select(col("l_suppkey"), col("value"))
    }),

    // TPC-H Q12 shape: priority-class conditional counts by line
    // status over the orders⋈lineitem join — the two SUM(CASE WHEN)
    // columns ride one aggregation pass.
    "q12_priority_class" -> ((s, dir) => {
      val t = Tables(s, dir)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
                to_date(col("l_shipdate")) < lit("1997-01-01"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_count"))
    }),

    // TPC-H Q16 shape: distinct-supplier counts per part attribute
    // with a NOT IN exclusion subquery — planned as a broadcast
    // LEFT ANTI join (suppkey is non-null, so NOT IN ≡ anti join).
    "q16_supplier_count" -> ((s, dir) => {
      val t = Tables(s, dir)
      val excluded = t.supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") =!= "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q17 shape: correlated per-part average — expressed as a
    // per-part aggregate joined back to the fact. The sub-average
    // comparison is kept in EXACT integer/decimal arithmetic
    // (qty·2·cnt < sum_qty ⇔ qty < avg/2) so the row set cannot
    // drift on float summation order between engines.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      val lp = t.lineitem.join(
        broadcast(t.part.filter(col("p_brand") === "Brand#11")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      val pa = lp.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 1))).as("sq"),
          count(lit(1)).as("cq"))
      lp.join(pa, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast(DecimalType(18, 1)) * lit(2) * col("cq")
          < col("sq"))
        .agg(dsum(col("l_extendedprice"), 2).as("small_qty_revenue"))
    }),

    // TPC-H Q20 shape: semi join against a HAVING-filtered aggregate
    // subquery (suppliers who shipped > 100 units of any 'small%'
    // part) — IN (GROUP BY … HAVING) ≡ LEFT SEMI on the agg output.
    "q20_excess_suppliers" -> ((s, dir) => {
      val t = Tables(s, dir)
      val heavy = t.lineitem
        .join(broadcast(t.part.filter(col("p_name").startsWith("small"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 1))).as("qty"))
        .filter(col("qty") > 100)
        .select(col("l_suppkey"))
      t.supplier
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    }),

    // TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact —
    // "the only supplier whose lines were returned on a finished
    // multi-supplier order". Both correlated subqueries plan as
    // shuffle SEMI/ANTI joins on orderkey with the suppkey
    // inequality as a residual condition; nothing re-scans per row.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val t = Tables(s, dir)
      val l = t.lineitem
      val l1 = l.filter(col("l_returnflag") === "R")
        .join(t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val otherSupp = l.select(col("l_orderkey").as("ok2"),
        col("l_suppkey").as("sk2"))
      val withOther = l1.join(otherSupp,
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_semi")
      val otherReturned = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      withOther.join(otherReturned,
          col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
          "left_anti")
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q2 shape, adapted: testdata ships no partsupp table, so
    // the part↔supplier cost relation is DERIVED from the fact (min
    // observed unit price per (part, supplier) in lineitem — doubles,
    // so the division is bit-identical across engines). The SHAPE is
    // Q2's: a correlated min-cost scalar subquery per part over a
    // region-restricted supplier set, resolved as aggregate +
    // join-back equality (never a per-row subquery), ranked by
    // account balance with a total-order tie-break. Dims broadcast;
    // the derived partsupp aggregates map-side and shuffles once on
    // its grouping key.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val t = Tables(s, dir)
      val ps = t.lineitem.groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_cost"))
      val eu = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val euCost = ps.join(eu, col("ps_suppkey") === col("s_suppkey"))
      val minCost = euCost.groupBy(col("ps_partkey"))
        .agg(min(col("ps_cost")).as("min_cost"))
      euCost.join(minCost, Seq("ps_partkey"))
        .filter(col("ps_cost") === col("min_cost"))
        .join(broadcast(t.part
            .filter(col("p_type") === "ECONOMY" && col("p_size") <= 10)),
          col("ps_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          round(col("ps_cost"), 4).as("supply_cost"))
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
          asc("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q18 shape: large-volume orders — IN (GROUP BY … HAVING
    // sum(qty) > K) ≡ LEFT SEMI against the aggregated fact, then
    // re-join lineitem + customer and re-aggregate per order. The
    // HAVING side is one partial/final agg shuffled on orderkey; the
    // semi join and the lineitem re-join reuse that same orderkey
    // partitioning (no extra exchange). customer carries NO broadcast
    // hint: it scales with the corpus (unlike the filtered
    // part/supplier dims above), so the join is left to size
    // statistics — broadcast at test SF, shuffle once customer
    // outgrows the threshold. Tie-break on the unique orderkey keeps
    // the LIMIT deterministic.
    "q18_large_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 250)
        .select(col("big_ok"))
      t.orders
        .join(big, col("o_orderkey") === col("big_ok"), "left_semi")
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
         |  sum(l_quantity) / count(*) AS avg_qty,
         |  ${sqlDsum("l_extendedprice", 2)} / count(*) AS avg_price,
         |  ${sqlDsum("l_discount", 2)} / count(*) AS avg_disc,
         |  cast(count(*) AS bigint) AS count_order
         |FROM lineitem
         |WHERE cast(l_shipdate AS date) <= date '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_forecast" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE cast(l_shipdate AS date) >= date '1996-01-01'
         |  AND cast(l_shipdate AS date) < date '1997-01-01'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 24""".stripMargin,
    "q4_priority_count" ->
      """SELECT o_orderpriority, cast(count(*) AS bigint) AS order_count
        |FROM orders
        |WHERE cast(o_orderdate AS date) >= DATE '1996-01-01'
        |  AND cast(o_orderdate AS date) <  DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, cast(count(o_orderkey) AS bigint) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_totalprice < 100000
        |  GROUP BY c_custkey)
        |SELECT c_count, cast(count(*) AS bigint) AS custdist
        |FROM per_cust GROUP BY c_count""".stripMargin,
    "q3_top_orders" ->
s"""SELECT o_orderkey, cast(o_orderdate AS date) AS order_date,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND cast(o_orderdate AS date) < date '1998-01-01'
         |  AND cast(l_shipdate AS date) > date '1996-01-01'
         |GROUP BY o_orderkey, cast(o_orderdate AS date)
         |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  cast(year(cast(l_shipdate AS date)) AS int) AS l_year,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
         |GROUP BY sn.n_name, cn.n_name, year(cast(l_shipdate AS date))""".stripMargin,
    "q8_market_share" ->
      s"""SELECT cast(year(cast(o_orderdate AS date)) AS int) AS o_year,
         |  round(
         |    cast(sum(CASE WHEN sn.n_name = 'NATION_1'
         |      THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
         |      ELSE 0 END) AS double) /
         |    ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}, 4) AS mkt_share
         |FROM region
         |JOIN nation ON r_regionkey = n_regionkey
         |JOIN customer ON n_nationkey = c_nationkey
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |GROUP BY year(cast(o_orderdate AS date))""".stripMargin,
    "q10_returned_revenue" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND cast(o_orderdate AS date) >= date '1996-01-01'
         |  AND cast(o_orderdate AS date) < date '1996-07-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT round(100.0::DOUBLE *
         |  cast(sum(CASE WHEN p_type = 'PROMO'
         |    THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
         |    ELSE 0 END) AS double) /
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}, 4) AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE cast(l_shipdate AS date) >= date '1996-01-01'
         |  AND cast(l_shipdate AS date) < date '1996-04-01'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
         |  FROM lineitem
         |  WHERE cast(l_shipdate AS date) >= date '1996-01-01'
         |    AND cast(l_shipdate AS date) < date '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q19_bracket_revenue" ->
      s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q9_nation_profit" ->
      s"""SELECT n_name AS nation,
         |  cast(year(cast(o_orderdate AS date)) AS int) AS o_year,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY n_name, year(cast(o_orderdate AS date))""".stripMargin,
    "q11_supplier_share" ->
      s"""SELECT l_suppkey,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS value
         |FROM lineitem
         |GROUP BY l_suppkey
         |HAVING ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} >
         |  (SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)}
         |     * 0.001::DOUBLE FROM lineitem)""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS bigint) AS high_count,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS bigint) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE cast(l_shipdate AS date) >= date '1996-01-01'
        |  AND cast(l_shipdate AS date) < date '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_size,
        |  cast(count(DISTINCT l_suppkey) AS bigint) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      s"""WITH lp AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#11'),
         |pa AS (
         |  SELECT l_partkey AS pk,
         |    sum(cast(l_quantity AS decimal(18,1))) AS sq,
         |    cast(count(*) AS bigint) AS cq
         |  FROM lp GROUP BY l_partkey)
         |SELECT ${sqlDsum("l_extendedprice", 2)} AS small_qty_revenue
         |FROM lp JOIN pa ON l_partkey = pk
         |WHERE cast(l_quantity AS decimal(18,1)) * 2 * cq < sq""".stripMargin,
    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(cast(l_quantity AS decimal(18,1))) > 100)""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, cast(count(*) AS bigint) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    min(l_extendedprice / l_quantity) AS ps_cost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |euc AS (SELECT * FROM ps JOIN eu ON ps_suppkey = s_suppkey),
        |mc AS (SELECT ps_partkey, min(ps_cost) AS min_cost FROM euc GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  round(ps_cost, 4) AS supply_cost
        |FROM euc JOIN mc USING (ps_partkey)
        |JOIN part ON ps_partkey = p_partkey
        |WHERE ps_cost = mc.min_cost AND p_type = 'ECONOMY' AND p_size <= 10
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  cast(o_orderdate AS date) AS order_date, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      s"""SELECT c_nationkey, cast(count(*) AS bigint) AS numcust,
         |  ${sqlDsum("c_acctbal", 2)} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (
         |    SELECT ${sqlDsum("c_acctbal", 2)} / count(*)
         |    FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_nationkey""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM region
         |JOIN nation ON r_regionkey = n_regionkey
         |JOIN customer ON n_nationkey = c_nationkey
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,
    "window_ratio_report" ->
      """SELECT l_returnflag, cnt,
        |  round(100.0::DOUBLE * cnt / sum(cnt) OVER (), 4) AS pct
        |FROM (SELECT l_returnflag, cast(count(*) AS bigint) AS cnt
        |      FROM lineitem GROUP BY l_returnflag)""".stripMargin,
    "distinct_segments" ->
      """SELECT DISTINCT c_mktsegment, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "cast_join_parts" ->
      """SELECT p_brand, cast(count(*) AS bigint) AS cnt
        |FROM lineitem
        |JOIN part ON cast(cast(l_partkey AS varchar) AS int) = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "top1_customer" ->
      s"""SELECT o_custkey, ${sqlDsum("o_totalprice", 2)} AS total_spend
         |FROM orders GROUP BY o_custkey
         |ORDER BY total_spend DESC, o_custkey ASC LIMIT 1""".stripMargin,
    "full_outer_recon" ->
      s"""WITH fin AS (
         |  SELECT o_custkey, ${sqlDsum("o_totalprice", 2)} AS finished_spend,
         |    cast(count(*) AS bigint) AS n_finished
         |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         |op AS (
         |  SELECT o_custkey, ${sqlDsum("o_totalprice", 2)} AS open_spend,
         |    cast(count(*) AS bigint) AS n_open
         |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
         |SELECT o_custkey,
         |  coalesce(finished_spend, 0) AS finished_spend,
         |  coalesce(n_finished, 0) AS n_finished,
         |  coalesce(open_spend, 0) AS open_spend,
         |  coalesce(n_open, 0) AS n_open
         |FROM fin FULL OUTER JOIN op USING (o_custkey)""".stripMargin,
    "unpivot_revenue" ->
      s"""WITH agg AS (
         |  SELECT l_returnflag,
         |    ${sqlDsum("l_quantity", 2)} AS sum_qty,
         |    ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
         |    ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
         |UNION ALL
         |SELECT l_returnflag, 'sum_base_price', sum_base_price FROM agg
         |UNION ALL
         |SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM agg""".stripMargin,
    "left_join_nulls" ->
      """SELECT
        |  cast(sum(CASE WHEN h.l_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_orders_no_heavy,
        |  cast(count(*) AS bigint) AS n_orders
        |FROM orders o
        |LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 45) h
        |  ON o.o_orderkey = h.l_orderkey""".stripMargin,
    "events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  cast(count(*) AS bigint) AS cnt,
         |  ${sqlDsum("value", 2)} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "pivot_priority_status" ->
      """SELECT o_orderpriority,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "events_json_extract" ->
      """SELECT k % 10 AS k_bucket, cast(count(*) AS bigint) AS cnt,
        |  cast(sum(k) AS bigint) AS sum_k
        |FROM (SELECT try_cast(regexp_extract(props, '"k": (\d+)', 1) AS int) AS k
        |      FROM events)
        |GROUP BY k % 10""".stripMargin
  )
}
