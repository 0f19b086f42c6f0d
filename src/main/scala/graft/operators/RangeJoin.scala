package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Interval/range join — the join shape Spark has no native operator
  * for. A naive non-equi join (`l.ts BETWEEN o.start AND o.end`)
  * plans as BroadcastNestedLoopJoin: an O(n×m) comparison that is the
  * canonical 100 TB query-killer.
  *
  * The scale-safe formulation is bucketed range join: bin both sides
  * by a fixed time bucket sized to the window (7-day windows → 7-day
  * buckets), explode the window side into the (≤2) buckets its
  * interval overlaps, equi-join on the bucket, and apply the exact
  * range predicate as a residual filter. The join shuffles on the
  * bucket key like any hash join — no cartesian pair generation —
  * and each qualifying pair meets exactly once (the point side has
  * exactly one bucket). PlanQualitySpec asserts the plan stays free
  * of nested-loop/cartesian operators.
  */
object RangeJoin {

  private val BucketDays = 7

  /** days-since-epoch bucket index of a timestamp column */
  private def bucketOf(ts: org.apache.spark.sql.Column) =
    floor(datediff(to_date(ts), lit("1970-01-01")) / BucketDays)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per January-1995 order: corpus-wide lineitems shipped inside the
    // order's 7-day window [o_orderdate, o_orderdate + 7d)
    "range_join_shipments" -> ((s, dir) => {
      val t = Tables(s, dir)
      val orders = t.orders
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1995-02-01")))
        .select(col("o_orderkey"), col("o_orderdate"))
        .withColumn("bucket", explode(array_distinct(array(
          bucketOf(col("o_orderdate")),
          bucketOf(col("o_orderdate") + expr("INTERVAL 7 DAYS"))))))
      val ships = t.lineitem.select(col("l_shipdate"))
        .withColumn("bucket", bucketOf(col("l_shipdate")))
      orders.join(ships, Seq("bucket"))
        .filter(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
        .agg(count(lit(1)).as("n_shipped"))
    })
  )

  def oracles: Map[String, String] = Map(
    // DuckDB plans the raw inequality join natively (IEJoin), so the
    // oracle states the semantics directly — same pairs, same counts
    "range_join_shipments" ->
      """SELECT o.o_orderkey, cast(o.o_orderdate AS date) AS o_date,
        |  cast(count(*) AS bigint) AS n_shipped
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1995-02-01'
        |GROUP BY 1, 2""".stripMargin
  )
}
