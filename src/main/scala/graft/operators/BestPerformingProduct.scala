package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Best performing product" — Spark-native re-expression of the
  * reference's 6-CTE analytical query
  * (`airflow/dags/reviews_ETL.py:93-198`): pick the product with the
  * highest mean review, then report its review-star percentage split
  * (ratio-to-report window, W1), most-ordered day + holiday flag
  * (top-1, O2), and early/late shipment percentages.
  *
  * Mapping onto the testdata star schema: `lineitem` plays both
  * `reviews` (review := floor(l_quantity) % 5 + 1 — a deterministic
  * 1..5 star rating) and `shipments_deliveries` (l_shipdate);
  * `part` plays `dim_products`; the derived [[DateDim]] plays
  * `if_common.dim_dates`. The 5-way join chain J3–J6, aggregates
  * A3–A8, window W1 and top-1 O1/O2 of SURVEY.md §2 are all
  * exercised with the reference's plan shape.
  *
  * Consciously diverged (SURVEY.md §2.10): the reference's
  * `LEFT JOIN … WHERE =` is implemented as the inner join it
  * actually is (§2.10.4); top-1 gets deterministic tie-breaks
  * (product_id / order_date ASC, §2.10.5); ingestion timestamp is a
  * pinned date (§2.10.6).
  *
  * Scale notes: the only full-fact-table consumers are cte1→cte2
  * (one hash aggregate over the join). Everything downstream is
  * filtered to the single best product via a broadcast of the 1-row
  * cte2 before grouping — at 100 TB the per-product branches touch
  * only that product's rows (predicate pushed to the scan via the
  * broadcast join), never re-shuffling the full table. part and the
  * date dim are broadcast; the lineitem⋈orders join is the one real
  * shuffle.
  */
object BestPerformingProduct {
  val IngestionDate = "2022-09-05"

  private def pct(n: Column, d: Column): Column =
    round(lit(100.0) * n / d, 4)

  def apply(lineitem: DataFrame, orders: DataFrame, part: DataFrame): DataFrame = {
    val dim = DateDim.fromOrders(orders)

    // reviews analog (reference staging.reviews, FIXTURES.md §A)
    val reviews = lineitem.select(
      ((floor(col("l_quantity")).cast("int") % 5) + 1).as("review"),
      col("l_partkey").as("product_id"),
      col("l_orderkey").as("order_id"),
      to_date(col("l_shipdate")).as("shipment_date"))

    // CTE_1: 5-way join chain (reviews_ETL.py:94-113)
    val cte1 = reviews
      .join(broadcast(part), col("product_id") === col("p_partkey"))
      .join(orders, col("order_id") === col("o_orderkey"))
      .join(broadcast(dim), to_date(col("o_orderdate")) === col("calendar_dt"))
      .select(
        col("review"), col("product_id"), col("p_name").as("product_name"),
        to_date(col("o_orderdate")).as("order_date"),
        col("working_day"), col("day_of_the_week_num"),
        col("shipment_date"), col("order_id"))
      // cte1 feeds four branches (cte2 + three best-product branches);
      // persist so the lineitem⋈orders shuffle join runs once per
      // action instead of four times. Cheap at bench scale; at 100 TB
      // you would instead materialize cte1 to parquet between stages.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // CTE_2: top-1 product by mean review (reviews_ETL.py:116-124)
    val cte2 = cte1
      .groupBy(col("product_id"), col("product_name"))
      .agg(avg(col("review")).as("avg_raw"),
           sum(col("review")).as("tt_review_points"))
      .orderBy(desc("avg_raw"), asc("product_id"))
      .limit(1)
      .select(col("product_id"), col("product_name"),
              round(col("avg_raw"), 4).as("average"), col("tt_review_points"))

    val bestId = broadcast(cte2.select(col("product_id")))

    // CTE_3 analog: order counts per day for the best product
    // (reviews_ETL.py:127-135 + holiday flag 131)
    val cte3 = cte1
      .join(bestId, Seq("product_id"))
      .groupBy(col("order_date"),
               DateDim.isPublicHoliday(col("working_day"), col("day_of_the_week_num"))
                 .as("is_public_holiday"))
      .agg(count(col("order_id")).as("total"))
    val mostOrdered = cte3
      .orderBy(desc("total"), asc("order_date"))
      .limit(1)
      .select(col("order_date").as("most_ordered_day"), col("is_public_holiday"))

    // CTE_4 analog: star-rating percentage split with ratio-to-report
    // window (reviews_ETL.py:137-149; W1 sum(count(*)) OVER ())
    val starCounts = cte1
      .join(bestId, Seq("product_id"))
      .groupBy(col("review"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total_all", sum(col("cnt")).over(Window.partitionBy()))
    val starPctCols = (1 to 5).map { s =>
      val name = Seq("one", "two", "three", "four", "five")(s - 1)
      pct(sum(when(col("review") === s, col("cnt")).otherwise(0L)),
          max(col("total_all"))).as(s"pct_${name}_star_review")
    }
    val starPcts = starCounts.agg(starPctCols.head, starPctCols.tail: _*)

    // CTE_5/6 analog: early/late shipment percentages
    // (reviews_ETL.py:152-170; late := shipped >= 6 days after order)
    val shipDays = datediff(col("shipment_date"), col("order_date"))
    val shipPcts = cte1
      .join(bestId, Seq("product_id"))
      .agg(
        pct(sum(when(shipDays < 6, 1).otherwise(0)), count(lit(1)))
          .as("pct_early_shipment"),
        pct(sum(when(shipDays >= 6, 1).otherwise(0)), count(lit(1)))
          .as("pct_late_shipment"))

    // CTE_FINAL (reviews_ETL.py:172-198): 1-row × 1-row joins
    cte2
      .crossJoin(mostOrdered)
      .crossJoin(starPcts)
      .crossJoin(shipPcts)
      .select(
        lit(IngestionDate).cast("date").as("ingestion_date"),
        col("product_name"), col("most_ordered_day"), col("is_public_holiday"),
        col("average"), col("tt_review_points"),
        col("pct_one_star_review"), col("pct_two_star_review"),
        col("pct_three_star_review"), col("pct_four_star_review"),
        col("pct_five_star_review"),
        col("pct_early_shipment"), col("pct_late_shipment"))
  }

  val oracle: String =
    s"""WITH ${DateDim.oracleCte},
       |reviews AS (
       |  SELECT (cast(floor(l_quantity) AS int) % 5) + 1 AS review,
       |         l_partkey AS product_id, l_orderkey AS order_id,
       |         cast(l_shipdate AS date) AS shipment_date
       |  FROM lineitem),
       |cte1 AS (
       |  SELECT r.review, r.product_id, p.p_name AS product_name,
       |         cast(o.o_orderdate AS date) AS order_date,
       |         d.working_day, d.day_of_the_week_num,
       |         r.shipment_date, r.order_id
       |  FROM reviews r
       |  JOIN part p ON p.p_partkey = r.product_id
       |  JOIN orders o ON o.o_orderkey = r.order_id
       |  JOIN dim_dates d ON cast(o.o_orderdate AS date) = d.calendar_dt),
       |cte2 AS (
       |  SELECT product_id, product_name,
       |         round(avg(review), 4) AS average,
       |         cast(sum(review) AS bigint) AS tt_review_points
       |  FROM cte1 GROUP BY product_id, product_name
       |  ORDER BY avg(review) DESC, product_id ASC LIMIT 1),
       |cte3 AS (
       |  SELECT c.order_date,
       |         (c.working_day = false AND c.day_of_the_week_num IN (1,2,3,4,5)) AS is_public_holiday,
       |         count(c.order_id) AS total
       |  FROM cte1 c JOIN cte2 b ON c.product_id = b.product_id
       |  GROUP BY 1, 2),
       |most_ordered AS (
       |  SELECT order_date AS most_ordered_day, is_public_holiday
       |  FROM cte3 ORDER BY total DESC, order_date ASC LIMIT 1),
       |star_counts AS (
       |  SELECT c.review, count(*) AS cnt, sum(count(*)) OVER () AS total_all
       |  FROM cte1 c JOIN cte2 b ON c.product_id = b.product_id
       |  GROUP BY c.review),
       |star_pcts AS (
       |  SELECT
       |    round(100.0::DOUBLE * sum(CASE WHEN review = 1 THEN cnt ELSE 0 END) / max(total_all), 4) AS pct_one_star_review,
       |    round(100.0::DOUBLE * sum(CASE WHEN review = 2 THEN cnt ELSE 0 END) / max(total_all), 4) AS pct_two_star_review,
       |    round(100.0::DOUBLE * sum(CASE WHEN review = 3 THEN cnt ELSE 0 END) / max(total_all), 4) AS pct_three_star_review,
       |    round(100.0::DOUBLE * sum(CASE WHEN review = 4 THEN cnt ELSE 0 END) / max(total_all), 4) AS pct_four_star_review,
       |    round(100.0::DOUBLE * sum(CASE WHEN review = 5 THEN cnt ELSE 0 END) / max(total_all), 4) AS pct_five_star_review
       |  FROM star_counts),
       |ship_pcts AS (
       |  SELECT
       |    round(100.0::DOUBLE * sum(CASE WHEN datediff('day', c.order_date, c.shipment_date) < 6 THEN 1 ELSE 0 END) / count(*), 4) AS pct_early_shipment,
       |    round(100.0::DOUBLE * sum(CASE WHEN datediff('day', c.order_date, c.shipment_date) >= 6 THEN 1 ELSE 0 END) / count(*), 4) AS pct_late_shipment
       |  FROM cte1 c JOIN cte2 b ON c.product_id = b.product_id)
       |SELECT cast('$IngestionDate' AS date) AS ingestion_date,
       |       b.product_name, m.most_ordered_day, m.is_public_holiday,
       |       b.average, b.tt_review_points,
       |       s.pct_one_star_review, s.pct_two_star_review,
       |       s.pct_three_star_review, s.pct_four_star_review,
       |       s.pct_five_star_review,
       |       h.pct_early_shipment, h.pct_late_shipment
       |FROM cte2 b, most_ordered m, star_pcts s, ship_pcts h""".stripMargin
}
