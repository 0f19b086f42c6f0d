package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three analytics transforms on its OWN data model
  * (ReferenceSchemas) — pure `DataFrame => DataFrame`, the API a user
  * of the reference would migrate to. The testdata-mapped variants in
  * `graft.operators` carry the DuckDB-oracle gate; these carry exact
  * reference semantics over reference-shaped inputs.
  *
  * Conscious divergences from the reference SQL (SURVEY.md §2.10):
  * fail-fast instead of swallowed exceptions, pinned `ingestionDate`
  * instead of CURRENT_TIMESTAMP narrowing, deterministic tie-breaks
  * on the two ORDER BY … LIMIT 1 sites, LEFT JOIN + WHERE equality
  * implemented as the inner join it is, and non-integer percentage
  * division (PG numeric semantics, not bigint/bigint).
  */
object ReferenceTransforms {

  val DefaultIngestionDate = "2022-09-05"

  /** Holiday-order pivot (`orders_ETL.py:93-125`): orders ⋈ dim_dates
    * on order_date, filter to non-working weekdays, 12 conditional
    * month sums. dim_dates is broadcast (one row per date).
    */
  def aggPublicHoliday(orders: DataFrame, dimDates: DataFrame,
                       ingestionDate: String = DefaultIngestionDate): DataFrame = {
    val joined = orders
      .join(broadcast(dimDates), col("order_date") === col("calendar_dt"))
      .filter(col("working_day") === false &&
        col("day_of_the_week_num").isin(1, 2, 3, 4, 5))
    val months = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    val pivots = months.zipWithIndex.map { case (m, i) =>
      sum(when(col("month_of_the_year_num") === (i + 1), 1).otherwise(0))
        .as(s"tt_order_hol_$m")
    }
    joined.agg(pivots.head, pivots.tail: _*)
      .select(lit(ingestionDate).cast("date").as("ingestion_date") +:
        months.map(m => col(s"tt_order_hol_$m")): _*)
  }

  /** Late/undelivered shipments (`shipments_ETL.py:84-104`):
    *   late        := shipment_date - order_date >= 6 AND delivery_date IS NULL
    *   undelivered := both dates NULL AND '2022-09-05' - order_date = 15
    * PG `date - date` is integer days → `datediff`.
    */
  def aggShipments(shipments: DataFrame, orders: DataFrame,
                   ingestionDate: String = DefaultIngestionDate): DataFrame = {
    val shipDays = datediff(col("shipment_date"), col("order_date"))
    val ageDays  = datediff(lit("2022-09-05").cast("date"), col("order_date"))
    shipments
      .join(orders, Seq("order_id"))
      .agg(
        sum(when(shipDays >= 6 && col("delivery_date").isNull, 1).otherwise(0))
          .as("tt_late_shipments"),
        sum(when(col("delivery_date").isNull && col("shipment_date").isNull &&
          ageDays === 15, 1).otherwise(0)).as("tt_undelivered_items"))
      .select(lit(ingestionDate).cast("date").as("ingestion_date"),
        col("tt_late_shipments"), col("tt_undelivered_items"))
  }

  /** Best performing product (`reviews_ETL.py:93-198`): 5-way join
    * chain, top-1 product by mean review, star-percentage split via
    * the global ratio-to-report window, most-ordered day + holiday
    * flag, early/late shipment percentages.
    *
    * Reference shipment-status semantics preserved exactly
    * (`reviews_ETL.py:155-156`): late := >= 6 days AND undelivered;
    * early := <= 6 days AND delivered (NOT complements).
    */
  def bestPerformingProduct(reviews: DataFrame, dimProducts: DataFrame,
                            orders: DataFrame, dimDates: DataFrame,
                            shipments: DataFrame,
                            ingestionDate: String = DefaultIngestionDate): DataFrame = {
    // CTE_1 (reviews_ETL.py:94-113) — J3..J6 join chain; dims broadcast
    val cte1 = reviews.as("a")
      .join(broadcast(dimProducts.as("b")), col("a.product_id") === col("b.product_id"))
      .join(orders.as("c"), col("b.product_id") === col("c.product_id").cast("int"))
      .join(broadcast(dimDates.as("d")), col("c.order_date") === col("d.calendar_dt"))
      .join(shipments.as("e"), col("c.order_id") === col("e.order_id"))
      .select(col("a.review"), col("a.product_id"), col("b.product_name"),
        col("c.order_id"), col("c.order_date"), col("d.day_of_the_week_num"),
        col("d.working_day"), col("e.shipment_id"), col("e.shipment_date"),
        col("e.delivery_date"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // CTE_2 (reviews_ETL.py:116-124): top-1 by avg review, tie-break id
    val cte2 = cte1.groupBy(col("product_id"), col("product_name"))
      .agg(avg(col("review")).as("average"), sum(col("review")).as("tt_review_points"))
      .orderBy(desc("average"), asc("product_id")).limit(1)
    val bestId = broadcast(cte2.select(col("product_id")))

    // CTE_3 (reviews_ETL.py:127-135): most-ordered day for the winner
    val mostOrdered = cte1.join(bestId, Seq("product_id"))
      .groupBy(col("order_date"),
        (col("working_day") === false &&
          col("day_of_the_week_num").isin(1, 2, 3, 4, 5)).as("is_public_holiday"))
      .agg(count(col("order_id")).as("total"))
      .orderBy(desc("total"), asc("order_date")).limit(1)
      .select(col("order_date").as("most_ordered_day"), col("is_public_holiday"))

    // CTA_4 (reviews_ETL.py:137-149): star split, ratio-to-report window
    val starCounts = cte1.join(bestId, Seq("product_id"))
      .groupBy(col("review")).agg(count(lit(1)).as("cnt"))
      .withColumn("total_all", sum(col("cnt")).over(Window.partitionBy()))
    val starNames = Seq("one", "two", "three", "four", "five")
    val starCols = (1 to 5).map { s =>
      (sum(when(col("review") === s, col("cnt")).otherwise(0L)) * 100.0 /
        max(col("total_all"))).as(s"pct_${starNames(s - 1)}_star_review")
    }
    val starPcts = starCounts.agg(starCols.head, starCols.tail: _*)

    // CTE_5/6 (reviews_ETL.py:152-170): early/late shipment pcts
    val days = datediff(col("shipment_date"), col("order_date"))
    val shipPcts = cte1.join(bestId, Seq("product_id"))
      .agg(
        (sum(when(days <= 6 && col("delivery_date").isNotNull, 1).otherwise(0)) * 100.0 /
          count(lit(1))).as("pct_early_shipment"),
        (sum(when(days >= 6 && col("delivery_date").isNull, 1).otherwise(0)) * 100.0 /
          count(lit(1))).as("pct_late_shipment"))

    // CTE_FINAL (reviews_ETL.py:172-198)
    cte2.crossJoin(mostOrdered).crossJoin(starPcts).crossJoin(shipPcts)
      .select(
        lit(ingestionDate).cast("date").as("ingestion_date"),
        col("product_name"), col("most_ordered_day"), col("is_public_holiday"),
        col("tt_review_points"),
        col("pct_one_star_review"), col("pct_two_star_review"),
        col("pct_three_star_review"), col("pct_four_star_review"),
        col("pct_five_star_review"),
        col("pct_early_shipment"), col("pct_late_shipment"))
  }
}
