package graft.catalog

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's data model — the engine's
  * source of truth for schema-on-read (SURVEY.md §1.4: never infer in
  * production paths; the reference's pandas inference is transient
  * behavior, not a requirement).
  *
  * Staging DDL: `scripts/create_tables.py:19-51`; dim schemas inferred
  * from usage (`orders_ETL.py:99,103,108-119`, `reviews_ETL.py:97-113`);
  * output DDL: `orders_ETL.py:75-89`, `shipments_ETL.py:75-79`,
  * `reviews_ETL.py:75-88`. Nullability is load-bearing on
  * shipment/delivery dates (`create_tables.py:48-49`) — the
  * late/undelivered predicates depend on it.
  */
object ReferenceSchemas {

  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("order_date", DateType, nullable = false),
    StructField("product_id", StringType, nullable = false), // VARCHAR; cast ::INT at join
    StructField("unit_price", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("amount", IntegerType, nullable = false)))

  val reviews: StructType = StructType(Seq(
    StructField("review", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false)))

  val shipmentsDeliveries: StructType = StructType(Seq(
    StructField("shipment_id", IntegerType, nullable = false),
    StructField("order_id", IntegerType, nullable = false),
    StructField("shipment_date", DateType, nullable = true),
    StructField("delivery_date", DateType, nullable = true)))

  val dimDates: StructType = StructType(Seq(
    StructField("calendar_dt", DateType, nullable = false),
    StructField("year_num", IntegerType, nullable = true),
    StructField("month_of_the_year_num", IntegerType, nullable = false),
    StructField("day_of_the_month_num", IntegerType, nullable = true),
    StructField("day_of_the_week_num", IntegerType, nullable = false),
    StructField("working_day", BooleanType, nullable = false)))

  val dimProducts: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("product_category", StringType, nullable = false),
    StructField("product_name", StringType, nullable = false)))

  val aggPublicHoliday: StructType = StructType(
    StructField("ingestion_date", DateType, nullable = false) +:
      Seq("jan", "feb", "mar", "apr", "may", "jun",
          "jul", "aug", "sep", "oct", "nov", "dec")
        .map(m => StructField(s"tt_order_hol_$m", LongType, nullable = true)))

  val aggShipments: StructType = StructType(Seq(
    StructField("ingestion_date", DateType, nullable = false),
    StructField("tt_late_shipments", LongType, nullable = true),
    StructField("tt_undelivered_items", LongType, nullable = true)))

  val bestPerformingProduct: StructType = StructType(Seq(
    StructField("ingestion_date", DateType, nullable = false),
    StructField("product_name", StringType, nullable = true),
    StructField("most_ordered_day", DateType, nullable = true),
    StructField("is_public_holiday", BooleanType, nullable = true),
    StructField("tt_review_points", LongType, nullable = true),
    StructField("pct_one_star_review", DoubleType, nullable = true),
    StructField("pct_two_star_review", DoubleType, nullable = true),
    StructField("pct_three_star_review", DoubleType, nullable = true),
    StructField("pct_four_star_review", DoubleType, nullable = true),
    StructField("pct_five_star_review", DoubleType, nullable = true),
    StructField("pct_early_shipment", DoubleType, nullable = true),
    StructField("pct_late_shipment", DoubleType, nullable = true)))
}
