package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit tests for the three reference-parity transforms on tiny
  * literal inputs with exact expected values (SURVEY.md §5.2.1),
  * plus shape/invariant checks on the sf0.001 tables.
  */
class ParityQuerySpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf(rows: (Int, Int, String)*) =
    rows.toSeq.toDF("o_orderkey", "o_custkey", "d")
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long"),
        to_timestamp($"d").as("o_orderdate"))

  test("agg_public_holiday counts only non-working weekdays, pivoted by month") {
    // 2022-08-25 Thu = holiday; 2022-09-05 Mon = working; 2022-09-25 Sun = weekend
    val orders = ordersDf(
      (1, 1, "2022-08-25"), (2, 1, "2022-08-25"),
      (3, 1, "2022-09-05"), (4, 1, "2022-09-25"),
      (5, 1, "2022-09-01")) // Thu the 1st = holiday
    val out = AggPublicHoliday(orders).collect()(0)
    val byName = out.schema.fieldNames.zip(out.toSeq).toMap
    assert(byName("tt_order_hol_aug") == 2L)
    assert(byName("tt_order_hol_sep") == 1L)
    assert(byName("tt_order_hol_jan") == 0L)
  }

  test("agg_shipments: late boundary at datediff >= 6, undelivered needs open status") {
    val orders = ordersDf((1, 1, "2022-08-01"), (2, 1, "2022-09-01"))
    val lineitem = Seq(
      (1L, "2022-08-06", "F"), // 5 days: not late
      (1L, "2022-08-07", "F"), // 6 days: late
      (2L, "2022-09-03", "O"), // 2 days, open but ordered < 15 days before 2022-09-05
      (1L, "2022-08-20", "O")  // late AND open+old: counts in both
    ).toDF("l_orderkey", "d", "l_linestatus")
      .select($"l_orderkey", to_timestamp($"d").as("l_shipdate"), $"l_linestatus")
    val out = AggShipments(lineitem, orders).collect()(0)
    val byName = out.schema.fieldNames.zip(out.toSeq).toMap
    assert(byName("tt_late_shipments") == 2L)
    assert(byName("tt_undelivered_items") == 1L)
  }

  test("best_performing_product invariants at sf0.001") {
    val out = run("best_performing_product")
    val r = out.collect()
    assert(r.length == 1)
    val m = r(0).schema.fieldNames.zip(r(0).toSeq).toMap
    val pcts = Seq("pct_one_star_review", "pct_two_star_review",
      "pct_three_star_review", "pct_four_star_review", "pct_five_star_review")
      .map(m(_).asInstanceOf[Double])
    assert(math.abs(pcts.sum - 100.0) < 0.01)
    val avg = m("average").asInstanceOf[Double]
    assert(avg >= 1.0 && avg <= 5.0)
    val early = m("pct_early_shipment").asInstanceOf[Double]
    val late = m("pct_late_shipment").asInstanceOf[Double]
    assert(math.abs(early + late - 100.0) < 0.01)
  }

  test("holiday counts bounded by total orders (property)") {
    val t = graft.catalog.Tables(spark, sf)
    val total = t.orders.count()
    val hol = run("agg_public_holiday").collect()(0)
    val sum = hol.toSeq.drop(1).map(_.asInstanceOf[Long]).sum
    assert(sum <= total)
  }
}
