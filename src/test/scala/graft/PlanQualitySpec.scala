package graft

/** Physical-plan regression guards: the scale-critical plan
  * properties asserted so a refactor can't silently lose pushdown,
  * broadcast, top-k, or partial-aggregation behavior (PLANS.md holds
  * the round-captured evidence; these keep it true).
  */
class PlanQualitySpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q6: all range predicates reach the parquet scan; schema pruned") {
    val p = planOf("q6_revenue_forecast")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(p.contains("LessThanOrEqual(l_discount,0.07)"), "discount range not pushed")
    // pruned read schema: no l_orderkey/l_partkey in the scan
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q5: dimension joins broadcast, no sort-merge at this SF") {
    val p = planOf("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("top-1 queries plan as TakeOrderedAndProject, not global sort") {
    assert(planOf("top1_customer").contains("TakeOrderedAndProject"))
    assert(planOf("best_performing_product").contains("TakeOrderedAndProject"))
  }

  test("heap top-k aggregates partially before the exchange") {
    val p = planOf("ann_topk_agg")
    assert(p.contains("ObjectHashAggregate"))
    // partial + final: the aggregate appears at least twice
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("q1 aggregates with map-side partial combine") {
    val p = planOf("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final HashAggregate")
  }
}
