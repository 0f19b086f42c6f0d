package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join plans without a shuffle Exchange") {
    val t = Tables(spark, sf)
    Bucketing.writeBucketed(t.lineitem, "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      t.orders.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", buckets = 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed").hint("merge"), Seq("l_orderkey"))
      .groupBy($"l_orderkey").agg(sum($"l_quantity"))

    val plan = joined.queryExecution.executedPlan.toString
    // bucketed SMJ: sort yes, shuffle no
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange in:\n$plan")

    // and the join result is correct
    val expected = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey").count()
    val got = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), Seq("l_orderkey")).count()
    assert(got == expected)
  }
}
