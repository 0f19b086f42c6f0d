package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

/** Sketch-based approximations — the cardinality/quantile tools a
  * 100 TB profile pass uses instead of exact shuffles. Not oracle
  * queries (sketch bits differ across engines by design); the specs
  * pin the accuracy contract instead.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL++) lands within 5% of exact") {
    val ev = Tables(spark, sf).events
    val exact = ev.select(countDistinct($"user_id")).head.getLong(0)
    val approx = ev.select(approx_count_distinct($"user_id", rsd = 0.02))
      .head.getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketches merge across partitions: partial-union equals whole-set estimate") {
    val ev = Tables(spark, sf).events
    // same aggregate over a 32-way repartition — merge path exercised;
    // HLL++ estimates are deterministic functions of the value SET, so
    // partitioning must not change the answer
    val whole = ev.select(approx_count_distinct($"user_id", rsd = 0.02))
      .head.getLong(0)
    val parts = ev.repartition(32)
      .select(approx_count_distinct($"user_id", rsd = 0.02)).head.getLong(0)
    assert(whole == parts)
  }

  test("approx_percentile brackets the exact median of order totals") {
    val o = Tables(spark, sf).orders
    val exact = o.select(expr("percentile(o_totalprice, 0.5)")).head.getDouble(0)
    val approx = o.select(
      expr("approx_percentile(o_totalprice, 0.5, 1000)")).head.getDouble(0)
    // accuracy=1000 → rank error ≤ n/1000; at test SF that is a
    // handful of ranks — assert the estimate sits within 2% of exact
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx=$approx exact=$exact")
  }
}
