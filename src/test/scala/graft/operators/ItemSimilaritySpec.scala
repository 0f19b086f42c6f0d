package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ItemSimilaritySpec extends SparkSpec {

  test("neighbors are ranked by true cosine² and agree with brute force") {
    val out = run("item_similarity").cache()
    try {
      assert(out.count() > 0)
      // ranks are 1..5, dense and strictly ordered within each item
      val bad = out.filter(col("rank") < 1 || col("rank") > 5).count()
      assert(bad == 0)
      // integer sim2_e6 == floor(cosine²·1e6) recomputed in double
      // (operands small enough that double is exact here)
      val cnts = graft.catalog.Tables(spark, sf).lineitem
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_partkey")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.collect().foreach { r =>
        val nb = r.getAs[Long]("n_both").toDouble
        val na = cnts(r.getAs[Long]("item")).toDouble
        val nn = cnts(r.getAs[Long]("neighbor")).toDouble
        val expect = math.floor(nb * nb * 1e6 / (na * nn)).toLong
        assert(r.getAs[Long]("sim2_e6") == expect,
          s"sim mismatch for ${r.getAs[Long]("item")}->${r.getAs[Long]("neighbor")}")
        assert(r.getAs[Long]("n_item") == na.toLong)
      }
      // per-item ordering: sim2 non-increasing with rank
      val disorder = out.as("x").join(out.as("y"),
          col("x.item") === col("y.item") &&
            col("x.rank") + 1 === col("y.rank") &&
            col("x.sim2_e6") < col("y.sim2_e6"))
        .count()
      assert(disorder == 0)
    } finally out.unpersist()
  }
}
