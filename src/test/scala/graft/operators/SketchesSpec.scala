package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct estimates (direct and merged-union) within 5% of exact") {
    val rows = graft.SparkEntry.queries("sketch_distinct_counts")(spark, sf)
      .collect()
    assert(rows.length == 5) // one row per order priority
    rows.foreach { r =>
      assert(r.getAs[Long]("exact") > 0L)
      // the query carries the 5% bound as oracle-pinned booleans
      assert(r.getAs[Boolean]("hll_direct_ok"),
        s"approx_count_distinct off for ${r.get(0)}")
      assert(r.getAs[Boolean]("hll_merged_ok"),
        s"merged HLL union off for ${r.get(0)}")
    }
  }

  test("sketch union over shards equals sketching the whole set (mergeability)") {
    val o = Tables(spark, sf).orders
    val whole = o.agg(
      hll_sketch_estimate(hll_sketch_agg($"o_custkey")).as("e"))
      .head().getLong(0)
    val sharded = o.withColumn("shard", pmod($"o_orderkey", lit(8)))
      .groupBy($"shard").agg(hll_sketch_agg($"o_custkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e"))
      .head().getLong(0)
    // same registers regardless of how the data was split
    assert(whole == sharded, s"$whole vs $sharded")
  }

  test("approx quantiles within rank tolerance of exact percentiles") {
    val rows = graft.SparkEntry.queries("sketch_quantiles")(spark, sf)
      .collect()
    // one scalar row per percentile (the oracle-checkable shape)
    assert(rows.map(_.getAs[Double]("p")).toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { r =>
      // accuracy 10000 → rank error 1/10000; the query's own 2%
      // value tolerance is generous for the smooth price distribution
      assert(r.getAs[Boolean]("approx_within_tol"),
        s"approx quantile at p=${r.getAs[Double]("p")} outside tolerance")
      assert(r.getAs[Double]("exact_q") > 0.0)
    }
    // percentiles of a positive-support distribution are monotone
    val qs = rows.map(_.getAs[Double]("exact_q"))
    assert(qs.sameElements(qs.sorted))
  }

  test("Misra–Gries guarantee: membership above n/(cap+1), estimates in bounds") {
    graft.functions.HeavyHitters.register(spark)
    val cap = 8
    // skewed synthetic stream spread over 32 partitions so partial
    // buffers genuinely merge: item k appears 1000 / 2^k times
    val rows = (0 until 10).flatMap(k =>
      Seq.fill(1000 >> k)(s"item$k")) ++ (0 until 500).map(i => s"tail$i")
    val df = rows.toDF("w").repartition(32)
    val n = rows.size.toLong
    val got = df.agg(graft.functions.HeavyHitters
        .heavy_hitters($"w", cap).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = n / (cap + 1)
    exact.foreach { case (item, tf) =>
      if (tf > slack)
        assert(got.contains(item), s"$item (tf=$tf > n/(cap+1)=$slack) missing")
    }
    got.foreach { case (item, est) =>
      val tf = exact(item)
      assert(est <= tf && est >= tf - slack,
        s"$item estimate $est outside [${tf - slack}, $tf]")
    }
  }

  test("heavy-hitters query: survivors carry exact counts, top token present") {
    val rows = graft.SparkEntry.queries("sketch_heavy_hitters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") <= r.getAs[Long]("tf"),
        "MG estimate must never exceed the true count")
    }
  }

  test("KMV join-cardinality: exact below k, within 3/√k above it") {
    // sf0.001: 150 customers < k=256 → the sketch IS the distinct set
    val small = graft.SparkEntry.queries("sketch_join_cardinality")(spark, sf)
      .collect()(0)
    assert(small.getAs[Long]("est_distinct_a") ==
      small.getAs[Long]("actual_distinct_a"))
    assert(small.getAs[Long]("est_overlap") ==
      small.getAs[Long]("actual_overlap"))
    assert(small.getAs[Long]("est_join_rows") ==
      small.getAs[Long]("actual_join_rows"))
    // sf0.01: 1500 keys > k → the estimator regime; KMV relative
    // error concentrates at ~1/√k ≈ 6.3%, so 3σ-ish ≈ 19%
    val big = graft.SparkEntry.queries("sketch_join_cardinality")(
      spark, "/root/testdata/sf0.01").collect()(0)
    def close(est: Long, actual: Long): Unit =
      assert(math.abs(est - actual) <= actual * 0.19,
        s"KMV estimate $est too far from $actual")
    close(big.getAs[Long]("est_distinct_a"), big.getAs[Long]("actual_distinct_a"))
    close(big.getAs[Long]("est_distinct_b"), big.getAs[Long]("actual_distinct_b"))
    close(big.getAs[Long]("est_overlap"), big.getAs[Long]("actual_overlap"))
    close(big.getAs[Long]("est_join_rows"), big.getAs[Long]("actual_join_rows"))
    assert(big.getAs[Long]("actual_distinct_a") > 256,
      "sf0.01 must exercise the filled-sketch regime")
  }
}
