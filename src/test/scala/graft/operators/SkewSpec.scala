package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val right = (1L to 2000L).map(k => (k, s"r$k")).toDF("k", "payload")
    val plain = left.join(right, Seq("k")).select($"k", $"v", $"payload")
    val salted = Skew.saltedJoin(left, right, "k").select($"k", $"v", $"payload")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted two-phase sum equals direct sum") {
    val df = (1 to 5000).map(i => (if (i % 5 == 0) i.toLong else 3L, i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(org.apache.spark.sql.functions.sum($"v").as("sum_v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSumAgg(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    // integral doubles: sums are exact regardless of grouping order
    salted.foreach { case (k, v) => assert(v == direct(k)) }
  }

  test("salted join tolerates map columns (salt skips unhashable types)") {
    // hash() rejects MapType — contentSalt must exclude the map
    // column rather than fail analysis
    val left = (1 to 200).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
      .withColumn("m", map(lit("a"), $"v"))
    val right = (1L to 200L).map(k => (k, s"r$k")).toDF("k", "payload")
    val plain = left.drop("m").join(right, Seq("k")).select($"k", $"v", $"payload")
    val salted = Skew.saltedJoin(left, right, "k").select($"k", $"v", $"payload")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("keySkew reports the hot key") {
    val df = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val r = Skew.keySkew(df, $"k").collect()(0)
    assert(r.getAs[Long]("max_rows") == 900L)
  }
}
