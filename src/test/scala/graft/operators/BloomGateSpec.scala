package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomGate

class BloomGateSpec extends SparkSpec {

  test("bloom filter has no false negatives over its key set") {
    BloomGate.register(spark)
    import spark.implicits._
    val keys = (1L to 5000L).map(_ * 7919L)
    val bytes = keys.toDF("k")
      .agg(BloomGate.bloom_agg(col("k"), lit(1L << 16), lit(1L << 20)))
      .head.getAs[Array[Byte]](0)
    val missed = keys.toDF("k")
      .filter(!BloomGate.bloom_might_contain(lit(bytes), col("k")))
      .count()
    assert(missed == 0, s"$missed inserted keys reported absent")
  }

  test("bloom-gated decontamination equals the exact broadcast variant") {
    val exact = rows(run("decontaminate")).toSet
    val bloom = rows(run("decontaminate_bloom")).toSet
    assert(bloom == exact)
  }
}
