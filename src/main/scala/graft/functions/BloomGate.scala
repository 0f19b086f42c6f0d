package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Column-API access to Spark's built-in Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair the
  * optimizer itself injects for runtime row-level filtering). They
  * are registered only in the INTERNAL function registry, so this
  * exposes them through the session registry the same way the other
  * graft expressions are ([[Md5Hash60.register]]).
  *
  * Shape at scale: `bloom_agg` reduces an arbitrarily large key set
  * to a fixed-size bitmap (numBits/8 bytes, ~1 MB for 2^23 bits), so
  * the bitmap can ship as a broadcast/literal where the key SET
  * cannot; `bloom_might_contain(lit(bytes), key)` then gates a scan
  * map-side with zero shuffle. False positives only widen the gated
  * stream — callers re-verify hits with an exact join, so results
  * stay exact regardless of the filter's error rate.
  */
object BloomGate {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Aggregate a long-typed key column into a serialized Bloom filter
    * (binary). `estItems`/`numBits` must be literals.
    */
  def bloom_agg(key: Column, estItems: Column, numBits: Column): Column =
    call_function("bloom_agg", key, estItems, numBits)

  /** True when `key` (long) may be in the serialized filter. The
    * filter side must be foldable (e.g. `lit(bytes)`).
    */
  def bloom_might_contain(bloom: Column, key: Column): Column =
    call_function("bloom_might_contain", bloom, key)
}
