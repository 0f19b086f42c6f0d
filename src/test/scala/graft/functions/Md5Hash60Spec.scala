package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the composed conv(substring(md5)) form") {
    Md5Hash60.register(spark)
    val docs = Tables(spark, sf).documents
      .select(explode(split($"text", "\\s+")).as("w"))
      .limit(5000)
    val both = docs
      .withColumn("fast", Md5Hash60.md5_hash60($"w"))
      .withColumn("composed", conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
    assert(both.filter($"fast" =!= $"composed").count() == 0)
  }

  test("matches the oracle's hex-parse semantics on edge strings") {
    Md5Hash60.register(spark)
    val edge = Seq("", " ", "héllo wörld", "0", "a" * 1000).toDF("w")
      .withColumn("fast", Md5Hash60.md5_hash60($"w"))
      .withColumn("composed", conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"))
    assert(edge.filter($"fast" =!= $"composed").count() == 0)
    // always non-negative (60-bit)
    assert(edge.filter($"fast" < 0).count() == 0)
  }
}
