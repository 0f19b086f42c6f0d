package graft.catalog

import graft.SparkSpec

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset pipeline matches untyped aggregation") {
    val ds = Typed.lineitem(spark, sf)
    val typed = ds
      .filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .mapValues(_.l_extendedprice)
      .reduceGroups(_ + _)
      .collect().toMap
    val untyped = Tables(spark, sf).lineitem
      .filter($"l_quantity" > 10)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.sum($"l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) / math.max(1.0, math.abs(v)) < 1e-9)
    }
  }

  test("typed embeddings expose Array[Float] cleanly") {
    val e = Typed.embeddings(spark, sf)
    val first = e.head()
    assert(first.embedding.length == 64)
  }
}
