package graft.catalog

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("clean table passes both checks") {
    val v = Constraints.check(Tables(spark, sf).orders, "orders",
      primaryKey = Seq("o_orderkey"), notNull = Seq("o_orderkey", "o_orderdate"))
    assert(v.clean)
  }

  test("duplicate keys and nulls are counted and enforced") {
    val bad = Seq(
      (Some(1), Some("a")), (Some(1), Some("b")), // dup key
      (Some(2), None), (None, Some("c"))          // null violations
    ).toDF("id", "v")
    val v = Constraints.check(bad, "bad", Seq("id"), Seq("id", "v"))
    assert(v.duplicateKeys == 1)
    assert(v.nullRows == 2)
    val e = intercept[IllegalStateException](
      Constraints.enforce(bad, "bad", Seq("id"), Seq("id", "v")))
    assert(e.getMessage.contains("1 duplicate"))
  }
}
