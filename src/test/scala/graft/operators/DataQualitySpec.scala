package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, exact distincts, typed extremes per column") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null),
      (2L, "b"), (null, "a")).toDF("id", "s")
    val p = rows(DataQuality.profile(df, "t"))
    val id = p.find(_("col_name") == "id").get
    assert(id("n_rows") == 4L && id("n_null") == 1L && id("n_distinct") == 2L)
    assert(id("min_num") == 1.0 && id("max_num") == 2.0)
    assert(id("min_str") == null && id("max_str") == null)
    val s = p.find(_("col_name") == "s").get
    assert(s("n_null") == 1L && s("n_distinct") == 2L)
    assert(s("min_str") == "a" && s("max_str") == "b")
    assert(s("min_num") == null)
  }

  test("k-anonymity report matches the hand-computed class census") {
    // QI = (nation, segment, floor(bal/1000)): class sizes 3, 2, 1, 1
    val customer = Seq(
      (1L, 1, "AUTO", 500.0), (2L, 1, "AUTO", 999.0),
      (3L, 1, "AUTO", 0.0),                       // class A: size 3
      (4L, 1, "AUTO", 1500.0), (5L, 1, "AUTO", 1999.0), // class B: size 2
      (6L, 2, "AUTO", 500.0),                     // class C: size 1
      (7L, 1, "BLDG", -500.0)                     // class D: size 1 (bucket -1)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = DataQuality.kAnonymityReport(customer).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // k=2: classes C,D below -> 2 classes, 2 rows at risk
    // k=5: all four classes below -> 7 rows at risk
    assert(got == Map(
      2 -> ((7L, 4L, 2L, 2L, 1L)),
      5 -> ((7L, 4L, 4L, 7L, 1L)),
      10 -> ((7L, 4L, 4L, 7L, 1L))), s"report was $got")
  }

  test("fk orphan report is zero on the conformant testdata and catches a break") {
    val t = graft.catalog.Tables(spark, sf)
    val r = rows(DataQuality.fkOrphans(t))
    assert(r.size == 4 && r.forall(_("n_orphans") == 0L))
    // a deliberately broken child: keys shifted out of the parent range
    val broken = t.lineitem.withColumn("l_orderkey",
      col("l_orderkey") + lit(1000000000L))
    val b = rows(DataQuality.edge("broken", broken, "l_orderkey",
      t.orders, "o_orderkey"))
    assert(b.head("n_orphans") == b.head("n_child_rows"))
    assert(b.head("n_orphans").asInstanceOf[Long] > 0L)
  }
}
