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
