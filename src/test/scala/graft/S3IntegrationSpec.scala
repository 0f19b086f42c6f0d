package graft

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** r16 verdict item 5: the opt-in real-S3 integration main.
  *
  * Without egress the REAL wire stays env-blocked (documented in
  * S3aSourceSpec), but two things are provable here: (a) the main
  * SKIPS CLEANLY when the env gate is unset — the CI/sandbox path the
  * verdict's done-criterion names — and (b) `S3Integration.runAll`
  * (the exact code path the gated main drives) executes all three
  * parity pipelines end-to-end through `s3a://` URIs against the
  * in-process object store: CSV extract with declared schemas,
  * transform, committed single-file CSV load, all via the Hadoop
  * FileSystem layer.
  */
class S3IntegrationSpec extends SparkSpec {

  test("main skips cleanly when GRAFT_S3_IN/OUT are unset") {
    assert(sys.env.get("GRAFT_S3_IN").isEmpty,
      "test environment must not set GRAFT_S3_IN")
    // must return (no exit, no exception, no session start attempt)
    S3Integration.main(Array.empty)
  }

  test("runAll drives the three parity pipelines end-to-end over s3a://") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[graft.sources.InMemObjectStore].getName)
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.outputcommitter.factory.scheme.s3a", "")
    val in = "s3a://graft-s3it/raw"
    val out = "s3a://graft-s3it/analytics"
    val fs = new Path(in).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, lines: String*): Unit = {
      val o = fs.create(new Path(s"$in/$name.csv"), true)
      o.write(lines.mkString("\n").getBytes("UTF-8")); o.close()
    }
    // FIXTURES.md §A shapes (same rows as PipelineSpec, through s3a)
    put("dim_dates",
      "calendar_dt,year_num,month_of_the_year_num,day_of_the_month_num,day_of_the_week_num,working_day",
      "2022-08-21,2022,8,21,7,false",
      "2022-08-22,2022,8,22,1,true",
      "2022-08-25,2022,8,25,4,false",
      "2022-08-27,2022,8,27,6,false",
      "2022-09-01,2022,9,1,4,false")
    put("orders",
      "order_id,customer_id,order_date,product_id,unit_price,quantity,amount",
      "1,10,2022-08-25,7,5,2,10",
      "2,11,2022-08-22,7,5,1,5",
      "3,12,2022-08-27,8,4,1,4",
      "4,13,2022-09-01,8,4,2,8",
      "5,14,2022-08-21,7,5,1,5")
    put("shipments_deliveries",
      "shipment_id,order_id,shipment_date,delivery_date",
      "100,1,2022-08-30,",
      "101,2,2022-08-28,",
      "102,3,2022-09-03,2022-09-04",
      "103,4,,",
      "104,5,,")
    put("reviews", "review,product_id", "5,7", "5,7", "1,7", "3,8", "3,8")
    put("dim_products", "product_id,product_category,product_name",
      "7,toys,widget", "8,tools,gadget")

    S3Integration.runAll(spark, in, out)

    val best = spark.read.option("header", "true")
      .csv(s"$out/best_performing_product").collect()(0)
    assert(best.getAs[String]("product_name") == "widget")
    val ship = spark.read.option("header", "true")
      .csv(s"$out/agg_shipments").collect()(0)
    assert(ship.getAs[String]("tt_late_shipments") == "1")
    // committed objects only — no _temporary leftovers in the bucket
    val keys = graft.sources.InMemObjectStore.bucketFor("graft-s3it")
      .objects.keySet().toArray.map(_.toString)
    assert(!keys.exists(_.contains("_temporary")), "uncommitted leftovers")
  }
}
