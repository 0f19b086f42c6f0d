package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE on their join
  * key so every later join/aggregation on that key is co-located —
  * the standard way to amortize the big shuffle across a 100 TB
  * table's whole query workload. A bucketed sort-merge join of two
  * tables bucketed the same way plans with NO Exchange on either
  * side (asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Drops any
    * previous table AND its warehouse directory first — a stale
    * location from an earlier session would otherwise fail the
    * CREATE (the metastore is per-session, the filesystem is not).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
