package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-provided parquet tables (TESTDATA.md).
  *
  * One accessor per table; everything is a plain parquet scan so
  * Catalyst's vectorized reader, column pruning, and filter pushdown
  * apply. At cluster scale these would be partitioned external tables;
  * the access pattern (declarative scan, no driver materialization)
  * is identical.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` the
    * column surfaces as epoch-nanos LongType and is normalized here to
    * a proper microsecond TimestampType.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
