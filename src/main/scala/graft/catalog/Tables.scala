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
  /** events.parquet's `ts` has shipped in several physical shapes
    * across testdata generations; normalize every one of them to a
    * session-tz (UTC-pinned) microsecond TimestampType so downstream
    * operators see one stable type:
    *   - TIMESTAMP(NANOS): rejected by the vectorized reader; with
    *     `spark.sql.legacy.parquet.nanosAsLong` it surfaces as
    *     epoch-nanos LongType and is converted here.
    *   - tz-naive timestamp[us]: Spark 4 infers TIMESTAMP_NTZ (when
    *     `parquet.inferTimestampNTZ` is on), which `unix_micros` and
    *     streaming watermarks reject; cast to TimestampType — under
    *     the UTC session tz the instant is unchanged and matches the
    *     DuckDB oracle's reading of the same file.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
