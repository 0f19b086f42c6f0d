package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/row source-format coverage beyond CSV/parquet/JDBC:
  * ORC (vectorized, predicate-pushdown-capable — the other columnar
  * interchange format) and JSON-lines (schema-on-read landing format;
  * schema always declared, never inferred, per the engine's
  * schema-discipline rule). Avro is intentionally absent: the
  * spark-avro datasource jar is not shipped in this environment.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
