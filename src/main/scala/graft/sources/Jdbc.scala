package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — literal-parity path for the reference's
  * Postgres staging/analytics tables (`orders_ETL.py:19-30`:
  * psycopg2 connection + COPY). The Spark mapping replaces the
  * single-connection driver marshal with partitioned parallel reads:
  * `partitionColumn/lowerBound/upperBound/numPartitions` splits the
  * table into range predicates, one connection per task.
  *
  * No Postgres exists in this zero-egress environment, but the READ
  * AND WRITE behavior is exercised against embedded Derby (the JDBC
  * engine Spark ships in its own jars) in `JdbcSpec`: append +
  * unpartitioned/partitioned round-trips and subquery pushdown. Only
  * the Postgres driver/dialect specifics remain environment-blocked.
  */
object Jdbc {

  final case class Conn(url: String, user: String, password: String,
                        driver: String = "org.postgresql.Driver")

  /** Partitioned table read. `partitionColumn` must be numeric/date;
    * pick bounds from `SELECT min(c), max(c)` before calling at scale.
    */
  def readTable(spark: SparkSession, conn: Conn, table: String,
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0L, upperBound: Long = 1L,
                numPartitions: Int = 8): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
    partitionColumn.fold(base) { c =>
      base.option("partitionColumn", c)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
    }.load()
  }

  /** Pushdown-friendly query read (subquery as dbtable). */
  def readQuery(spark: SparkSession, conn: Conn, sql: String): DataFrame =
    readTable(spark, conn, s"($sql) AS q")

  /** Append results to a table — the INSERT INTO … SELECT analogue
    * (S8). Batched writes, one connection per partition.
    */
  def append(df: DataFrame, conn: Conn, table: String,
             batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("batchsize", batchSize.toString)
      .mode(SaveMode.Append)
      .save()
}
