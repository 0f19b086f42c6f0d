package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-write constraint assertions — Spark doesn't enforce PK/NOT
  * NULL declarations (SURVEY.md §1.4), so the reference's DDL
  * constraints (`create_tables.py:21`, `orders_ETL.py:76`) become
  * explicit distributed checks run after materialization. Each check
  * is a single aggregation returning violation counts; `enforce`
  * throws with the counts so pipelines fail fast on bad loads.
  */
object Constraints {

  final case class Violations(table: String, duplicateKeys: Long, nullRows: Long) {
    def clean: Boolean = duplicateKeys == 0 && nullRows == 0
  }

  /** Count PK duplicates and NOT-NULL violations in one pass each. */
  def check(df: DataFrame, table: String, primaryKey: Seq[String],
            notNull: Seq[String]): Violations = {
    val dupes =
      if (primaryKey.isEmpty) 0L
      else df.groupBy(primaryKey.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    val nulls =
      if (notNull.isEmpty) 0L
      else df.filter(notNull.map(col(_).isNull).reduce(_ || _)).count()
    Violations(table, dupes, nulls)
  }

  /** Fail-fast wrapper for pipeline load stages. */
  def enforce(df: DataFrame, table: String, primaryKey: Seq[String],
              notNull: Seq[String]): Unit = {
    val v = check(df, table, primaryKey, notNull)
    if (!v.clean)
      throw new IllegalStateException(
        s"constraint violations in $table: ${v.duplicateKeys} duplicate " +
          s"primary keys, ${v.nullRows} rows with NULL in NOT NULL columns")
  }
}
