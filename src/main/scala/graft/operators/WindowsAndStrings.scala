package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.Tables

/** Ordered-window and string-function coverage beyond the
  * reference's single global-frame window (SURVEY.md §2.5 notes the
  * reference uses no ranking/ordered frames — these are the
  * completeness set a migrating user expects).
  *
  * Every ordered window carries a total order (unique key as final
  * tie-break) so results are deterministic and oracle-comparable.
  */
object WindowsAndStrings {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // time-RANGE frame: per-user trailing-hour event count / spend.
    // The frame is keyed on epoch MICROS (not seconds) so peer groups
    // are identical in both engines; the sum accumulates in
    // decimal(18,2) then casts once to double (order-independent),
    // and the average divides the two exact values and rounds once.
    // One shuffle on user_id; the frame scan is a single ordered pass
    // per partition — at 100 TB this is the standard sliding-window
    // feature-engineering shape (no self-join, no explode-per-window).
    "events_moving_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables(s, dir).events
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_events_1h"),
          sum(col("value").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("sum_value_1h"))
        .withColumn("avg_value_1h",
          round(col("sum_value_1h") / col("n_events_1h"), 4))
    }),

    // rank / dense_rank / ntile / lag / running sum per customer
    "window_functions" -> ((s, dir) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir).orders.select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(byPrice).cast("long").as("price_rank"),
        dense_rank().over(byPrice).cast("long").as("price_dense_rank"),
        ntile(4).over(byDate).cast("int").as("date_quartile"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(byDate.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_spend"))
    }),

    // string-function battery over part names
    "string_functions" -> ((s, dir) => {
      Tables(s, dir).part.select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        lpad(col("p_brand"), 12, "_").as("brand_padded"),
        reverse(col("p_type")).as("type_reversed"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_first_word"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("brand_type_lev"))
    })
  )

  def oracles: Map[String, String] = Map(
    "events_moving_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  cast(count(*) OVER w AS bigint) AS n_events_1h,
        |  cast(sum(cast(value AS decimal(18,2))) OVER w AS double) AS sum_value_1h,
        |  round(cast(sum(cast(value AS decimal(18,2))) OVER w AS double)
        |        / count(*) OVER w, 4) AS avg_value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "window_functions" ->
      """SELECT o_custkey, o_orderkey,
        |  cast(rank() OVER wp AS bigint) AS price_rank,
        |  cast(dense_rank() OVER wp AS bigint) AS price_dense_rank,
        |  cast(ntile(4) OVER wd AS int) AS date_quartile,
        |  lag(o_totalprice, 1) OVER wd AS prev_price,
        |  cast(sum(cast(o_totalprice AS decimal(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS double) AS running_spend
        |FROM orders
        |WINDOW
        |  wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
        |  wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "string_functions" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  cast(length(p_name) AS bigint) AS name_len,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  lpad(p_brand, 12, '_') AS brand_padded,
        |  reverse(p_type) AS type_reversed,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  split_part(p_type, ' ', 1) AS type_first_word,
        |  cast(levenshtein(p_brand, p_type) AS bigint) AS brand_type_lev
        |FROM part""".stripMargin
  )
}
