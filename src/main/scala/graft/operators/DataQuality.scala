package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Tables

/** Data-quality profiling (the Deequ/dbt-test capability surface):
  * a per-column metrics report and a referential-integrity report,
  * both as plain declarative aggregations so they run as ordinary
  * queries at any scale.
  *
  * The reference enforces quality only through Postgres DDL
  * (`create_tables.py:21`: PK + NOT NULL, which Spark doesn't
  * enforce — SURVEY.md §1.4); `catalog.Constraints` already fails
  * pipelines fast on violations. This operator is the REPORTING
  * face: what a data platform publishes about a 100 TB table
  * nightly.
  *
  * Scale shape: one aggregation pass per table (map-side combined to
  * a single row, then a `stack` to per-column rows — driver never
  * sees data). The exact multi-column `count(DISTINCT)` rewrites to
  * one Expand (×n_cols row multiplier) feeding partial aggregates —
  * bounded and shuffle-light, but at extreme widths the approximate
  * path ([[Sketches]]' HLL `sketch_distinct_counts`) is the cheaper
  * report; this report stays exact because the DuckDB oracle pins it.
  */
object DataQuality {

  /** Per-column profile rows for `df`: (tbl, col_name, n_rows,
    * n_null, n_distinct, min_num, max_num, min_str, max_str).
    * Numeric min/max are rounded doubles; string min/max are
    * lexicographic (binary collation in both engines); timestamp
    * columns profile nulls/distincts only (cross-engine text
    * formats differ, so their extremes stay NULL rather than
    * hash-fragile).
    */
  def profile(df: DataFrame, tbl: String): DataFrame = {
    val cols = df.schema.fields
    def numeric(f: StructField): Boolean = f.dataType match {
      case _: LongType | _: IntegerType | _: DoubleType | _: FloatType |
           _: ShortType | _: DecimalType => true
      case _ => false
    }
    // source columns resolve through backtick quoting and the derived
    // aggregate aliases use the field ORDINAL, not the raw name — a
    // column named `a.b` (or carrying a backtick) would otherwise make
    // col() chase a nested path and fail resolution, limiting profile
    // to flat dot-free schemas
    def src(f: StructField): Column =
      col("`" + f.name.replace("`", "``") + "`")
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (f, i) =>
      val c = src(f)
      Seq(
        // count(1) - count(c), not sum(when(isNull)): the sum is NULL
        // over an empty table while the oracle's count arithmetic is 0
        (count(lit(1)) - count(c)).as(s"nn_$i"),
        count_distinct(c).as(s"nd_$i")) ++
        (if (numeric(f))
          Seq(round(min(c).cast("double"), 6).as(s"mn_$i"),
            round(max(c).cast("double"), 6).as(s"mx_$i"))
        else if (f.dataType == StringType)
          Seq(min(c).as(s"ms_$i"), max(c).as(s"xs_$i"))
        else Nil)
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("col_name"),
        col("n_rows"),
        col(s"nn_$i").as("n_null"),
        col(s"nd_$i").as("n_distinct"),
        (if (numeric(f)) col(s"mn_$i")
         else lit(null).cast("double")).as("min_num"),
        (if (numeric(f)) col(s"mx_$i")
         else lit(null).cast("double")).as("max_num"),
        (if (f.dataType == StringType) col(s"ms_$i")
         else lit(null).cast("string")).as("min_str"),
        (if (f.dataType == StringType) col(s"xs_$i")
         else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(lit(tbl).as("tbl"), col("r.*"))
  }

  /** Referential-integrity report: orphan counts for the schema's
    * foreign keys (child rows whose key has no parent), one row per
    * FK edge. Each check is an anti-join on the key — shuffle-hash,
    * nothing corpus-sized broadcast, the same plan a 100 TB conformance
    * job wants.
    */
  def fkOrphans(t: Tables): DataFrame =
    edge("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey",
        t.orders, "o_orderkey")
      .unionAll(edge("lineitem.l_partkey->part", t.lineitem, "l_partkey",
        t.part, "p_partkey"))
      .unionAll(edge("orders.o_custkey->customer", t.orders, "o_custkey",
        t.customer, "c_custkey"))
      .unionAll(edge("customer.c_nationkey->nation", t.customer, "c_nationkey",
        t.nation, "n_nationkey"))

  /** One FK conformance row: orphan and child-row counts for
    * `child.childKey → parent.parentKey`.
    */
  def edge(name: String, child: DataFrame, childKey: String,
           parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct()
        .hint("shuffle_hash"), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    // two 1-row aggregates — the cross join is a 1×1 stitch
    orphans.crossJoin(child.agg(count(lit(1)).as("nc")))
      .select(lit(name).as("fk"), col("n_orphans"),
        col("nc").as("n_child_rows"))
  }

  /** k-anonymity audit over the customer quasi-identifiers
    * (nation, market segment, $1000 account-balance bucket) — the
    * privacy-risk face next to `pii_redaction`: a row is re-
    * identifiable when its quasi-identifier equivalence class holds
    * fewer than k individuals. One report row per k ∈ {2, 5, 10}:
    * class count, classes below k, rows at risk, smallest class.
    *
    * Scale shape: ONE corpus aggregation to the QI-bounded class
    * relation (≤ |nations|·|segments|·|buckets| rows at any corpus
    * size), then a |ks|-way explode and a 3-group aggregate on it —
    * nothing after the first groupBy touches corpus-sized data. The
    * bucket is floor(balance/1000.0): one IEEE division + floor,
    * identical in both engines.
    */
  def kAnonymityReport(customer: DataFrame,
                       ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val classes = customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("sz"))
    classes
      .select(explode(array(ks.map(k => lit(k)): _*)).as("k"), col("sz"))
      .groupBy(col("k"))
      .agg(sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L))
          .as("n_classes_below_k"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        min(col("sz")).as("min_class_size"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile" -> ((s, dir) => {
      val t = Tables(s, dir)
      profile(t.orders, "orders")
        .unionAll(profile(t.customer, "customer"))
    }),
    "dq_fk_orphans" -> ((s, dir) => fkOrphans(Tables(s, dir))),
    // k-anonymity privacy audit over customer quasi-identifiers
    "dq_k_anonymity" -> ((s, dir) =>
      kAnonymityReport(Tables(s, dir).customer))
  )

  /** One UNION ALL branch per profiled column. */
  private def profileOracle(tbl: String,
                            specs: Seq[(String, String)]): String =
    specs.map { case (cname, kind) =>
      val (mn, mx) = kind match {
        case "num" => (s"round(cast(min($cname) AS double), 6)",
          s"round(cast(max($cname) AS double), 6)")
        case _ => ("cast(NULL AS double)", "cast(NULL AS double)")
      }
      val (ms, xs) = kind match {
        case "str" => (s"min($cname)", s"max($cname)")
        case _ => ("cast(NULL AS varchar)", "cast(NULL AS varchar)")
      }
      s"""SELECT '$tbl' AS tbl, '$cname' AS col_name,
         |  cast(count(*) AS bigint) AS n_rows,
         |  cast(count(*) - count($cname) AS bigint) AS n_null,
         |  cast(count(DISTINCT $cname) AS bigint) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num,
         |  $ms AS min_str, $xs AS max_str
         |FROM $tbl""".stripMargin
    }.mkString("\nUNION ALL\n")

  def oracles: Map[String, String] = Map(
    "dq_profile" -> (profileOracle("orders", Seq(
      "o_orderkey" -> "num", "o_custkey" -> "num",
      "o_orderstatus" -> "str", "o_totalprice" -> "num",
      "o_orderdate" -> "ts", "o_orderpriority" -> "str")) +
      "\nUNION ALL\n" +
      profileOracle("customer", Seq(
        "c_custkey" -> "num", "c_name" -> "str", "c_nationkey" -> "num",
        "c_acctbal" -> "num", "c_mktsegment" -> "str"))),
    "dq_fk_orphans" ->
      """SELECT 'lineitem.l_orderkey->orders' AS fk,
        |  cast((SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_orderkey = l.l_orderkey)) AS bigint) AS n_orphans,
        |  cast((SELECT count(*) FROM lineitem) AS bigint) AS n_child_rows
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  cast((SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM part p
        |      WHERE p.p_partkey = l.l_partkey)) AS bigint),
        |  cast((SELECT count(*) FROM lineitem) AS bigint)
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  cast((SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c
        |      WHERE c.c_custkey = o.o_custkey)) AS bigint),
        |  cast((SELECT count(*) FROM orders) AS bigint)
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation',
        |  cast((SELECT count(*) FROM customer c
        |    WHERE NOT EXISTS (SELECT 1 FROM nation n
        |      WHERE n.n_nationkey = c.c_nationkey)) AS bigint),
        |  cast((SELECT count(*) FROM customer) AS bigint)""".stripMargin,
    "dq_k_anonymity" ->
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    cast(floor(c_acctbal / 1000.0) AS bigint) AS bal_bucket,
        |    cast(count(*) AS bigint) AS sz
        |  FROM customer GROUP BY 1, 2, 3),
        |ks AS (SELECT unnest([2, 5, 10]) AS k)
        |SELECT k, cast(sum(sz) AS bigint) AS n_rows,
        |  cast(count(*) AS bigint) AS n_classes,
        |  cast(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS bigint)
        |    AS n_classes_below_k,
        |  cast(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS bigint)
        |    AS n_rows_at_risk,
        |  cast(min(sz) AS bigint) AS min_class_size
        |FROM classes, ks GROUP BY k""".stripMargin
  )
}
