package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Mergeable-sketch aggregations: approximate distinct counts (HLL),
  * approximate quantiles, and frequency estimation (count-min). At
  * 100 TB these replace exact shuffles with constant-size state:
  * an exact countDistinct shuffles every distinct value; an HLL
  * sketch is a few KiB per partition, merged associatively — the
  * same pattern Spark's partial aggregation already exploits, but
  * with state independent of cardinality. The Datasketches-backed
  * `hll_sketch_agg` sketches are PERSISTABLE AND RE-MERGEABLE:
  * a daily pipeline stores one sketch per partition-day and answers
  * "distinct users last 90 days" by unioning 90 sketches — no
  * re-scan of the raw data, which is the operational win.
  *
  * Approximate answers can't hash-match a DuckDB oracle (different
  * sketch implementations), so these queries take the driver's
  * rows-only check; `SketchesSpec` pins the error bounds against
  * exact answers instead.
  */
object Sketches {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // per-priority distinct customers: exact vs HLL++ vs a
    // Datasketches HLL union of two disjoint halves — the union
    // estimate demonstrates sketch mergeability (store per-shard
    // sketches, union at read time). Same oracle shape as
    // sketch_quantiles: the exact column hash-matches DuckDB, and
    // each sketch estimate ships as a within-5%-of-exact boolean the
    // oracle pins to TRUE — a drifting sketch flips it and fails the
    // gate (estimates themselves are engine-specific bit patterns).
    "sketch_distinct_counts" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val halves = o.withColumn("half", pmod(col("o_orderkey"), lit(2)))
      val shard = halves.groupBy(col("o_orderpriority"), col("half"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = shard.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("hll_merged"))
      def within5(est: org.apache.spark.sql.Column,
                  exact: org.apache.spark.sql.Column) =
        abs(est.cast("double") - exact.cast("double")) <=
          exact.cast("double") * lit(0.05)
      o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("hll_direct"))
        .join(merged, Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("exact"),
          within5(col("hll_direct"), col("exact")).as("hll_direct_ok"),
          within5(col("hll_merged"), col("exact")).as("hll_merged_ok"))
    }),

    // Misra–Gries heavy hitters over the token stream vs the exact
    // counts: the MG summary keeps ≤ capacity counters per partition
    // and merges associatively (the exact formulation shuffles the
    // whole distinct-token relation); survivors join back against
    // the exact counts — candidates-then-verify, so the output
    // carries both the estimate and the truth. MG is EXACT whenever
    // capacity ≥ the true distinct count (no decrement ever fires);
    // this corpus has ~31 distinct tokens, so capacity 48 makes the
    // query bit-oracle-checkable (est = tf), while `SketchesSpec`
    // pins the lossy-regime guarantee on a skewed synthetic stream
    // where capacity ≪ distinct items.
    "sketch_heavy_hitters" -> ((s, dir) => {
      graft.functions.HeavyHitters.register(s)
      val toks = Tables(s, dir).documents
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      val mg = toks
        .agg(graft.functions.HeavyHitters.heavy_hitters(col("w"), 48).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("w"), col("e.est").as("est"))
      val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("tf"))
      mg.join(exact, Seq("w"))
        .orderBy(desc("tf"), asc("w"))
        .limit(20)
        .select(col("w"), col("tf"), col("est"))
    }),

    // streaming-friendly quantiles: one pass, bounded state, vs the
    // exact percentiles. Shaped as one row per percentile with scalar
    // columns: the exact part hash-matches the oracle bit-for-bit and
    // the approx part is asserted within tolerance as a boolean (the
    // sketch itself is engine-specific, so its raw estimate can't
    // hash-match — the contract "within 2% of exact" can).
    "sketch_quantiles" -> ((s, dir) => {
      val ps = Seq(0.5, 0.9, 0.99)
      val pArr = array(ps.map(lit): _*)
      val l = Tables(s, dir).lineitem
      l.agg(
        percentile_approx(col("l_extendedprice"), pArr, lit(10000)).as("approx_q"),
        percentile(col("l_extendedprice"), pArr).as("exact_q"),
        count(lit(1)).as("n"))
        .select(col("approx_q"), col("exact_q"), col("n"),
          explode(array(lit(1), lit(2), lit(3))).as("i"))
        .select(
          element_at(pArr, col("i")).as("p"),
          round(element_at(col("exact_q"), col("i")), 4).as("exact_q"),
          (abs(element_at(col("approx_q"), col("i")) - element_at(col("exact_q"), col("i")))
            <= abs(element_at(col("exact_q"), col("i"))) * 0.02).as("approx_within_tol"),
          col("n"))
        .orderBy(col("p"))
    }),

    // KMV (k-minimum-values) distinct sketches driving a JOIN-SIZE
    // ESTIMATE — the "plan before you execute" primitive: at 100 TB
    // the optimizer wants |orders ⋈ customer| before paying the
    // shuffle, and KMV delivers it from two TakeOrdered(k) passes
    // (per-partition k-heaps, k rows to the driver — never the key
    // relation). Unlike HLL, KMV is DETERMINISTIC given the hash, so
    // the whole estimator sits under the cross-engine hash gate:
    // h = 40-bit md5 prefix (integer arithmetic stays exact in
    // bigint; a production deploy widens to 60 bits and decimal),
    // D̂ = (k−1)·2⁴⁰ DIV h_k when the sketch fills (exact count
    // below k), Jaccard from the k-min union sketch's members seen
    // on both sides, overlap = Ĵ·D̂_union, join rows =
    // overlap · |orders| / D̂_A (customer side is unique-keyed).
    // Exact companions ride along for the audit, like
    // ann_recall_report.
    "sketch_join_cardinality" -> ((s, dir) => {
      val k = 256
      val kmvScale = 255L * (1L << 40) // (k-1)·2^40
      val t = Tables(s, dir)
      def hashes(df: DataFrame, c: String): DataFrame =
        df.select(col(c).cast("long").as("key")).distinct()
          .select(conv(substring(md5(col("key").cast("string")), 1, 10), 16, 10)
            .cast("long").as("h"))
      def est(h: DataFrame, name: String): DataFrame =
        h.orderBy(col("h")).limit(k)
          .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
          .select(when(col("n") < k, col("n"))
            .otherwise(expr(s"$kmvScale DIV hk")).as(name))
      val hA = hashes(t.orders, "o_custkey")
      val hB = hashes(t.customer, "c_custkey")
      val sU = hA.unionAll(hB).distinct().orderBy(col("h")).limit(k)
      val uStats = sU
        .join(hA.withColumnRenamed("h", "ha"), col("h") === col("ha"), "left")
        .join(hB.withColumnRenamed("h", "hb"), col("h") === col("hb"), "left")
        .agg(count(lit(1)).as("su_n"), max(col("h")).as("hk"),
          sum(when(col("ha").isNotNull && col("hb").isNotNull, 1L)
            .otherwise(0L)).as("j"))
        .select(col("su_n"), col("j"),
          when(col("su_n") < k, col("su_n"))
            .otherwise(expr(s"$kmvScale DIV hk")).as("est_union"))
      val actuals = t.orders.agg(
          countDistinct(col("o_custkey")).as("actual_distinct_a"),
          count(lit(1)).as("n_orders"))
        .crossJoin(t.customer.agg(
          countDistinct(col("c_custkey")).as("actual_distinct_b")))
        .crossJoin(t.orders.select(col("o_custkey")).distinct()
          .join(t.customer, col("o_custkey") === col("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("actual_overlap")))
        .crossJoin(t.orders.join(t.customer,
            col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("actual_join_rows")))
      est(hA, "est_distinct_a")
        .crossJoin(est(hB, "est_distinct_b"))
        .crossJoin(uStats)
        .crossJoin(actuals)
        .withColumn("est_overlap", expr("(j * est_union) DIV su_n"))
        .withColumn("est_join_rows",
          expr("(est_overlap * n_orders) DIV est_distinct_a"))
        .select(col("est_distinct_a"), col("est_distinct_b"),
          col("est_union"), col("est_overlap"), col("est_join_rows"),
          col("actual_distinct_a"), col("actual_distinct_b"),
          col("actual_overlap"), col("actual_join_rows"))
    })
  )

  /** Sketch BITS are engine-specific, but every sketch query is
    * still oracle-checked: the exact companion columns hash-match
    * DuckDB and each estimate ships as a within-tolerance boolean
    * the oracle pins to TRUE (a drifting sketch fails the gate).
    * The MG heavy-hitters query is additionally bit-checkable
    * because its capacity exceeds this corpus's distinct-token
    * count (see the query comment): est = tf exactly.
    * [[SketchesSpec]] separately pins the lossy-regime bounds.
    */
  def oracles: Map[String, String] = Map(
    "sketch_distinct_counts" ->
      """SELECT o_orderpriority,
        |  cast(count(DISTINCT o_custkey) AS bigint) AS exact,
        |  true AS hll_direct_ok, true AS hll_merged_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "sketch_quantiles" ->
      """WITH q AS (
        |  SELECT quantile_cont(l_extendedprice::DOUBLE, 0.5) AS e50,
        |         quantile_cont(l_extendedprice::DOUBLE, 0.9) AS e90,
        |         quantile_cont(l_extendedprice::DOUBLE, 0.99) AS e99,
        |         cast(count(*) AS bigint) AS n
        |  FROM lineitem)
        |SELECT p, exact_q, true AS approx_within_tol, n FROM (
        |  SELECT 0.5::DOUBLE AS p, round(e50, 4) AS exact_q, n FROM q
        |  UNION ALL SELECT 0.9::DOUBLE, round(e90, 4), n FROM q
        |  UNION ALL SELECT 0.99::DOUBLE, round(e99, 4), n FROM q)
        |ORDER BY p""".stripMargin,
    "sketch_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT w, cast(count(*) AS bigint) AS tf FROM toks GROUP BY w)
        |SELECT w, tf, tf AS est FROM c
        |ORDER BY tf DESC, w LIMIT 20""".stripMargin,
    "sketch_join_cardinality" ->
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substr(md5(o_custkey::varchar), 1, 10))::bigint AS h
        |  FROM orders),
        |hb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(c_custkey::varchar), 1, 10))::bigint AS h
        |  FROM customer),
        |ka AS (SELECT count(*) AS n, max(h) AS hk
        |       FROM (SELECT h FROM ha ORDER BY h LIMIT 256)),
        |kb AS (SELECT count(*) AS n, max(h) AS hk
        |       FROM (SELECT h FROM hb ORDER BY h LIMIT 256)),
        |su AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
        |       ORDER BY h LIMIT 256),
        |ku AS (SELECT count(*) AS su_n, max(h) AS hk,
        |         sum(CASE WHEN h IN (SELECT h FROM ha)
        |                   AND h IN (SELECT h FROM hb) THEN 1 ELSE 0 END) AS j
        |       FROM su),
        |acts AS (SELECT
        |  (SELECT count(DISTINCT o_custkey) FROM orders) AS actual_distinct_a,
        |  (SELECT count(*) FROM orders) AS n_orders,
        |  (SELECT count(DISTINCT c_custkey) FROM customer) AS actual_distinct_b,
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |   WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS actual_overlap,
        |  (SELECT count(*) FROM orders o JOIN customer c
        |   ON o.o_custkey = c.c_custkey) AS actual_join_rows),
        |e AS (SELECT
        |  CASE WHEN ka.n < 256 THEN ka.n
        |       ELSE 280375465082880 // ka.hk END AS est_distinct_a,
        |  CASE WHEN kb.n < 256 THEN kb.n
        |       ELSE 280375465082880 // kb.hk END AS est_distinct_b,
        |  CASE WHEN ku.su_n < 256 THEN ku.su_n
        |       ELSE 280375465082880 // ku.hk END AS est_union,
        |  ku.su_n AS su_n, ku.j AS j, acts.*
        |  FROM ka, kb, ku, acts)
        |SELECT cast(est_distinct_a AS bigint) AS est_distinct_a,
        |  cast(est_distinct_b AS bigint) AS est_distinct_b,
        |  cast(est_union AS bigint) AS est_union,
        |  cast((j * est_union) // su_n AS bigint) AS est_overlap,
        |  cast((((j * est_union) // su_n) * n_orders) // est_distinct_a
        |    AS bigint) AS est_join_rows,
        |  cast(actual_distinct_a AS bigint) AS actual_distinct_a,
        |  cast(actual_distinct_b AS bigint) AS actual_distinct_b,
        |  cast(actual_overlap AS bigint) AS actual_overlap,
        |  cast(actual_join_rows AS bigint) AS actual_join_rows
        |FROM e""".stripMargin
  )
}
