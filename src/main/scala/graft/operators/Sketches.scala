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
        |ORDER BY tf DESC, w LIMIT 20""".stripMargin
  )
}
