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
    // sketches, union at read time).
    "sketch_distinct_counts" -> ((s, dir) => {
      val o = Tables(s, dir).orders
      val halves = o.withColumn("half", pmod(col("o_orderkey"), lit(2)))
      val shard = halves.groupBy(col("o_orderpriority"), col("half"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = shard.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("hll_merged"))
      o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("hll_direct"))
        .join(merged, Seq("o_orderpriority"))
    }),

    // streaming-friendly quantiles: one pass, bounded state, vs the
    // exact percentiles
    "sketch_quantiles" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
      l.agg(
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("approx_q"),
        percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("exact_q"),
        count(lit(1)).as("n"))
    })
  )

  /** Approximate results are engine-specific — no DuckDB oracle;
    * rows-only check + [[SketchesSpec]] error bounds.
    */
  def oracles: Map[String, String] = Map.empty
}
