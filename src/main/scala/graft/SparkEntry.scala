package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in
  * [[oracleSql]] (same parquet tables, same column names) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    BestPerformingProduct(t.lineitem, t.orders, t.part)
  }

  /** Every streaming provider, registered ONCE — queries, oracles,
    * and the bench's isolated-phase membership all derive from this
    * list, so a provider can't contribute rows while dodging the
    * phase registry (r11 verdict #4).
    */
  def streamingProviders: Seq[graft.streaming.StreamingProvider] = Seq(
    graft.streaming.EventsStream, graft.streaming.StreamingNearDup,
    graft.streaming.StreamingHeavyHitters, graft.streaming.IncrementalIngest,
    graft.streaming.UserProfileState, graft.streaming.StreamingCusum)

  /** Queries the bench must run in the isolated streaming phase —
    * derived from the providers' own declarations (default isolated;
    * see [[graft.streaming.StreamingProvider]]).
    */
  def isolatedStreamingQueries: Set[String] =
    streamingProviders.flatMap(_.isolatedQueries).toSet

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parity ++ Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Advanced.queries ++ CorpusCuration.queries ++ WindowsAndStrings.queries ++ ProductAnalytics.queries ++ PartitionedFacts.queries ++ RangeJoin.queries ++ CurationFilters.queries ++ Skew.queries ++ Retrieval.queries ++ Maintenance.queries ++ ProductQuantization.queries ++ Sketches.queries ++ CorpusMixture.queries ++ Features.queries ++ RecordLinkage.queries ++ DataQuality.queries ++ Timeseries.queries ++ graft.sources.JdbcGate.queries ++ streamingProviders.map(_.queries).reduce(_ ++ _)

  private def parity: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- parity: the reference's three analytics transforms ---------
    "agg_public_holiday" -> ((s, dir) => {
      val t = Tables(s, dir); AggPublicHoliday(t.orders)
    }),
    "agg_shipments" -> ((s, dir) => {
      val t = Tables(s, dir); AggShipments(t.lineitem, t.orders)
    }),
    "best_performing_product" -> ((s, dir) => {
      val t = Tables(s, dir); BestPerformingProduct(t.lineitem, t.orders, t.part)
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "agg_public_holiday"      -> AggPublicHoliday.oracle,
    "agg_shipments"           -> AggShipments.oracle,
    "best_performing_product" -> BestPerformingProduct.oracle
  ) ++ Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
    Similarity.oracles ++ Multimodal.oracles ++ Advanced.oracles ++ CorpusCuration.oracles ++ WindowsAndStrings.oracles ++ ProductAnalytics.oracles ++ PartitionedFacts.oracles ++ RangeJoin.oracles ++ CurationFilters.oracles ++ Skew.oracles ++ Retrieval.oracles ++ Maintenance.oracles ++ ProductQuantization.oracles ++ Sketches.oracles ++ CorpusMixture.oracles ++ Features.oracles ++ RecordLinkage.oracles ++ DataQuality.oracles ++ Timeseries.oracles ++ graft.sources.JdbcGate.oracles ++ streamingProviders.map(_.oracles).reduce(_ ++ _)
}
