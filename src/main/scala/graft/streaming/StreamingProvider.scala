package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry contract for streaming query providers (r11 verdict #4).
  *
  * The bench runs streaming drills in an ISOLATED final phase: each
  * boots a streaming engine and (usually) a RocksDB state store whose
  * NATIVE allocations used to land mid-alphabet in the batch pass and
  * squeeze every query after them — real cost, wrong venue (the r9
  * cold-window incident). That phase membership was a hardcoded set
  * in Bench, which every new streaming row had to remember to join or
  * it re-introduced exactly that pollution.
  *
  * Providers now declare membership themselves, and the DEFAULT is
  * isolated: a new streaming row is quarantined unless its author
  * consciously lists it in [[batchPhaseOk]] — the failure mode of
  * forgetting is a too-conservative phase assignment, not a polluted
  * recording. `SparkEntrySpec` pins the derived set two-way.
  */
trait StreamingProvider {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Queries proven safe to time in the BATCH phase: no native state
    * store, no streaming-engine bootstrap heavy enough to tax the
    * queries that follow. Opt-in per query — everything else in
    * [[queries]] runs in the isolated streaming phase.
    */
  def batchPhaseOk: Set[String] = Set.empty

  final def isolatedQueries: Set[String] = queries.keySet -- batchPhaseOk
}
