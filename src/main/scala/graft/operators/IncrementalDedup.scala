package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-run exact dedup against a persisted fingerprint store — the
  * batch complement to `EventsStream.dedupStream`: the stream variant
  * bounds state by a watermark horizon, this one remembers FOREVER by
  * keeping only 16-byte content hashes in a parquet store keyed for
  * the anti-join.
  *
  * Scale notes: the store carries one md5 per unique doc ever kept —
  * at 100 TB of text that is orders of magnitude smaller than the
  * corpus and shuffles by hash in the left_anti join (nothing is
  * broadcast or collected; Spark may still choose to broadcast while
  * the store is genuinely small, which is the right call early). New
  * fingerprints APPEND — the store is never rewritten, so runs stay
  * O(batch), not O(history), and a crashed run can be replayed
  * because the anti-join makes re-appending kept hashes a no-op for
  * dedup purposes (dupes in the store cost bytes, not correctness).
  */
object IncrementalDedup {

  /** Keep the canonical (min doc_id) row per new content hash, drop
    * anything whose hash is already in the store, and append the kept
    * hashes. Returns the kept rows.
    */
  def dedupAgainstStore(batch: DataFrame, storePath: String): DataFrame = {
    val spark = batch.sparkSession
    // NULL text hashes to NULL, and NULL join keys never match in the
    // left_anti — a null-text row would be re-kept and a NULL
    // fingerprint re-appended on EVERY batch. Normalize to '' first
    // (null and empty text dedup together, documented).
    val hashed = batch.withColumn("h", md5(coalesce(col("text"), lit(""))))
    // in-batch canonicalization first: min doc_id per hash
    val canonical = hashed
      .withColumn("canon", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("canon")).drop("canon")
    val store = storeDf(spark, storePath)
    // Pin kept to the store state it was computed against BEFORE
    // appending. An eager localCheckpoint (not persist): appending to
    // storePath triggers recacheByPath on any cached plan that reads
    // it, which would re-run the anti-join against the just-appended
    // hashes and silently empty the result. The checkpoint severs the
    // lineage to the path, so the append can't invalidate it.
    val kept = canonical.join(store, Seq("h"), "left_anti")
      .localCheckpoint(true)
    kept.select(col("h")).write.mode(SaveMode.Append).parquet(storePath)
    kept
  }

  /** Rewrite the store as distinct hashes. Crash-replayed runs append
    * their kept hashes again (correct but redundant — the anti-join
    * ignores dupes), so an unattended pipeline should compact on a
    * schedule or when `storeDuplication` drifts above ~2×; compaction
    * is one shuffle over the store, never the corpus.
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   storePath: String): Unit = {
    // checkpoint severs lineage from storePath so the overwrite
    // doesn't read-from/write-to the same files
    val distinctHashes =
      storeDf(spark, storePath).distinct().localCheckpoint(true)
    distinctHashes.write.mode(SaveMode.Overwrite).parquet(storePath)
  }

  /** total/distinct hash ratio — 1.0 means fully compact. */
  def storeDuplication(spark: org.apache.spark.sql.SparkSession,
                       storePath: String): Double = {
    val r = storeDf(spark, storePath)
      .agg(count(lit(1)).cast("double").as("n"),
        count_distinct(col("h")).cast("double").as("d"))
      .head()
    if (r.getDouble(1) == 0) 1.0 else r.getDouble(0) / r.getDouble(1)
  }

  private def storeDf(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        // first run: empty store with the fingerprint schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "h", org.apache.spark.sql.types.StringType))))
    }
}
