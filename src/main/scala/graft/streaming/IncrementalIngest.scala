package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental re-run mode for the reference's `@once` ETL
  * (SURVEY.md §1.2/§7.5): a file-source stream over the staging CSV
  * drop directory with `Trigger.AvailableNow` + a checkpoint. Each
  * invocation ingests exactly the files that arrived since the last
  * run and stops — the reference's one-shot semantics made
  * re-runnable with exactly-once file tracking, no bookkeeping code.
  *
  * At scale this is the standard landing-zone pattern: writers drop
  * objects, each ingest run picks up the delta, output is
  * partitioned parquet.
  */
object IncrementalIngest {

  /** Drain all unprocessed CSVs from `srcDir` into parquet at
    * `destDir`. Returns after the drain completes. The checkpoint
    * directory carries the processed-files log between runs.
    */
  def ingestCsv(spark: SparkSession, srcDir: String, schema: StructType,
                destDir: String, checkpointDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(srcDir)
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming corpus ingest with cross-run exact dedup: drain the
    * unprocessed JSON-lines document drops from `srcDir` and keep,
    * per micro-batch, only docs whose content hash is new — new
    * within the batch AND against every doc ever ingested (the
    * persisted fingerprint store, `operators.IncrementalDedup`).
    * Kept rows append to `destDir`.
    *
    * Exactly-once story at scale: the checkpoint makes file pickup
    * exactly-once; a replayed batch re-appends only fingerprints
    * (harmless — the anti-join treats store dupes as one), and its
    * kept rows overwrite-by-append the same content, so downstream
    * consumers dedup on `h` if they need strict idempotence. State is
    * 16 bytes per unique doc ever seen, NOT per-doc text — the store
    * shuffles in the anti-join, nothing is collected or broadcast.
    */
  def ingestDocumentsDedup(spark: SparkSession, srcDir: String,
                           schema: StructType, destDir: String,
                           checkpointDir: String, storePath: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .json(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = graft.operators.IncrementalDedup
          .dedupAgainstStore(batch.toDF(), storePath)
        kept.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(destDir)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
