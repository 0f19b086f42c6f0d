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
}
