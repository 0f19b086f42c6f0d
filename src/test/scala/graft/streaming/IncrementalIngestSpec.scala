package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.catalog.ReferenceSchemas

class IncrementalIngestSpec extends SparkSpec {

  test("each run ingests exactly the newly-arrived files, no reprocessing") {
    val src = Files.createTempDirectory("graft-land").toString
    val dest = Files.createTempDirectory("graft-dest").toString + "/out"
    val ck = Files.createTempDirectory("graft-ck").toString

    def drop(name: String, rows: String*): Unit =
      Files.writeString(new java.io.File(s"$src/$name").toPath,
        ("review,product_id" +: rows).mkString("\n"))
    def ingest(): Long = {
      IncrementalIngest.ingestCsv(spark, src, ReferenceSchemas.reviews, dest, ck)
      spark.read.parquet(dest).count()
    }

    drop("batch1.csv", "5,7", "4,8")
    assert(ingest() == 2)

    drop("batch2.csv", "3,7", "2,8", "1,9")
    assert(ingest() == 5) // only the 3 new rows appended

    assert(ingest() == 5) // idempotent re-run: nothing new, no dupes
  }

  test("streaming document ingest dedups against all history across runs") {
    val src = Files.createTempDirectory("graft-docland").toString
    val dest = Files.createTempDirectory("graft-docdest").toString + "/docs"
    val ck = Files.createTempDirectory("graft-docck").toString
    val store = Files.createTempDirectory("graft-docfp").toString + "/fp"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    def drop(name: String, rows: String*): Unit =
      Files.writeString(new java.io.File(s"$src/$name").toPath,
        rows.mkString("\n"))
    def ingest(): Set[Long] = {
      IncrementalIngest.ingestDocumentsDedup(spark, src, schema, dest, ck, store)
      spark.read.parquet(dest).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }

    // run 1: in-batch dup (2 is a copy of 1) collapses to canonical 1
    drop("b1.jsonl",
      """{"doc_id": 1, "text": "alpha beta"}""",
      """{"doc_id": 2, "text": "alpha beta"}""",
      """{"doc_id": 3, "text": "gamma"}""")
    assert(ingest() == Set(1L, 3L))

    // run 2: doc 10 repeats run 1's content (dropped via the STORE,
    // not the batch); doc 11 is new
    drop("b2.jsonl",
      """{"doc_id": 10, "text": "alpha beta"}""",
      """{"doc_id": 11, "text": "delta"}""")
    assert(ingest() == Set(1L, 3L, 11L))

    // run 3: NULL text and empty text are ONE fingerprint class
    // (md5(coalesce(text,''))) — the min-id empty/null doc is kept,
    // later null/empty arrivals dedup against it. Pins the semantics
    // the board oracle mirrors with coalesce(text,'') on both sides.
    drop("b3.jsonl",
      """{"doc_id": 20}""",
      """{"doc_id": 21, "text": ""}""",
      """{"doc_id": 22, "text": "epsilon"}""")
    assert(ingest() == Set(1L, 3L, 11L, 20L, 22L))
    // run 4: both forms arrive again — neither re-ingests
    drop("b4.jsonl",
      """{"doc_id": 30, "text": ""}""",
      """{"doc_id": 31}""")
    assert(ingest() == Set(1L, 3L, 11L, 20L, 22L))
  }
}
