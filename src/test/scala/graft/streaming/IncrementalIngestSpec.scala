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
}
