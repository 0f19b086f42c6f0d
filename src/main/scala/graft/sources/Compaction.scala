package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the operational counterpart of
  * incremental ingest: streaming/append writers accumulate many
  * small files; reads then pay per-file open/footer costs and
  * scheduling overhead. Compaction rewrites a table directory into
  * ~`targetBytes`-sized files (one sort-free repartition, then an
  * atomic-ish directory swap via a temp path).
  */
object Compaction {

  /** Rewrite `path` (parquet) into files of roughly `targetBytes`. */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val totalBytes = fs.getContentSummary(p).getLength
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path)
      .repartition(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** Parquet data-file count under a directory (diagnostic). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
