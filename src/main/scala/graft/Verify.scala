package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // register the custom optimizer rule + function surface here
      // too, so the DuckDB oracle gate validates the SAME plans the
      // library produces (a WindowTopKToHeap bug must fail THIS gate,
      // not only the unit specs)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tz-naive events.ts reads as session-tz (UTC) TIMESTAMP, not
      // NTZ — matches the DuckDB oracle's view of the same file
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the 100-entry default thrashes on a 100+-query suite: every
      // generated class is evicted before its next use, so the "warm"
      // pass recompiles everything. Sized to hold the whole suite.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // typed-aggregate partials (topk_by_score heaps, sketch buffers)
      // must stay HASH-based: the 128-key default fallback demotes any
      // partition with >128 group keys to sort-based object aggregation
      // - the r14 Zipf smoke measured the knn partial top-k sorting
      // 14M-row partitions with 256MB spills (58s CPU in one task) for
      // agg state that fits in a few MB of heap. 2^17 keys x ~100B
      // state ~= 13MB/task - far under executor memory at 32 tasks.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      // caches report their real partitioning (see GraftSession) —
      // the gate must validate the same plans the library produces
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // same subset filter as Bench (shared impl — see graft.Subset):
    // targeted dev-loop checks on one family; the driver never sets
    // it, so the gate stays full
    def selected(name: String): Boolean = Subset.selected(name)
    SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several operators persist() intermediates; drop them so the
      // session's footprint stays flat across the whole query set
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
