package graft

/** Dev profiling harness: time named queries (default all) with
  * warm-up + repeats inside one session; optionally print the
  * formatted physical plan. Usage:
  *   runMain graft.Profile <sfDir> [query,query,...] [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 && args(1) != "--explain") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val explain = args.contains("--explain")
    val spark = GraftSession.local()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"=== $name ===")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to 3).map { _ =>
        // --clear reproduces the bench harness's per-query isolation
        // (fresh plan + codegen + no reused persists each repeat)
        if (args.contains("--clear")) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s cold ${times.head}%6.2f  warm ${times.drop(1).min}%6.2f")
    }
    spark.stop()
  }
}
