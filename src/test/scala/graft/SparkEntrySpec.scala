package graft

/** Driver-contract guards: entry() smoke, query/oracle key
  * consistency, and name hygiene (the driver joins queries to
  * oracleSql by exact key).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // every query is oracle-checked — sketch queries ship exact
    // companion columns plus oracle-pinned within-tolerance booleans
    // instead of engine-specific sketch bits
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }

  test("isolated streaming-phase set derives from the provider registry") {
    val iso = SparkEntry.isolatedStreamingQueries
    // two-way pin (the PlanLintSpec staleness pattern): adding a
    // streaming row forces a conscious phase decision here — the
    // provider default is isolated, so the expected set grows unless
    // the author opts the row into batchPhaseOk with a justification
    assert(iso == Set("stream_neardup_pairs", "stream_heavy_hitters",
      "stream_incremental_ingest", "stream_sessions",
      "stream_user_profiles", "stream_cusum"),
      s"isolated set drifted: $iso")
    // registry completeness: every stream_* board row must come from
    // a registered provider (a provider added to SparkEntry.queries
    // but not streamingProviders would dodge the phase registry)
    val provided = SparkEntry.streamingProviders.flatMap(_.queries.keySet).toSet
    val streamRows = SparkEntry.queries.keySet.filter(_.startsWith("stream_"))
    assert(streamRows == provided,
      s"stream rows outside the provider registry: ${streamRows -- provided}")
    assert(iso.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle SQL never references tables outside the testdata set") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // collect CTE names to exclude them
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_,\\s]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t) || t == "range",
          s"$name references unknown relation '$t'")
      }
    }
  }
}
