package graft.operators

import org.apache.spark.sql.DataFrame

/** Data-derived partition counts for the pinned exchanges.
  *
  * Round 9 pinned every exchange feeding a persisted or CPU-heavy
  * relation to an EXPLICIT count (REPARTITION_BY_NUM — the only
  * shuffle kind AQE must not size-coalesce; see `Dedup.spread`), but
  * pinned it to the bare session `numShufflePartitions`. That is
  * correct at local[32]/sf0.1 where one knob covers everything, but on
  * a 1000-executor cluster it makes a single global setting control
  * every CPU-heavy exchange: set for the big corpus and small inputs
  * over-partition; set small and the 100 TB shuffle runs underparallel
  * (r9 verdict #4).
  *
  * The grown-up version computed here: `max(numShufflePartitions,
  * ceil(leafInputBytes / bytesPerTask))`. Leaf bytes — the sum of the
  * plan's LEAF relation sizes (file-scan statistics, in-memory
  * relation sizes) — rather than the optimizer's estimate for the
  * node itself, because join-output estimates multiply selectivities
  * and can be off by orders of magnitude in either direction, while
  * leaf sizes are real file lengths. The floor keeps today's behavior
  * (never BELOW the session parallelism, so the sub-MB/CPU-heavy
  * corpora that motivated pinning still spread across every core);
  * the ceiling term makes the same code pick ~3 M tasks for a 100 TB
  * input instead of inheriting a local constant. Capped at
  * [[MaxPartitions]] as a runaway guard for corrupt statistics.
  */
object Parallelism {

  /** Target input bytes per task for the pinned exchanges: 32 MB —
    * deliberately below the 128 MB scan default because every pinned
    * site feeds per-row CPU-heavy work (shingling, hashing, codegen
    * intersects), where task CPU, not byte movement, is the bound.
    */
  val DefaultBytesPerTask: Long = 32L << 20

  /** Upper bound on a derived count (2^17): even a 100 TB input stops
    * here (~0.8 GB/task) — beyond that, task-scheduling overhead and
    * shuffle-file counts dominate any further split.
    */
  val MaxPartitions: Int = 1 << 17

  /** Total bytes across the plan's DISTINCT leaf relations, or -1
    * when no leaf reports a usable size. Distinct because a self-join
    * subtree holds the same relation once per PLAN occurrence while
    * the bytes on disk are the same file — summing per-occurrence
    * would inflate the pin ~N× for an N-way self-join (e.g. the
    * basket self-join feeding triangle participation). File scans
    * dedupe on their root paths, caches on their shared cache
    * builder; leaves with no stable identity (e.g. LocalRelation
    * copies) count per-occurrence — they are driver-local and tiny by
    * construction. (The plan analysis this forces on the intermediate
    * DataFrame is driver-side milliseconds per call site — accepted;
    * the call sites are once-per-pipeline, not per-row.)
    */
  private[operators] def leafInputBytes(df: DataFrame): Long =
    try {
      val seen = scala.collection.mutable.Set[AnyRef]()
      val sizes = df.queryExecution.optimizedPlan.collectLeaves()
        .flatMap {
          // a persisted-but-NOT-YET-MATERIALIZED cache surfaces as an
          // InMemoryRelation leaf whose stats are the CHILD PLAN'S
          // ESTIMATE — for a self-join subtree that is the
          // join-output guess (TBs at sf0.1), precisely the estimate
          // class this helper exists to avoid. r10 bug: pinning the
          // triangle adjacency off such a leaf derived 89,594
          // partitions and drowned the stage in shuffle-file commits.
          // Once materialized, the stats are the REAL cached bytes —
          // those we trust. The builder instance is SHARED across all
          // occurrences of one cached relation, so it is the dedup key.
          case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            if (imr.cacheBuilder.isCachedColumnBuffersLoaded &&
                seen.add(imr.cacheBuilder))
              Some(imr.stats.sizeInBytes)
            else None
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            val key: AnyRef = lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.mkString(",")
              case other => other
            }
            if (seen.add(key)) Some(lr.stats.sizeInBytes) else None
          case leaf => Some(leaf.stats.sizeInBytes)
        }
        // the conservative "unknown" default is Long.MaxValue-ish;
        // treat anything absurd as unknown rather than exploding the
        // partition count off a sentinel
        .filter(s => s >= 0 && s < BigInt(Long.MaxValue) / 16)
      if (sizes.isEmpty) -1L else sizes.sum.toLong
    } catch { case _: Throwable => -1L }

  /** The partition count to pin an exchange feeding `df`'s pipeline:
    * session parallelism floored, input-size-scaled, capped.
    */
  def pinCount(df: DataFrame,
               bytesPerTask: Long = DefaultBytesPerTask): Int = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    pinCountForBytes(n, leafInputBytes(df), bytesPerTask)
  }

  /** Pure arithmetic of [[pinCount]], spec-testable without a plan:
    * max(sessionParallelism, ceil(inputBytes / bytesPerTask)) clamped
    * to [[MaxPartitions]]; unknown sizes (≤ 0) keep the session value.
    */
  def pinCountForBytes(sessionParallelism: Int, inputBytes: Long,
                       bytesPerTask: Long = DefaultBytesPerTask): Int = {
    require(bytesPerTask > 0, "bytesPerTask must be positive")
    if (inputBytes <= 0) sessionParallelism
    else {
      val derived = (inputBytes + bytesPerTask - 1) / bytesPerTask
      math.max(sessionParallelism,
        math.min(derived, MaxPartitions.toLong).toInt)
    }
  }
}
