package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Re-root a just-`localCheckpoint`'ed DataFrame on a fresh
  * [[LogicalRDD]] whose statistics are a caller-supplied constant
  * instead of the origin-plan estimate that `Dataset.checkpoint`
  * rewrites in (`LogicalRDD.rewriteStatsAndConstraints`).
  *
  * Why this exists: an iterative dataflow whose round plan references
  * the previous round's checkpoint MORE THAN ONCE (e.g. a convergence
  * loop joining rank_new against rank_old) makes the rewritten
  * sizeInBytes estimate MULTIPLY round-over-round — the size-only join
  * visitor estimates a join as the product of child sizes, so a double
  * self-reference SQUARES the BigInt each round. The value is only an
  * estimate, but its DIGIT COUNT then doubles per round, and the
  * rewrite is EAGER inside every checkpoint call: by round ~20 the
  * driver burns minutes in `BigInteger.multiplyToomCook3` (measured on
  * a 4-node toy graph: round 20 = 49 s, round 24 = 161 s, all driver
  * CPU in stats rewriting). Resetting the checkpointed leaf's stats to
  * a bounded constant each round keeps every subsequent rewrite O(1)
  * without touching what the optimizer needs — the loop's joins carry
  * explicit strategy hints, and the supplied size is the honest
  * row-count × row-width of the materialized relation anyway.
  *
  * Same pattern as [[org.apache.spark.graftshim.ListenerBusSync]]: a
  * package-located accessor (`Dataset.ofRows` and `LogicalRDD` are
  * `private[sql]`), nothing internal modified — we rebuild the same
  * case class with different origin stats over the same checkpointed
  * internal-row RDD (no recompute, no conversion).
  */
object CheckpointStats {
  /** Only the STATS are replaced: the checkpoint's rewritten
    * constraints (`lr.constraints` — e.g. the IsNotNull inference the
    * origin plan carried) are passed through unchanged, so callers
    * without explicit join-strategy hints keep constraint-based
    * pruning and nullability reasoning across the re-root.
    */
  def withBoundedStats(df: org.apache.spark.sql.DataFrame,
                       sizeInBytes: BigInt): org.apache.spark.sql.DataFrame = {
    val cdf = df match {
      case d: Dataset[org.apache.spark.sql.Row @unchecked] => d
      case other => throw new IllegalArgumentException(
        "CheckpointStats.withBoundedStats requires a classic (local-JVM) " +
          s"Dataset; got ${other.getClass.getName}. Connect-backed " +
          "DataFrames have no driver-side LogicalRDD leaf to re-root.")
    }
    cdf.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = cdf.sparkSession
        Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            spark, Some(Statistics(sizeInBytes = sizeInBytes.max(1))),
            Some(lr.constraints)))
      case _ => df // not a checkpointed leaf; nothing to reset
    }
  }
}
