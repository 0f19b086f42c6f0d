package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.graftshim.CheckpointStats

/** Locks the checkpoint stats reset (`graftshim.CheckpointStats`)
  * that the convergence loop depends on: `Dataset.localCheckpoint`
  * eagerly rewrites the new leaf's sizeInBytes from the origin plan,
  * and a round plan that references the previous checkpoint TWICE
  * (pagerank_converged: contrib path + pr_old delta join) makes that
  * estimate SQUARE round-over-round — digit count doubles per round
  * and the driver hangs in BigInteger multiplication by round ~20
  * regardless of data size. The shim re-roots the checkpointed
  * LogicalRDD with a caller-supplied constant; these tests pin (a)
  * values survive the re-root untouched and (b) the estimate actually
  * stays bounded across double-self-reference rounds.
  */
class CheckpointStatsSpec extends SparkSpec {
  import spark.implicits._

  private def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  test("re-rooted checkpoint keeps rows and schema, pins sizeInBytes") {
    val df = Seq((1L, 0.25), (2L, 0.75)).toDF("part", "pr")
      .localCheckpoint(true)
    val fresh = CheckpointStats.withBoundedStats(df, BigInt(64))
    assert(fresh.schema == df.schema)
    assert(fresh.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      === Array((1L, 0.25), (2L, 0.75)))
    assert(sizeOf(fresh) == BigInt(64))
  }

  test("stats stay bounded across double-self-referencing checkpoint rounds") {
    // the pagerank_converged shape in miniature: each round joins the
    // previous checkpoint twice, then re-checkpoints
    var cur = Seq((1L, 1.0), (2L, 1.0)).toDF("part", "pr").localCheckpoint(true)
    cur = CheckpointStats.withBoundedStats(cur, BigInt(48))
    val digitsPerRound = (1 to 6).map { _ =>
      val doubled = cur.join(cur.withColumnRenamed("pr", "pr_old"), Seq("part"))
      val next = doubled.select($"part", ($"pr" + $"pr_old").as("pr"))
        .localCheckpoint(true)
      cur = CheckpointStats.withBoundedStats(next, BigInt(48))
      sizeOf(cur).toString.length
    }
    // without the reset the digit count doubles per round (squaring);
    // with it the estimate is the same constant every round
    assert(digitsPerRound.distinct == Seq(BigInt(48).toString.length),
      s"stats grew across rounds: digit counts $digitsPerRound")
  }

  test("non-checkpointed plans pass through unchanged") {
    val df = Seq((1L, 2.0)).toDF("part", "pr").filter($"part" > 0)
    val out = CheckpointStats.withBoundedStats(df, BigInt(16))
    assert(out eq df) // no LogicalRDD leaf at the root -> identity
  }
}
