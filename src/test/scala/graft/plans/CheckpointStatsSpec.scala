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
    val sizePerRound = (1 to 6).map { _ =>
      val doubled = cur.join(cur.withColumnRenamed("pr", "pr_old"), Seq("part"))
      val next = doubled.select($"part", ($"pr" + $"pr_old").as("pr"))
        .localCheckpoint(true)
      cur = CheckpointStats.withBoundedStats(next, BigInt(48))
      sizeOf(cur)
    }
    // without the reset the estimate SQUARES per round (digit count
    // doubles); with it every round reads back exactly the constant —
    // assert the value itself, not a digit-count proxy that any
    // same-width wrong estimate would satisfy
    assert(sizePerRound.forall(_ == BigInt(48)),
      s"stats drifted across rounds: $sizePerRound " +
        s"(digit counts ${sizePerRound.map(_.toString.length)})")
  }

  test("re-root preserves the checkpoint's rewritten constraints") {
    // localCheckpoint rewrites the origin plan's constraints (here the
    // filter's IsNotNull/GreaterThan inference) onto the new leaf; the
    // stats re-root must pass them through, not drop them to empty —
    // an unhinted caller relies on them for pruning/broadcast choices
    val ckpt = Seq((1L, 2.0), (3L, 4.0)).toDF("part", "pr")
      .filter($"part" > 0).localCheckpoint(true)
    val before = ckpt.queryExecution.analyzed.constraints
    assert(before.nonEmpty, "precondition: checkpoint carried constraints")
    val fresh = CheckpointStats.withBoundedStats(ckpt, BigInt(48))
    assert(fresh.queryExecution.analyzed.constraints == before)
    assert(sizeOf(fresh) == BigInt(48))
  }

  test("non-checkpointed plans pass through unchanged") {
    val df = Seq((1L, 2.0)).toDF("part", "pr").filter($"part" > 0)
    val out = CheckpointStats.withBoundedStats(df, BigInt(16))
    assert(out eq df) // no LogicalRDD leaf at the root -> identity
  }
}
