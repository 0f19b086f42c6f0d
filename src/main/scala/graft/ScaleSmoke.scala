package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only scale smoke (like [[Profile]]): unions the REAL sf
  * tables N× in memory (ids offset per copy) and times the heaviest
  * operators at ~N× the bench scale. Identical copies are the
  * ADVERSARIAL case for every LSH/banding structure — each copy
  * group collides in ALL bands, so candidate volume grows
  * quadratically in the copy count within a group while staying
  * linear in groups. Nothing is written to testdata; this exists to
  * answer "does the plan survive a 10× scale-up" with a measurement
  * instead of an argument.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [mult]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    val t = graft.catalog.Tables(spark, sfDir)

    def scaled(df: DataFrame, idCol: String): DataFrame =
      (0 until mult).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 10000000L)))
        .reduce(_ unionAll _)

    val docs = scaled(t.documents, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val emb = scaled(t.embeddings, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs=${docs.count()} vectors=${emb.count()} (mult=$mult over $sfDir)")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s   rows=$n")
    }

    time("dedup_exact")(docs.withColumn("h", md5(col("text")))
      .groupBy(col("h")).agg(count(lit(1))).count())
    time("minhash_pairs")(graft.operators.Dedup.minhashPairs(docs).count())
    time("edit_pairs")(graft.operators.Dedup.editPairs(docs).count())
    time("minhash_clusters")(graft.operators.Dedup.minhashClusters(docs).count())
    time("jaccard_prefix_join")(
      graft.operators.Dedup.jaccardPrefixJoin(docs).count())
    time("containment_join")(
      graft.operators.Dedup.containmentPrefixJoin(docs).count())
    time("knn_join_blocked")(
      graft.operators.Similarity.knnJoinBlocked(emb).count())
    time("embedding_pairs_blocked")(
      graft.operators.Dedup.embeddingPairsBlocked(emb).count())
    spark.stop()
  }
}
