package graft.operators

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Semantics of the feature-engineering operators against driver-side
  * reference computations on literal inputs.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("jlProject matches a driver-side reference projection bit-for-bit") {
    val v1 = Array.tabulate(64)(i => (i % 7 - 3).toFloat / 4f)
    val v2 = Array.tabulate(64)(i => math.cos(i.toDouble).toFloat)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
    val got = Features.jlProject(df).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(j => r.getDouble(j + 1)))
      .toMap
    def ref(v: Array[Float]): Seq[Double] = (0 until 16).map { j =>
      // identical left-associated order as the column expression
      var acc = 0.0
      for (i <- 0 until 64) acc += v(i).toDouble * Features.sign(i, j)
      math.rint(acc / 4.0 * 1e6) / 1e6
    }
    assert(got(1L) == ref(v1))
    assert(got(2L) == ref(v2))
  }

  test("jlProject approximately preserves pairwise distance (JL property)") {
    // distances in the projected space should track the original ones
    // within the loose whp bound that k=16 gives
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(6)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Features.jlProject(df).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(j => r.getDouble(j + 1)))
      .toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    for (i <- 0L until 6L; j <- (i + 1) until 6L) {
      val ratio = d2(proj(i), proj(j)) / d2(orig(i), orig(j))
      assert(ratio > 0.2 && ratio < 3.0,
        s"pair ($i,$j) distance ratio $ratio outside JL tolerance")
    }
  }

  test("linearScore equals the hand-computed hashed-weight mean") {
    val docs = Seq(
      (1L, "alpha beta", "en", "s", 10L),
      (2L, "gamma", "en", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def w(t: String): Long =
      Math.floorMod(
        graft.functions.Md5Hash60.compute(UTF8String.fromString(t)), 2001L) -
        1000L
    val want1 = (w("alpha") + w("beta")).toDouble / 2000.0
    val want2 = w("gamma").toDouble / 1000.0
    val got = Features.linearScore(docs, topK = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2L, want1)))
    assert(got(2L) == ((1L, want2)))
  }

  test("jsonProps parses with the declared schema and aggregates per type") {
    val ev = Seq(
      (1L, "click", """{"k": 10}"""),
      (2L, "click", """{"k": 4}"""),
      (3L, "view", """{"k": 7}"""),
      (4L, "view", "not json") // malformed -> null k, excluded from count
    ).toDF("event_id", "event_type", "props")
    val got = Features.jsonProps(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("click") == ((2L, 14L, 4L, 10L, 7.0)))
    assert(got("view") == ((1L, 7L, 7L, 7L, 7.0)))
  }

  test("feature_auc approximates the exact rank-sum AUC of the projection") {
    val r = graft.SparkEntry.queries("feature_auc")(spark, sf).collect()(0)
    // exact reference: integer centroid projection recomputed on the
    // driver, textbook U with half-ties
    val vecs = graft.catalog.Tables(spark, sf).embeddings
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect()
      .map(x => (x.getInt(0), x.getSeq[Float](1)
        .map(v => math.floor(v * 1e6 + 0.5).toLong).toArray))
    val pos0 = vecs.filter(_._1 == 0).map(_._2)
    val dim = pos0.head.length
    val cent = Array.tabulate(dim) { i =>
      val s = pos0.map(_(i)).sum
      if (s < 0) -((-s) / pos0.length) else s / pos0.length
    }
    def score(q: Array[Long]): Long =
      q.zip(cent).map { case (a, b) => a * b }.sum
    val pos = vecs.filter(_._1 == 0).map(v => score(v._2))
    val neg = vecs.filter(_._1 != 0).map(v => score(v._2))
    val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val exact = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    // 4096-bucket quantization can move ties; allow 1% absolute
    assert(math.abs(r.getAs[Long]("auc_e6") / 1e6 - exact) < 0.01,
      s"AUC ${r.getAs[Long]("auc_e6")} vs exact $exact")
    // and the learned direction must actually separate the class
    assert(r.getAs[Long]("auc_e6") > 600000L)
  }

  test("embed_project plans as a pure projection — no shuffle, no UDF") {
    val plan = Features.jlProject(
      graft.catalog.Tables(spark, sf).embeddings)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
