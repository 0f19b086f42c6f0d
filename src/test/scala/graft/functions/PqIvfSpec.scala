package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.SparkSpec

/** PqEncode / IvfCell parity guards: the codegen DataFrame path, the
  * interpreted eval path, and an independent plain-Scala reference
  * must agree element-for-element — the native expressions are a
  * performance change (one primitive pass instead of re-evaluated
  * HOF lambdas), never a semantics change. Ties must break toward
  * the smaller code/cell.
  */
class PqIvfSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val dim = 16
  private val m = 4
  private val subDim = 4
  private val k = 3

  private def randVec(): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private val model: Array[Array[Array[Double]]] =
    Array.fill(m, k, subDim)(rnd.nextDouble() * 2 - 1)
  private val centroids: Array[Array[Double]] =
    Array.fill(5, dim)(rnd.nextDouble() * 2 - 1)

  private def refEncode(v: Array[Float]): Seq[Int] = {
    val ss = v.map(x => x.toDouble * x.toDouble).sum
    val n = math.sqrt(ss)
    val nv = v.map(_.toDouble / n)
    (0 until m).map { sub =>
      val dists = (0 until k).map { c =>
        (0 until subDim).map { j =>
          val t = nv(sub * subDim + j) - model(sub)(c)(j); t * t
        }.sum
      }
      dists.indexOf(dists.min) // first min = smallest code on ties
    }
  }

  private def refCell(v: Array[Float]): Int = {
    val dists = centroids.map(c =>
      v.zip(c).map { case (x, cv) => (x.toDouble - cv) * (x.toDouble - cv) }.sum)
    dists.indexOf(dists.min)
  }

  test("codegen path, interpreted eval, and reference agree on random vectors") {
    PqEncode.register(spark)
    IvfCell.register(spark)
    val vecs = Seq.fill(50)(randVec())
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val rows = df.select(
        PqEncode.pq_encode($"embedding", model).as("codes"),
        IvfCell.ivf_cell($"embedding", centroids).as("cell"))
      .collect()
    vecs.zip(rows).foreach { case (v, r) =>
      assert(r.getSeq[Int](0) == refEncode(v),
        s"codegen codes diverged for ${v.take(4).mkString(",")}…")
      assert(r.getInt(1) == refCell(v), "codegen cell diverged")
      // interpreted path (direct eval, no codegen)
      val litv = Literal.create(v, ArrayType(FloatType))
      val interpCodes = PqEncode(litv, model).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      assert(interpCodes.toSeq == refEncode(v), "interpreted codes diverged")
      assert(IvfCell(litv, centroids).eval(null) == refCell(v),
        "interpreted cell diverged")
    }
  }

  test("exact-tie inputs break toward the smaller code/cell") {
    // two IDENTICAL centroids → distances tie exactly; argmin must
    // pick the first (smaller id)
    val c0 = Array.fill(dim)(0.25)
    val tieCentroids = Array(c0, c0.clone(), Array.fill(dim)(9.0))
    val v = c0.map(_.toFloat)
    assert(IvfCell(Literal.create(v, ArrayType(FloatType)), tieCentroids)
      .eval(null) == 0)
    val sub0 = Array.fill(subDim)(0.1)
    val tieModel = Array.fill(m)(Array(sub0, sub0.clone(),
      Array.fill(subDim)(5.0)))
    val codes = PqEncode(Literal.create(randVec(), ArrayType(FloatType)), tieModel)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    assert(codes.forall(c => c == 0 || c == 2),
      s"tied codebook rows must resolve to the first: ${codes.mkString(",")}")
  }
}
