package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Product-quantization encoder: L2-normalize an `array<float>`
  * embedding and emit the `m` per-subspace argmin-L2 centroid codes
  * (`array<int>`), in ONE tight primitive pass per row.
  *
  * Exists because the same computation phrased as nested
  * higher-order functions (`transform` over subspaces × `array_min`
  * over centroids × `aggregate` for distances) is catastrophically
  * re-evaluated: Catalyst's projection collapse inlines the
  * normalization fold into every lambda reference, so the O(dim)
  * norm runs per element per centroid — ~10⁹ boxed expression-node
  * evaluations for a 2 000 × 64-dim corpus (observed 65 s; this
  * expression does it in milliseconds). Same flop count, no boxing,
  * no re-evaluation — and the codebook rides along as a reference
  * object, not a 1 024-literal expression tree.
  *
  * Ties break toward the smaller code (strict `<` on ascending k),
  * matching driver-side Lloyd training. Null elements read as 0, and
  * an embedding shorter than the model dimension pads the missing
  * tail with 0 (same convention as [[IvfCell]]/[[HyperplaneSig]]).
  * An all-zero embedding skips normalization (dividing by the zero
  * norm would poison every centroid distance with NaN and make the
  * argmin arbitrary); its codes are the argmin against the raw zero
  * vector, which is well-defined.
  */
case class PqEncode(child: Expression, model: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("pqModel", model,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.compute($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** [[PqEncode]] that also emits the per-subspace quantization
  * residual norms `errs[m] = ‖x̂_m − c_{m,code}‖` alongside the codes
  * — the extra output that turns asymmetric-distance scan results
  * into PROVABLE per-candidate distance bounds: with
  * `a_m = ‖q̂_m − c_{m,code}‖` from the query's ADC table, the
  * triangle inequality per subspace gives
  * `Σ max(0, a_m − e_m)² ≤ ‖q̂ − x̂‖² ≤ Σ (a_m + e_m)²`, so a
  * candidate whose lower bound exceeds the K-th smallest upper bound
  * can be discarded with certainty (recall-complete pruning, vs the
  * heuristic "keep the N best ADC scores" pool). Same single
  * primitive pass — the residual is the already-computed argmin
  * distance, emitted instead of discarded.
  */
case class PqEncodeErr(child: Expression, model: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = PqEncodeErr.outType
  override def prettyName: String = "pq_encode_err"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    PqEncode.computeWithErr(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("pqModel", model,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.computeWithErr($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeErr =
    copy(child = newChild)
}

object PqEncodeErr {
  private[functions] val outType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("errs", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** See [[PqEncode.register]] for the flat-literal model transport. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode_err", exprs =>
        PqEncodeErr(exprs.head, PqEncode.modelFrom(exprs)), "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def pq_encode_err(c: Column, model: Array[Array[Array[Double]]]): Column = {
    val m = model.length
    val subDim = model(0)(0).length
    call_function("pq_encode_err", c, lit(model.flatten.flatten),
      lit(m), lit(subDim))
  }
}

object PqEncode {

  /** Shared by interpreted and generated paths. One normalization
    * fold, then m × k × subDim multiply-adds — all primitive.
    * Returns the per-subspace codes and fills `errsOut` (when
    * non-null) with the per-subspace argmin residual norms.
    */
  private def computeInto(emb: ArrayData, model: Array[Array[Array[Double]]],
                          errsOut: Array[Double]): Array[Int] = {
    val m = model.length
    val subDim = model(0)(0).length
    val dim = m * subDim
    val n = emb.numElements()
    val v = new Array[Double](dim)
    var ss = 0.0
    var i = 0
    while (i < dim) {
      // shorter-than-model input pads 0, same as IvfCell/HyperplaneSig
      val x = if (i >= n || emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
      v(i) = x
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm > 0.0) { // zero vector stays zero: keeps distances finite
      i = 0
      while (i < dim) { v(i) /= norm; i += 1 }
    }
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val cents = model(sub)
      val off = sub * subDim
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = v(off + j) - cent(j)
          d += t * t
          j += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(sub) = best
      if (errsOut != null) errsOut(sub) = math.sqrt(bd)
      sub += 1
    }
    codes
  }

  def compute(emb: ArrayData, model: Array[Array[Array[Double]]]): ArrayData =
    new GenericArrayData(computeInto(emb, model, null))

  def computeWithErr(emb: ArrayData, model: Array[Array[Array[Double]]]): InternalRow = {
    val errs = new Array[Double](model.length)
    val codes = computeInto(emb, model, errs)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes), new GenericArrayData(errs)))
  }

  /** The trained model crosses the Column-API boundary as a FLAT
    * double-array literal (m × k × subDim values) + a shape pair,
    * evaluated back into the nested array at expression-build time —
    * the registry builder only sees `Seq[Expression]`.
    */
  private[functions] def modelFrom(exprs: Seq[Expression]): Array[Array[Array[Double]]] = {
    val flat = exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray()
    val m = exprs(2).eval().asInstanceOf[Int]
    val subDim = exprs(3).eval().asInstanceOf[Int]
    val k = flat.length / (m * subDim)
    Array.tabulate(m, k, subDim)((s, c, d) => flat((s * k + c) * subDim + d))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs.head, modelFrom(exprs)), "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def pq_encode(c: Column, model: Array[Array[Array[Double]]]): Column = {
    val m = model.length
    val subDim = model(0)(0).length
    call_function("pq_encode", c, lit(model.flatten.flatten),
      lit(m), lit(subDim))
  }
}
