package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.functions.TopKByScore

/** Optimizer rule: rewrite the natural grouped-top-k formulation
  *
  * {{{ SELECT g, rk, score, id FROM (
  *       ... row_number() OVER (PARTITION BY g
  *                              ORDER BY score DESC, id) AS rk ...)
  *     WHERE rk <= k }}}
  *
  * into the bounded-heap aggregate
  * [[graft.functions.TopKByScore]] + posexplode.
  *
  * Why: Spark 4's own `InferWindowGroupLimit` already bounds the
  * SHUFFLE of this pattern (a partial WindowGroupLimit keeps k rows
  * per map partition), but it still fully SORTS every map partition
  * to find them, and sorts again after the exchange — O(n log n)
  * comparisons on the corpus where a k-element heap needs O(n log k)
  * and no sort at all. The rewrite produces the exact plan the
  * hand-written TopKByScore call sites use: partial→final
  * ObjectHashAggregate, zero Sort nodes.
  *
  * Soundness guards (ALL must hold, else the plan is left alone):
  *  - the window defines exactly one expression: a `row_number()`
  *    with a non-empty partitionSpec;
  *  - the filter is `rk <= lit` / `rk < lit` / `rk = 1` and
  *    references nothing but rk;
  *  - the ordering is exactly (score DESC, id ASC) on NON-NULLABLE
  *    child attributes (the heap skips nulls, the window ranks them
  *    NULLS LAST — non-nullability makes the behaviors identical).
  *    Note most arithmetic (`%`, `/`, `sum`) is statically nullable;
  *    wrap the score in `coalesce(s, lit(…))` to declare the null
  *    semantics and activate the rewrite. Score may be double, float
  *    or int (float/int embed EXACTLY into the heap's double, so the
  *    cast in and back out preserves both order and value — long
  *    scores are refused: above 2^53 a double collapses distinct
  *    longs). Id may be long or int;
  *  - every column consumed above is one of partition ∪ {rk, score,
  *    id}: any other column makes heap output underdetermined — and
  *    conversely, under this guard two rows tying on (score, id) in a
  *    partition are indistinguishable in the output, so heap
  *    tie-resolution ≡ row_number tie-resolution.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) so `spark.sql.extensions=graft.GraftExtensions`
  * turns it on cluster-wide; `WindowTopKRewriteSpec` pins both the
  * fired and the guarded cases.
  */
object WindowTopKToHeap extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, Filter(cond, w: Window)) =>
      rewrite(plist, cond, w)
        .map(r => Project(plist, r)).getOrElse(p)
    case f @ Filter(cond, w: Window) =>
      // no projection above: the filter's whole output must still be
      // derivable from the heap entries
      rewrite(f.output, cond, w).map { r =>
        // preserve the original column order by exprId
        val byId = r.output.map(a => a.exprId -> a).toMap
        Project(f.output.map(a => byId(a.exprId)), r)
      }.getOrElse(f)
  }

  /** The rewritten subtree (Aggregate → Generate → Project emitting
    * the ORIGINAL exprIds for rk/score/id/partition), or None if any
    * soundness guard fails.
    */
  private def rewrite(consumed: Seq[NamedExpression], cond: Expression,
                      w: Window): Option[LogicalPlan] = {
    for {
      // exactly one window expression: row_number as `rk`
      rkAlias <- w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some(a)
        case _ => None
      }
      rkAttr = rkAlias.toAttribute
      k <- cond match {
        case LessThanOrEqual(r: AttributeReference, Literal(k: Int, IntegerType))
          if r.exprId == rkAttr.exprId => Some(k)
        case LessThan(r: AttributeReference, Literal(k: Int, IntegerType))
          if r.exprId == rkAttr.exprId => Some(k - 1)
        case EqualTo(r: AttributeReference, Literal(1, IntegerType))
          if r.exprId == rkAttr.exprId => Some(1)
        case _ => None
      }
      if k >= 1
      // ordering: (score DESC, id ASC), both non-nullable child
      // attributes of exactly-double-embeddable / long-embeddable type
      (score, id) <- w.orderSpec match {
        case Seq(SortOrder(s: AttributeReference, Descending, _, _),
                 SortOrder(i: AttributeReference, Ascending, _, _))
          if scoreTypes(s.dataType) && !s.nullable &&
             idTypes(i.dataType) && !i.nullable => Some((s, i))
        case _ => None
      }
      parts <- Some(w.partitionSpec).collect {
        case ps if ps.nonEmpty && ps.forall(_.isInstanceOf[AttributeReference]) =>
          ps.map(_.asInstanceOf[AttributeReference])
      }
      allowed = AttributeSet(parts ++ Seq(rkAttr, score, id))
      if consumed.forall(_.references.subsetOf(allowed))
    } yield {
      val scoreIn =
        if (score.dataType == DoubleType) score: Expression
        else Cast(score, DoubleType)
      val idIn =
        if (id.dataType == LongType) id: Expression else Cast(id, LongType)
      val topAlias = Alias(
        TopKByScore(scoreIn, idIn, Literal(k)).toAggregateExpression(), "top")()
      val agg = Aggregate(parts, parts :+ topAlias, w.child)
      val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
      val entryType = StructType(Seq(
        StructField("score", DoubleType), StructField("id", LongType)))
      val colAttr = AttributeReference("col", entryType, nullable = false)()
      val gen = Generate(PosExplode(topAlias.toAttribute),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(posAttr, colAttr), child = agg)
      // re-emit rk/score/id under their ORIGINAL exprIds (and
      // original types — the double→float / long→int casts are exact
      // round-trips for values that entered through the widening
      // cast) so every consumer above resolves unchanged
      val scoreOut: Expression = {
        val f = GetStructField(colAttr, 0, Some("score"))
        if (score.dataType == DoubleType) f else Cast(f, score.dataType)
      }
      val idOut: Expression = {
        val f = GetStructField(colAttr, 1, Some("id"))
        if (id.dataType == LongType) f else Cast(f, id.dataType)
      }
      Project(
        parts.map(a => a: NamedExpression) ++ Seq(
          Alias(Add(posAttr, Literal(1)), rkAttr.name)(exprId = rkAttr.exprId),
          Alias(scoreOut, score.name)(exprId = score.exprId),
          Alias(idOut, id.name)(exprId = id.exprId)),
        gen)
    }
  }

  private def scoreTypes(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType || dt == IntegerType

  private def idTypes(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType
}
