package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `topk_by_score(score, id, k)` →
  * `array<struct<score double, id bigint>>` sorted score DESC with
  * id ASC tie-break.
  *
  * Why this exists (SURVEY.md §7.5): the window formulation
  * (`row_number() OVER (PARTITION BY q ORDER BY score DESC) <= k`)
  * ranks by SORTING. Spark 4's `InferWindowGroupLimit` does cap its
  * shuffle at k rows per map partition per group, but it finds them
  * by fully sorting every map partition — O(n log n) comparisons on
  * the corpus — and sorts again after the exchange before the Window
  * pass. This TypedImperativeAggregate keeps a k-element min-heap
  * per partition (partial aggregation, map-side combined): the same
  * O(partitions × k) shuffle volume, but one O(n log k) streaming
  * scan instead of two sorts and a window. At 100 TB the corpus ×
  * queries scored set is the dominant data volume, and not sorting
  * it is the difference that matters. The optimizer rule
  * [[graft.plans.WindowTopKToHeap]] rewrites guarded window
  * formulations into this aggregate automatically.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"topk_by_score k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  // min-heap on (score asc, id desc): head is the WORST kept entry,
  // so a better candidate evicts it in O(log k)
  private def ordering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ordering)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
                  e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else {
      val worst = buf.head
      // keep if strictly better: higher score, or equal score with lower id
      if (e._1 > worst._1 || (e._1 == worst._1 && e._2 < worst._2)) {
        buf.dequeue(); buf.enqueue(e)
      }
    }
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(add(b1, _)); b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by_score",
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
      "scala_udf")

  /** Column API (requires [[register]] on the session). */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    call_function("topk_by_score", score, id,
      org.apache.spark.sql.functions.lit(k))
}
