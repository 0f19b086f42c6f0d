package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters aggregate:
  * `heavy_hitters(item, capacity)` →
  * `array<struct<item string, est bigint>>` sorted est DESC, item ASC.
  *
  * The third mergeable summary next to HLL (distinct counts) and KLL
  * (quantiles) in [[graft.operators.Sketches]]: an exact top-k over
  * token frequency shuffles the full distinct-token relation; this
  * keeps ≤ `capacity` counters per partition, merged associatively
  * (pointwise sum, then subtract the (capacity+1)-th largest count
  * and drop non-positives — Agarwal et al., "Mergeable Summaries",
  * PODS'12), so the shuffle is O(partitions × capacity) regardless
  * of vocabulary size.
  *
  * Guarantee (any merge order): every item with true frequency
  * > n / (capacity+1) of the n observed rows is retained, and each
  * estimate lies in [true − n/(capacity+1), true]. Estimates are NOT
  * exact counts — callers needing exact figures join the survivors
  * back against the data (candidates-then-verify, like every other
  * sketch path here).
  */
case class HeavyHitters(
    item: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val cap: Int = capExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"heavy_hitters capacity must be a positive integer literal, got $other")
  }

  // misuse fails at analysis with a clear message, not as a
  // ClassCastException in update() on an executor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item column, got ${item.dataType.sql}")
    else capExpr match {
      case Literal(v: Int, IntegerType) if v > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName capacity must be a positive foldable integer, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(item, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < cap => buf.update(s, 1L)
        case None =>
          // classic MG decrement step: one uncounted arrival cancels
          // one unit of every tracked counter (amortized O(1): each
          // decrement pays for a prior increment)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1
            if (c == 0L) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Pointwise sum, then shrink back to `cap` entries by subtracting
    * the (cap+1)-th largest count — the mergeable-summaries MG merge;
    * error adds across inputs, membership guarantee is preserved.
    */
  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > cap) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - cap - 1) // (cap+1)-th largest
      val dead = b1.iterator.collect { case (k, c) if c - t <= 0L => k }.toList
      dead.foreach(b1.remove)
      b1.keysIterator.toList.foreach(k => b1.update(k, b1(k) - t))
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toSeq.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.size)
    items.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(item = newChildren(0), capExpr = newChildren(1))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => HeavyHitters(exprs(0), exprs(1)).toAggregateExpression(),
      "scala_udf")

  /** Column API (requires [[register]] on the session). */
  def heavy_hitters(item: Column, capacity: Int): Column =
    call_function("heavy_hitters", item,
      org.apache.spark.sql.functions.lit(capacity))
}
