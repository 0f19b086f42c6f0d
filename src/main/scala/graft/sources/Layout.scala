package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on the
  * interleaved bits of two columns so files/row-groups are tight in
  * BOTH dimensions at once.
  *
  * Why this matters at 100 TB: min/max pruning (parquet row-group
  * stats, Delta/Iceberg file skipping) only skips data the layout
  * keeps NARROW. Sorting by `(a, b)` makes `a` ranges tight but
  * leaves `b` spanning its full domain in every file — a filter on
  * `b` alone prunes nothing. The Morton curve bounds BOTH per-file
  * ranges to ~√(files) of the domain, so single-column point/range
  * filters on either column skip most of the table. This is the
  * standard lakehouse `OPTIMIZE ZORDER BY` semantics, built from
  * plain Spark: a codegen'd bit-interleave expression +
  * `repartitionByRange` + `sortWithinPartitions`.
  *
  * The write itself is one range shuffle (sampled boundaries) — the
  * same cost as any global sort — and the expression is pure column
  * arithmetic (shift/and/or), fully inside whole-stage codegen.
  */
object Layout {

  /** Morton-interleave two bucketized columns (each already an int in
    * `[0, 2^bits)`): bit i of `a` lands at position 2i+1, bit i of
    * `b` at 2i. Plain shift/and/or column arithmetic — codegen'd.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** Scale a numeric column into `[0, 2^bits)` given its min/max —
    * the two scalars are the "model", computed once per write.
    */
  def bucketize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val buckets = 1L << bits
    val span = math.max(maxV - minV + 1, 1L)
    least(floor((c.cast("double") - lit(minV.toDouble)) / span * buckets),
      lit(buckets - 1)).cast("long")
  }

  /** Write `df` to parquet clustered on the z-value of (`colA`,
    * `colB`) across `numFiles` range partitions. One pass to collect
    * the two min/max pairs, one range shuffle to write.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 12): Unit = {
    val Array(minA, maxA, minB, maxB) =
      df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
          min(col(colB)).cast("long"), max(col(colB)).cast("long"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val z = interleave(
      bucketize(col(colA), minA, maxA, bits),
      bucketize(col(colB), minB, maxB, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
