package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: salted equi-join for hot keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on in GraftSession) handles most skew at runtime; explicit salting
  * remains the tool when one side must replicate — e.g. a fact table
  * where 1% of keys carry 50% of rows joined to a medium right side
  * that is too big to broadcast.
  *
  * `saltedJoin` replicates each RIGHT row `salt` times and scatters
  * LEFT rows uniformly across the salt space, so a hot key's rows
  * spread over `salt` reducers instead of one.
  */
object Skew {

  /** Deterministic salt: hash of the row's full column content.
    * `monotonically_increasing_id()` would distribute marginally
    * better on duplicate-heavy data, but it is NONDETERMINISTIC —
    * under a fetch-failure/stage-retry partial recompute, a row can
    * be re-salted into a different bucket and be lost from one
    * partial and double-counted in another (the SPARK-23207 hazard
    * class). A content hash re-salts identically on recompute, at
    * the cost that byte-identical duplicate rows share a bucket.
    *
    * Spark's `hash()` rejects MapType (map iteration order is
    * undefined, so a map hash would itself be nondeterministic —
    * exactly the hazard this salt avoids), so salt input is the
    * row's HASHABLE columns only. If every column is a map the salt
    * degenerates to a constant: correct (joins/aggs still work) but
    * no skew mitigation — pass a PK-based salt column explicitly in
    * that case, as `skew_salted_agg` does.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fs) => fs.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  private def contentSalt(df: DataFrame, salt: Int): Column = {
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    if (hashable.isEmpty) lit(0)
    else pmod(hash(hashable.toIndexedSeq: _*), lit(salt))
  }

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt", contentSalt(left, salt))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate
    * on (key, salt) — spreading a hot key over `salt` reducers — then
    * final-aggregate on key. Only decomposable aggregates (sum/count/
    * min/max) survive the split; this helper does sum.
    *
    * Spark's own partial aggregation usually makes this unnecessary
    * (map-side combine already bounds reducer input by distinct keys
    * per partition); it pays off when the DISTINCT KEY COUNT per
    * partition is huge but one key dominates row counts.
    */
  def saltedSumAgg(df: DataFrame, key: String, valueCol: String,
                   salt: Int = 8): DataFrame =
    df.withColumn("__salt", contentSalt(df, salt))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Diagnostic: rows-per-key histogram quantiles, to decide whether
    * salting is warranted before paying for it.
    */
  def keySkew(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("rows"))
      .agg(max(col("rows")).as("max_rows"),
        expr("percentile(rows, 0.99)").as("p99_rows"),
        avg(col("rows")).as("avg_rows"))

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    // Salted two-phase aggregation over a 3-value (maximally skewed)
    // group key, oracle-verified: the salt is a DETERMINISTIC hash of
    // the primary key (so stage retries re-salt identically — see
    // contentSalt), and partials accumulate in EXACT decimal, so the
    // salt split cannot perturb the sums regardless of which bucket a
    // row lands in.
    "skew_salted_agg" -> ((s, dir) => {
      val l = graft.catalog.Tables(s, dir).lineitem
      l.withColumn("__salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(8)))
        .groupBy(col("l_returnflag"), col("__salt"))
        .agg(sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)))
          .as("p"), count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("p")).cast("double").as("sum_price"),
          sum(col("c")).as("n_lines"))
    })
  )

  def oracles: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_price,
        |  cast(count(*) AS bigint) AS n_lines
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
