package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode}

/** Streaming MinHash-LSH near-duplicate detection — the unbounded-feed
  * complement to `Dedup.minhashPairs`: as documents arrive, emit each
  * (earlier_doc, new_doc) pair whose MinHash signatures estimate
  * Jaccard ≥ threshold, matching new docs against ALL history within
  * the state horizon without ever rescanning it.
  *
  * Dataflow (one pass, no feedback loop):
  *   text → MinHash60 signature (a codegen'd map, same expression and
  *   banding as the batch path) → explode to (band, sig) bucket keys →
  *   `transformWithState` keyed by bucket: state is the list of
  *   (doc_id, signature) previously seen in that bucket; each incoming
  *   doc compares against the bucket's history (signature-estimated
  *   Jaccard = matching components / NumPerms), emits qualifying
  *   pairs, then appends itself.
  *
  * Scale properties:
  *  - State is O(docs per horizon × 8 bands × 136 B) — the TTL evicts
  *    buckets untouched past the horizon, which is what keeps an
  *    unbounded 100 TB/day feed viable; a duplicate arriving later
  *    than the horizon is by contract no longer detectable (same
  *    contract as `EventsStream.dedupStream`).
  *  - Per-batch work is one shuffle onto bucket keys; a batch doc
  *    compares only against its buckets' members, never the corpus.
  *  - VERIFICATION is signature-estimated, not exact: the batch path
  *    re-checks candidates against real shingle sets, but a stream
  *    cannot fetch history text without storing it. 16 components at
  *    est ≥ 0.5 ⇒ σ ≈ 0.125; callers needing exactness route the
  *    emitted pairs through a batch verify against a doc store.
  *  - A pair colliding in k > 1 bands emits once per colliding band
  *    (buckets are independent); downstream `dropDuplicates` or the
  *    batch verify absorbs the fan-in. Emission order within a bucket
  *    is by arrival; doc_a < doc_b is NOT guaranteed across batches —
  *    earlier-seen id first.
  */
object StreamingNearDup extends StreamingProvider {

  case class BandedDoc(bucket: String, doc_id: Long, mh: Array[Long])
  case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  private val NumPerms = 16
  private val BandRows = 2

  private class BucketProcessor(threshold: Double, ttl: TTLConfig)
      extends StatefulProcessor[String, BandedDoc, NearDupPair] {
    @transient private var seen: ListState[(Long, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(Long, Array[Long])]("seen",
        Encoders.tuple(Encoders.scalaLong,
          Encoders.javaSerialization[Array[Long]]), ttl)

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[NearDupPair] = {
      val out = collection.mutable.ArrayBuffer.empty[NearDupPair]
      // deterministic within-batch order: by doc_id, so a batch
      // replayed after a crash emits the identical pair set
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        val history = seen.get()
        while (history.hasNext) {
          val (prevId, prevMh) = history.next()
          if (prevId != d.doc_id) {
            var m = 0
            var i = 0
            while (i < NumPerms) {
              if (prevMh(i) == d.mh(i)) m += 1
              i += 1
            }
            val est = m.toDouble / NumPerms
            if (est >= threshold) out += NearDupPair(prevId, d.doc_id, est)
          }
        }
        seen.appendValue((d.doc_id, d.mh))
      }
      out.iterator
    }
  }

  /** (bucket, doc_id, signature) rows: 8 per doc, same banding as the
    * batch path (band index + comma-joined member hashes).
    */
  private[streaming] def bandedSignatures(docs: DataFrame): DataFrame = {
    graft.functions.ShingleKernel.register(docs.sparkSession)
    // ≥ 2 words ⟺ ≥ 1 bigram, and the signature comes straight from
    // the text bytes in one fused pass (r17: MinHashText — identical
    // output to minhash60 over the distinct-bigram array, since a
    // min is distinct-insensitive; token_count ≡ size(split(trim,
    // "\\s+")), see ShingleKernelSpec)
    docs.filter(graft.functions.ShingleKernel.token_count(col("text")) >= 2)
      .withColumn("mh",
        graft.functions.ShingleKernel.minhash60_text(col("text"), NumPerms))
      .select(col("doc_id"), col("mh"), posexplode(array(
        (0 until NumPerms / BandRows).map { b =>
          val members = (b * BandRows until (b + 1) * BandRows)
            .map(i => element_at(col("mh"), i + 1).cast("string"))
          concat_ws(",", (lit(b.toString) +: members): _*)
        }: _*)))
      .select(col("col").as("bucket"), col("doc_id"), col("mh"))
  }

  /** Near-dup pair stream over a documents stream `(doc_id, text)`.
    * `horizon` bounds state (None = remember forever — tests only).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
                   horizon: Option[java.time.Duration] = None): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ttl = horizon.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    bandedSignatures(docs).as[BandedDoc]
      .groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(threshold, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  /** Oracle-pinned run of the REAL streaming dataflow (r7's
    * stream_hourly_counts pattern, extended to a stateful processor):
    * the documents table is drained as an AvailableNow file stream
    * through [[nearDupPairs]] — MinHash60 signatures, banding, the
    * RocksDB-backed bucket state, the pair emission — and the emitted
    * relation lands under the driver's DuckDB hash gate. Distinct
    * collapses the one-emission-per-colliding-band fan-in (the est is
    * a pure function of the pair, so duplicates are exact copies),
    * and est = m/16 is a dyadic rational — bit-identical in any
    * engine. Pair orientation is NORMALIZED (least/greatest) before
    * the distinct: the processor emits earlier-seen id first, which
    * matches doc_a < doc_b only when the whole file drains in one
    * micro-batch — a multi-file input or maxFilesPerTrigger split
    * would flip orientation batch-dependently (r9 advice). The
    * RocksDB provider conf is scoped + state unloaded afterwards via
    * [[EventsStream.withRocksDbStateStore]].
    */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "stream_neardup_pairs" -> ((s, dir) =>
      EventsStream.withRocksDbStateStore(s) {
        val schema = s.read.parquet(s"$dir/documents.parquet").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .select(col("doc_id"), col("text"))
        EventsStream.runAvailableNow(nearDupPairs(stream).toDF(),
          "stream_neardup_sink")
        s.table("stream_neardup_sink")
          .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
            greatest(col("doc_a"), col("doc_b")).as("doc_b"),
            col("est_jaccard")).distinct()
      })
  )

  def oracles: Map[String, String] = Map(
    // the signature-estimated Jaccard the stream computes: banded
    // candidates (the shared md5-minhash CTE chain), then matching
    // components / 16 — threshold 0.5 ⟺ ≥ 8 matches
    "stream_neardup_pairs" ->
      s"""WITH ${graft.operators.Dedup.minhashOracleCtes("documents")},
         |est AS (
         |  SELECT c.doc_a, c.doc_b,
         |    sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::DOUBLE / 16.0
         |      AS est_jaccard
         |  FROM cands c
         |  JOIN minhashes a ON a.doc_id = c.doc_a
         |  JOIN minhashes b ON b.doc_id = c.doc_b AND b.i = a.i
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, est_jaccard
         |FROM est WHERE est_jaccard >= 0.5""".stripMargin
  )
}
