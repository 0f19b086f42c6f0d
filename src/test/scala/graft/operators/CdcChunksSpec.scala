package graft.operators

import graft.SparkSpec

/** Pins the property content-defined chunking exists for: an edit
  * near the start of a document perturbs only the chunks up to the
  * next hash boundary, while fixed-stride chunking shifts every
  * chunk after the edit. Without this property chunk-level dedup
  * across document versions finds nothing.
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String): Seq[String] =
    CurationFilters.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"chunk_text")
      .collect().map(_.getString(0)).toSeq

  test("an insertion near the start re-chunks only a bounded prefix") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(400)(s"w${rnd.nextInt(50)}")
    val a = chunksOf(words.mkString(" "))
    val b = chunksOf(("INSERTED" +: words).mkString(" "))
    assert(a.size > 20, s"expected many chunks, got ${a.size}")
    // all chunks after the boundary that absorbs the edit are
    // byte-identical — chunk-level dedup keeps matching them
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 3,
      s"CDC lost locality: only ${shared.size} of ${a.size} chunks survive a 1-word insert")
    // sanity: the fixed-stride equivalent shares (almost) nothing —
    // every window is shifted by one word
    val strideA = words.grouped(64).map(_.mkString(" ")).toSet
    val strideB = ("INSERTED" +: words).grouped(64).map(_.mkString(" ")).toSet
    assert(strideA.intersect(strideB).size <= 1,
      "stride chunking unexpectedly stable — test premise broken")
  }

  test("chunks reassemble to the original document, boundaries deterministic") {
    val words = Seq.tabulate(300)(i => s"t${i % 40}")
    val text = words.mkString(" ")
    val a = chunksOf(text)
    assert(a.mkString(" ") == text, "chunk concatenation must reproduce the doc")
    assert(chunksOf(text) == a, "chunking must be deterministic")
  }
}
