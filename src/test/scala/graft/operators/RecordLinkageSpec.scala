package graft.operators

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def links(names: Seq[String]) = {
    val part = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("p_partkey", "p_name")
    RecordLinkage.nameLinks(part).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  test("one-word names block through the '' second-word key like the oracle") {
    // split_part(name,' ',2) = '' in DuckDB for one-word names — the
    // Spark side must coalesce its NULL getItem(1) to '' or these
    // never candidate despite jw('bolt','bolts') ≈ 0.96
    val got = links(Seq("bolt", "bolts", "unrelated zzz"))
    assert(got.keySet == Set(("bolt", "bolts")), s"got $got")
    assert(got(("bolt", "bolts")) > 0.9)
  }

  test("links aggregate record-pair volume as cnt_a * cnt_b") {
    val got = (Seq.fill(3)("cold bolt") ++ Seq.fill(2)("old bolt"))
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p_partkey", "p_name")
    val row = RecordLinkage.nameLinks(got).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("n_links") == 6L) // 3 × 2 record pairs
  }
}
