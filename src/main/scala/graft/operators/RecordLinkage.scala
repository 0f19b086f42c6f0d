package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Record linkage (entity resolution): find records that refer to the
  * same real-world entity under typos and variant spellings — the
  * classic blocked fuzzy-match pipeline (Fellegi–Sunter shape):
  * exact-dedup → block → score → threshold → transitive closure.
  *
  * Scale design — the same exact-then-near composition the dedup
  * family uses, because linkage keys repeat heavily in real data:
  * the ONLY corpus-sized operation is the first `groupBy(name)`
  * (map-side combined); everything after runs on the DISTINCT-name
  * relation, which is vocabulary-bounded (≪ corpus — here 64 names
  * over 2 000/20 000 parts; a 100 TB customer file has millions of
  * distinct names, still thousands of times smaller than the record
  * count). Pair volume is bounded per BLOCK, and the output is
  * reported at name-pair grain with the record-pair count
  * `n_links = cnt_a·cnt_b` carried as arithmetic — never the
  * quadratic record-pair explosion itself.
  *
  * Blocking is multi-pass OR (standard recall device): a candidate
  * survives if the two names share their FIRST word or their SECOND
  * word; each pass is an equi-join on its block key, and passes are
  * unioned then deduped at name-pair grain. Scoring is the native
  * codegen [[graft.functions.JaroWinkler]] expression, bit-compatible
  * with DuckDB's `jaro_winkler_similarity` so the oracle pins every
  * scored pair exactly (scores rounded to 6 dp on both sides).
  */
object RecordLinkage {

  /** Same-entity threshold: 0.9 keeps the one-edit adjective pairs
    * ("cold bolt" ~ "old bolt", jw ≥ .958) and the closest same-
    * adjective noun confusions, and drops the broad same-first-word
    * field (jw ≈ .88 and below). Exactly representable in binary, so
    * the >= compare can't flip between engines.
    */
  val LinkThreshold = 0.9

  /** Distinct linkage keys with their record count and a stable name
    * id (min record key) — the rep relation every later stage runs on.
    */
  private def nameReps(part: DataFrame): DataFrame =
    part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt"), min(col("p_partkey")).as("nid"))

  /** Blocked candidate name pairs (name_a < name_b), multi-pass OR
    * blocking on word 1 and word 2.
    */
  private def candidatePairs(names: DataFrame): DataFrame = {
    // missing word ⇒ '' like the oracle's split_part (`get` tolerates
    // the short array — ANSI getItem would throw — and the NULL it
    // returns must become '' or a one-word name silently falls out of
    // the second blocking pass while the oracle still scores it)
    val blocked = names.select(col("name"),
        coalesce(get(split(col("name"), " "), lit(0)), lit("")).as("k"))
      .unionAll(names.select(col("name"),
        coalesce(get(split(col("name"), " "), lit(1)), lit("")).as("k")))
      .distinct()
    blocked.as("x")
      .join(blocked.as("y").hint("shuffle_hash"),
        col("x.k") === col("y.k") && col("x.name") < col("y.name"))
      .select(col("x.name").as("name_a"), col("y.name").as("name_b"))
      .distinct()
  }

  /** Scored links at name-pair grain: (name_a, name_b, jw, n_links)
    * for jw ≥ `threshold`, n_links = how many RECORD pairs this name
    * pair represents.
    */
  def nameLinks(part: DataFrame,
                threshold: Double = LinkThreshold): DataFrame = {
    graft.functions.JaroWinkler.register(part.sparkSession)
    val names = nameReps(part)
    val scored = candidatePairs(names)
      .withColumn("jw",
        graft.functions.JaroWinkler.jaro_winkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= threshold)
    // the names relation is vocabulary-sized — broadcast both count
    // lookups rather than shuffling the scored pairs twice
    scored
      .join(broadcast(names.select(col("name").as("name_a"),
        col("cnt").as("ca"))), Seq("name_a"))
      .join(broadcast(names.select(col("name").as("name_b"),
        col("cnt").as("cb"))), Seq("name_b"))
      .select(col("name_a"), col("name_b"),
        round(col("jw"), 6).as("jw"),
        (col("ca") * col("cb")).as("n_links"))
  }

  /** Entity clusters: transitive closure over qualifying links
    * (min-label propagation on the name-id graph — the documented
    * record-linkage hazard is exactly this closure chaining
    * borderline links into one entity, so the report shows the
    * cluster-size histogram: `cluster_size` in distinct names,
    * `n_clusters`, and the record volume `n_parts` each stratum
    * holds).
    */
  def linkageClusters(part: DataFrame,
                      threshold: Double = LinkThreshold): DataFrame = {
    graft.functions.JaroWinkler.register(part.sparkSession)
    val names = nameReps(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val links = candidatePairs(names)
      .withColumn("jw",
        graft.functions.JaroWinkler.jaro_winkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= threshold)
      .join(broadcast(names.select(col("name").as("name_a"),
        col("nid").as("doc_a"))), Seq("name_a"))
      .join(broadcast(names.select(col("name").as("name_b"),
        col("nid").as("doc_b"))), Seq("name_b"))
      .select(col("doc_a"), col("doc_b"))
    val labels = Dedup.labelPropagation(links)
    val clusters = names
      .join(labels.withColumnRenamed("id", "nid")
        .withColumnRenamed("cluster_id", "lbl"), Seq("nid"), "left")
      .select(col("name"), col("cnt"),
        coalesce(col("lbl"), col("nid")).as("cluster_id"))
    clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("k"), sum(col("cnt")).as("np"))
      .groupBy(col("k").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("np")).as("n_parts"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "linkage_name_pairs" -> ((s, dir) => nameLinks(Tables(s, dir).part)),
    "linkage_clusters" -> ((s, dir) => linkageClusters(Tables(s, dir).part))
  )

  /** Shared oracle CTE text: distinct names, OR-blocking, candidate
    * pairs, qualifying links.
    */
  private val oracleCtes: String =
    s"""names AS (
       |  SELECT p_name AS name, cast(count(*) AS bigint) AS cnt,
       |    min(p_partkey) AS nid
       |  FROM part GROUP BY 1),
       |blocked AS (
       |  SELECT name, split_part(name, ' ', 1) AS k FROM names
       |  UNION
       |  SELECT name, split_part(name, ' ', 2) FROM names),
       |cand AS (
       |  SELECT DISTINCT x.name AS name_a, y.name AS name_b
       |  FROM blocked x JOIN blocked y
       |    ON x.k = y.k AND x.name < y.name),
       |links AS (
       |  SELECT name_a, name_b,
       |    jaro_winkler_similarity(name_a, name_b) AS jw
       |  FROM cand
       |  WHERE jaro_winkler_similarity(name_a, name_b) >= $LinkThreshold)""".stripMargin

  def oracles: Map[String, String] = Map(
    "linkage_name_pairs" ->
      s"""WITH $oracleCtes
         |SELECT l.name_a, l.name_b, round(l.jw, 6) AS jw,
         |  cast(a.cnt * b.cnt AS bigint) AS n_links
         |FROM links l
         |JOIN names a ON l.name_a = a.name
         |JOIN names b ON l.name_b = b.name""".stripMargin,
    "linkage_clusters" ->
      s"""WITH RECURSIVE $oracleCtes,
         |edges AS (
         |  SELECT a.nid AS na, b.nid AS nb
         |  FROM links l
         |  JOIN names a ON l.name_a = a.name
         |  JOIN names b ON l.name_b = b.name),
         |undirected AS (
         |  SELECT na AS a, nb AS b FROM edges
         |  UNION ALL
         |  SELECT nb, na FROM edges),
         |reach(id, lbl) AS (
         |  SELECT nid, nid FROM names
         |  UNION
         |  SELECT u.b, r.lbl FROM undirected u JOIN reach r ON r.id = u.a),
         |clusters AS (
         |  SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |stats AS (
         |  SELECT c.cluster_id, cast(count(*) AS bigint) AS k,
         |    cast(sum(n.cnt) AS bigint) AS np
         |  FROM names n JOIN clusters c ON n.nid = c.id
         |  GROUP BY 1)
         |SELECT k AS cluster_size, cast(count(*) AS bigint) AS n_clusters,
         |  cast(sum(np) AS bigint) AS n_parts
         |FROM stats GROUP BY k""".stripMargin
  )
}
