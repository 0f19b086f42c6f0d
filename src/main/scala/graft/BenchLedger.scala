package graft

/** Chunked/resumable bench recording (r16 verdict item 1).
  *
  * The hostile-host problem this solves: the committed benchmark
  * protocol demands a guard-clean recording, but this box's quiet
  * windows are shorter than one 12–14-minute full-board run — 13/13
  * r16 attempts failed the whole-run steal/IO guard, leaving the
  * committed `bench_full.json` a round stale. Betting on ever-longer
  * quiet windows loses to an intermittent neighbor; the fix is to stop
  * needing one: record per-QUERY windows, keep the clean ones, retry
  * only the dirty ones.
  *
  * Mechanics: with `SPARK_GRAFT_LEDGER=<path>` set, each
  * `graft.Bench` run is one ATTEMPT — a fresh JVM (so first-run times
  * stay honest colds under the same AOT-warm + JIT-quiesce setup as a
  * full recording) that runs ONLY the queries not yet adopted. A query
  * is adopted when its cold window AND every warm-rep window were
  * individually clean: per-window host steal/iowait under the bounds
  * below (each QueryRun already samples /proc over its own wall), and
  * the containing PASS not `degraded` (the pass-level test also sees
  * the r13 load-vs-busy divergence regime, which per-window steal
  * cannot). Adopted records accumulate in the ledger (JSONL: one meta
  * line + one line per query); when the board empties, the ledger is
  * assembled into `bench_full.json` whose every number is
  * window-clean, with per-query attempt provenance embedded
  * (`attempt_of`) so the artifact carries its own assembly history.
  * `tools/record_bench.sh` is the retry loop.
  *
  * Cold comparability note: adopted colds come from DIFFERENT JVMs but
  * each is the query's first run in a fully-warmed-setup JVM — the
  * same definition every prior recording used; the shrinking board
  * only shortens attempts (later attempts fit inside shorter quiet
  * windows, which is the whole point).
  */
object BenchLedger {

  /** Per-window adoption bounds. The steal bound is ~6× this box's
    * measured healthy-burn steal share at full load and well under the
    * 0.5-core exoneration threshold (a window this clean can never be
    * host-exonerated-flagged); the iowait bound mirrors the pass-level
    * `degraded` rule. Overridable for other hosts via
    * SPARK_GRAFT_CLEAN_STEAL / SPARK_GRAFT_CLEAN_IOWAIT.
    */
  val DefaultCleanStealCores = 0.30
  val DefaultCleanIowaitCores = 1.50
  /** Foreign-PROCESS cores (other processes' CPU rate over the
    * window, from the same /proc busy−self delta the whole-run
    * foreign_cpu_sec uses): steal only sees hypervisor neighbors, but
    * an in-container contender (a concurrent build, a stray driver)
    * is invisible to steal AND to the load-divergence pass test while
    * fully poisoning the window. The container's constant background
    * is ~0.15 cores (measured across the r11 clean recordings); 1.0
    * sustained over a query window is a real co-runner.
    */
  val DefaultCleanForeignCores = 1.00

  /** One query's adopted numbers. `attempt` is the attempt whose COLD
    * window was clean; warm reps ACCUMULATE across attempts (r17: the
    * stubborn tail was multi-second-window queries whose cold + all
    * three warm windows never landed clean in one attempt under a
    * flickering neighbor — each rep only needs its OWN window clean,
    * so reps are harvested from whichever attempt provides them, with
    * `warmAttempts(i)` recording which one). A record is COMPLETE
    * when warm.size reaches the campaign's warmReps.
    *
    * `cleanAttempt` is the adoption TIER (r17): true when the cold
    * came from a whole-run UNcontended attempt. Per-window guards see
    * scheduling interference (steal/iowait/foreign) but not the
    * cache/membw contamination of a busy-but-not-stealing neighbor —
    * the first assembled board measured a broad 1.12× median cold
    * inflation on the 74 records window-cleanly adopted during two
    * heavily contended attempts. A tier-2 (contended-attempt) cold is
    * a valid fallback but stays UPGRADABLE: the first clean-attempt
    * run with a clean cold window replaces it, direction-blind, and
    * is then final (never best-of-N).
    */
  final case class Rec(name: String, attempt: Int, cold: Double,
                       gcMs: Long, heapMb: Long, rssMb: Long,
                       load1: Double, steal: Double, iowait: Double,
                       foreign: Double,
                       plan: String, warm: Seq[Double],
                       warmSteal: Seq[Double], warmIowait: Seq[Double],
                       warmForeign: Seq[Double],
                       warmAttempts: Seq[Int],
                       warmPlans: Seq[String],
                       cleanAttempt: Boolean) {
    def warmMedian: Double = {
      val s = warm.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def toJson: String = {
      def fmt(v: Double) = "%.2f".format(v)
      s"""{"q":"$name","attempt":$attempt,"cold":${fmt(cold)},""" +
        s""""gc_ms":$gcMs,"heap_mb":$heapMb,"rss_mb":$rssMb,""" +
        f""""load1":$load1%.2f,"steal_cores":${fmt(steal)},"iowait_cores":${fmt(iowait)},"foreign_cores":${fmt(foreign)},""" +
        s""""plan":"$plan","warm":[${warm.map(fmt).mkString(",")}],""" +
        s""""warm_steal":[${warmSteal.map(fmt).mkString(",")}],""" +
        s""""warm_iowait":[${warmIowait.map(fmt).mkString(",")}],""" +
        s""""warm_foreign":[${warmForeign.map(fmt).mkString(",")}],""" +
        s""""warm_attempts":[${warmAttempts.mkString(",")}],""" +
        s""""clean_attempt":$cleanAttempt,""" +
        s""""warm_plans":[${warmPlans.map("\"" + _ + "\"").mkString(",")}]}"""
    }
  }

  private def num(line: String, key: String): Double =
    ("\"" + key + "\":(-?[0-9.]+)").r.findFirstMatchIn(line)
      .map(_.group(1).toDouble).getOrElse(-1.0)
  private def str(line: String, key: String): String =
    ("\"" + key + "\":\"([^\"]*)\"").r.findFirstMatchIn(line)
      .map(_.group(1)).getOrElse("")
  private def numArr(line: String, key: String): Seq[Double] =
    ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(line)
      .map(_.group(1)).filter(_.nonEmpty).toSeq
      .flatMap(_.split(",").toSeq.map(_.toDouble))
  private def strArr(line: String, key: String): Seq[String] =
    ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(line)
      .map(_.group(1)).filter(_.nonEmpty).toSeq
      .flatMap(_.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\"")))

  def parseRec(line: String): Rec = {
    val attempt = num(line, "attempt").toInt
    val warm = numArr(line, "warm")
    val wa = numArr(line, "warm_attempts").map(_.toInt)
    Rec(
      name = str(line, "q"), attempt = attempt,
      cold = num(line, "cold"), gcMs = num(line, "gc_ms").toLong,
      heapMb = num(line, "heap_mb").toLong, rssMb = num(line, "rss_mb").toLong,
      load1 = num(line, "load1"), steal = num(line, "steal_cores"),
      iowait = num(line, "iowait_cores"),
      foreign = num(line, "foreign_cores"), plan = str(line, "plan"),
      warm = warm, warmSteal = numArr(line, "warm_steal"),
      warmIowait = numArr(line, "warm_iowait"),
      warmForeign = numArr(line, "warm_foreign"),
      // records written before warm accumulation carry no attempt
      // list — all their reps came from the cold's attempt
      warmAttempts = if (wa.size == warm.size) wa
                     else Seq.fill(warm.size)(attempt),
      warmPlans = strArr(line, "warm_plans"),
      // legacy records carry no tier — conservatively tier-2
      // (upgradable): their adopting attempt's whole-run state is
      // unknown, and an upgrade pass can only confirm or replace
      cleanAttempt = line.contains("\"clean_attempt\":true"))
  }

  /** (attempts recorded so far, adopted records by query name). */
  def read(path: String): (Int, Map[String, Rec]) = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return (0, Map.empty)
    val lines = java.nio.file.Files.readAllLines(p)
    var attempts = 0
    val recs = scala.collection.mutable.LinkedHashMap[String, Rec]()
    lines.forEach { l =>
      if (l.startsWith("{\"meta\"")) attempts = num(l, "attempts").toInt
      else if (l.startsWith("{\"q\"")) {
        val r = parseRec(l); recs(r.name) = r
      }
    }
    (attempts, recs.toMap)
  }

  def write(path: String, attempts: Int, sf: String, cpus: String,
            warmReps: Int, cleanSteal: Double, cleanIowait: Double,
            done: Map[String, Rec], pendingNames: Seq[String]): Unit = {
    val partialN = done.valuesIterator.count(_.warm.size < warmReps)
    val upgradableN = done.valuesIterator
      .count(r => r.warm.size >= warmReps && !r.cleanAttempt)
    val meta =
      f"""{"meta":1,"attempts":$attempts,"sf":"$sf","cpus":$cpus,"warm_reps":$warmReps,"clean_steal":$cleanSteal%.2f,"clean_iowait":$cleanIowait%.2f,"pending":${pendingNames.nonEmpty},"pending_n":${pendingNames.size},"partial_n":$partialN,"upgradable_n":$upgradableN,"pending_queries":[${pendingNames.sorted.map("\"" + _ + "\"").mkString(",")}]}"""
    val body = done.toSeq.sortBy(_._1).map(_._2.toJson)
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(path).toAbsolutePath.getParent, "ledger", ".tmp")
    java.nio.file.Files.writeString(tmp, (meta +: body).mkString("\n") + "\n")
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The assembled `bench_full.json` content: same top-level fields a
    * single-run recording writes (cold/warm maps, flags, telemetry,
    * warm_rep_times, plan_changes, totals) so every existing consumer
    * keeps working, plus the assembly provenance (`assembled`,
    * `attempts`, `attempt_of`, clean bounds). `contended` is false BY
    * CONSTRUCTION: every number came from an individually window-clean
    * run — that is the claim, and each record carries the windows to
    * audit it.
    */
  def assemble(done: Map[String, Rec], r1Baseline: Map[String, Double],
               sf: String, warmReps: Int, attempts: Int,
               cleanSteal: Double, cleanIowait: Double): String = {
    def fmt(v: Double) = "%.2f".format(v)
    val recs = done.toSeq.sortBy(_._1).map(_._2)
    val total = recs.map(_.cold).sum
    val warmTotal = recs.map(_.warmMedian).sum
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    recs.foreach { r =>
      val c = r.cold
      def tel =
        s""","gc_ms":${r.gcMs},"rss_mb":${r.rssMb},"plan":"${r.plan}"""" +
          s""","steal_cores":${fmt(r.steal)},"iowait_cores":${fmt(r.iowait)},"attempt":${r.attempt}"""
      val w = r.warmMedian
      if (c >= 2.0 && c > 2.0 * math.max(w, 0.05))
        flags += s"""{"q":"${r.name}","kind":"cold_vs_warm","cold":${fmt(c)},"ref":${fmt(w)},"ratio":${fmt(c / math.max(w, 0.05))}$tel}"""
      r1Baseline.get(r.name).foreach { b =>
        if (c >= 0.5 && c > 2.0 * b)
          flags += s"""{"q":"${r.name}","kind":"cold_vs_r1","cold":${fmt(c)},"ref":${fmt(b)},"ratio":${fmt(c / b)}$tel}"""
      }
      if (r.warm.nonEmpty && r.warm.max >= 1.0 &&
          r.warm.max > 2.0 * math.max(r.warm.min, 0.05))
        flags += s"""{"q":"${r.name}","kind":"warm_unstable","cold":${fmt(c)},"ref":${fmt(r.warm.min)},"ratio":${fmt(r.warm.max / math.max(r.warm.min, 0.05))},"reps":[${r.warm.map(fmt).mkString(",")}],"rep_steal_cores":[${r.warmSteal.map(fmt).mkString(",")}],"rep_iowait_cores":[${r.warmIowait.map(fmt).mkString(",")}]}"""
    }
    val telemetry = recs.map(r =>
      f""""${r.name}":{"gc_ms":${r.gcMs},"heap_mb":${r.heapMb},"rss_mb":${r.rssMb},"load1":${r.load1}%.2f,"steal_cores":${fmt(r.steal)},"iowait_cores":${fmt(r.iowait)},"foreign_cores":${fmt(r.foreign)},"plan":"${r.plan}"}""")
      .mkString("{", ",", "}")
    val warmRepTimes = recs.map(r =>
      s""""${r.name}":[${r.warm.map(fmt).mkString(",")}]""").mkString("{", ",", "}")
    val planChanges = recs.flatMap { r =>
      val hashes = r.plan +: r.warmPlans
      if (hashes.distinct.size > 1)
        Some(s""""${r.name}":[${hashes.map("\"" + _ + "\"").mkString(",")}]""")
      else None
    }.mkString("{", ",", "}")
    val attemptOf = recs.map(r => s""""${r.name}":${r.attempt}""")
      .mkString("{", ",", "}")
    val warmAttemptOf = recs.map(r =>
      s""""${r.name}":[${r.warmAttempts.mkString(",")}]""")
      .mkString("{", ",", "}")
    // colds still on tier 2 (adopted during a contended attempt, no
    // clean-attempt window replaced them before the campaign ended) —
    // named so the artifact discloses exactly which numbers carry
    // possible cache/membw contamination the window guards can't see
    val tier2 = recs.filterNot(_.cleanAttempt).map(_.name)
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sf","contended":false,
       |"assembled":true,"attempts":$attempts,"clean_steal_cores":${fmt(cleanSteal)},"clean_iowait_cores":${fmt(cleanIowait)},
       |"warm_total":${fmt(warmTotal)},"warm_reps":$warmReps,
       |"flags":${flags.mkString("[", ",", "]")},
       |"attempt_of":$attemptOf,
       |"warm_attempt_of":$warmAttemptOf,
       |"cold_tier2_n":${tier2.size},"cold_tier2":[${tier2.sorted.map("\"" + _ + "\"").mkString(",")}],
       |"telemetry":$telemetry,
       |"plan_changes":$planChanges,
       |"warm_rep_times":$warmRepTimes,
       |"cold":${recs.map(r => "\"" + r.name + "\":" + fmt(r.cold)).mkString("{", ",", "}")},
       |"warm":${recs.map(r => "\"" + r.name + "\":" + fmt(r.warmMedian)).mkString("{", ",", "}")}}""".stripMargin
  }
}
