package graft.operators

/** Size bound for the cross-session derived stores
  * (`target/derived/models`, `target/derived/verdicts`): each entry is
  * keyed by a corpus fingerprint, so on a long-lived box every
  * regenerated corpus / schema tweak mints a fresh key and the
  * directories grow forever (r16 verdict item 6). Entries are pure
  * CACHES — evicting a live one only costs a retrain or re-probe — so
  * the bound is LRU by file mtime: disk-hit reads `touch` their entry,
  * writes `evictPast` the oldest entries over the cap. Both are
  * best-effort (a filesystem that refuses the mtime update degrades to
  * FIFO, never to an error on the query path).
  */
private[operators] object DerivedStore {
  /** Models are k×dim-ish text matrices, a few KB each; 64 live corpus
    * fingerprints is far beyond any realistic concurrent-corpus count.
    */
  val ModelCap = 64

  /** Verdicts are one boolean each; keys churn faster than models
    * (several probe kinds per corpus per pipeline), so the cap is
    * wider. Still bytes on disk — the cap bounds ENTRY COUNT so a
    * directory listing (and this eviction scan) stays O(cap).
    */
  val VerdictCap = 512

  def touch(f: java.io.File): Unit =
    try
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Throwable => () }

  def evictPast(dir: java.io.File, cap: Int): Unit =
    try {
      val files = Option(dir.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.endsWith(".tmp"))
      if (files.length > cap)
        files.sortBy(f => (f.lastModified(), f.getName))
          .take(files.length - cap).foreach(_.delete())
    } catch { case _: Throwable => () }
}
