package graft

/** The `SPARK_GRAFT_SUBSET` query filter shared by every entry point
  * (Bench, Verify): comma-separated globs over query names; unset =
  * everything selected, so the driver's full-suite protocol is
  * unchanged. ONE implementation — the glob-splice logic
  * (Pattern.quote + \\E.*\\Q) was previously copy-pasted into both
  * mains, where a future glob-syntax tweak applied to one would
  * silently change which queries the other runs (r11 advice).
  */
object Subset {
  def selected(name: String): Boolean =
    sys.env.get("SPARK_GRAFT_SUBSET").forall(_.split(",")
      .exists(g => name.matches(
        java.util.regex.Pattern.quote(g.trim).replace("*", "\\E.*\\Q"))))
}
