package graft.queries

/** Build-cost bookkeeping for the LAZY store-twin fixtures (q113/q115/
  * q116/q117/q118…): each twin buys a physical layout ONCE per testdata
  * fingerprint and amortizes it across every later run — a fair framing
  * (a layout is bought once, like any physical design), but the r18
  * verdict flagged that the bench never REPORTED the buy-in, so the
  * twin-vs-raw comparisons carried their amortization implicitly. The
  * builder wraps its one-time build in [[timed]], which persists the
  * wall-clock seconds as `<root>/_build_sec` next to the fixture;
  * every call (build or cache hit) [[track]]s the root, and the bench
  * collects `build_sec` per twin from the tracked roots — so the
  * artifact shows the amortized cost even on runs that found the
  * fixture already built. */
object FixtureBuild {

  private val roots =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Remember where `name`'s fixture lives (called on EVERY query run,
    * build or not) so [[report]] can find its recorded build cost. */
  def track(name: String, root: String): Unit = roots(name) = root

  /** Run the one-time build, recording its wall-clock seconds in
    * `<root>/_build_sec` (best-effort — a failed write never fails the
    * build). */
  def timed[T](name: String, root: String)(build: => T): T = {
    track(name, root)
    val t0 = System.nanoTime()
    val r = build
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: a comma-decimal default locale would write "1,234",
    // fail report()'s toDouble round-trip and silently drop the cost
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_build_sec"),
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec)))
    catch { case scala.util.control.NonFatal(_) => () }
    r
  }

  /** Recorded build seconds per tracked twin — read from the fixture
    * roots, so pre-built fixtures report the cost their ORIGINAL build
    * paid. */
  def report(): Map[String, Double] =
    roots.toMap.flatMap { case (name, root) =>
      try {
        val p = java.nio.file.Paths.get(root, "_build_sec")
        if (java.nio.file.Files.exists(p))
          Some(name -> java.nio.file.Files.readString(p).trim.toDouble)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}
