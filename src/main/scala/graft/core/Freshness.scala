package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Epoch-keyed derivation registry (reference ADR-207 freshness contract:
  * generation counters + registered derivations with whole-tier eviction,
  * api/app/lib/freshness.py, grounding.py:55-68,647-733, and the CI
  * conformance test tests/unit/lib/test_freshness_contract.py).
  *
  * A derivation is a named function of the source tables. Each cached
  * result is keyed by the committed epoch observed at compute time; when
  * the clock advances, the stale entry is dropped and the derivation
  * recomputes on next access. `persist()` backs the cache so repeated reads
  * within an epoch hit executor memory, not recompute.
  */
final class Freshness(committedEpoch: () => Long) {
  import Freshness.Entry

  private val derivations = TrieMap.empty[String, () => DataFrame]
  private val cache = TrieMap.empty[String, Entry]

  /** Register a named derivation (idempotent, latest wins). */
  def register(name: String)(compute: => DataFrame): Unit =
    derivations.put(name, () => compute)

  def registered: Set[String] = derivations.keySet.toSet

  /** Fetch the derivation at the current committed epoch — cached if the
    * clock hasn't advanced, recomputed (and re-persisted) otherwise. */
  def get(name: String): DataFrame = {
    val compute = derivations.getOrElse(name,
      throw new IllegalArgumentException(s"unregistered derivation: $name"))
    val epoch = committedEpoch()
    cache.get(name) match {
      case Some(e) if e.epoch == epoch => e.df
      case stale =>
        stale.foreach(_.df.unpersist())
        val df = compute().persist()
        cache.put(name, Entry(epoch, df))
        df
    }
  }

  /** The epoch a cached derivation was computed at (conformance probe). */
  def cachedEpoch(name: String): Option[Long] = cache.get(name).map(_.epoch)

  /** Drop every cached tier (the reference's whole-tier evict on bump). */
  def invalidateAll(): Unit = {
    cache.values.foreach(_.df.unpersist())
    cache.clear()
  }
}

private object Freshness {
  // Top-level so the (epoch, df) cache-entry type test carries no outer
  // reference (silences the unchecked-outer-reference warning).
  final case class Entry(epoch: Long, df: DataFrame)
}
