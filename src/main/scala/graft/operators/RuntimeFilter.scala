package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction via Bloom filter — the classic runtime-filter
  * pattern for star joins whose dimension side is selective but too large
  * (or too late-filtered) to broadcast.
  *
  * A plain `fact ⋈ dim` shuffles the ENTIRE fact table on the join key even
  * when the (filtered) dim side retains only a sliver of the key space. The
  * runtime-filter form first builds a Bloom filter over the dim side's keys
  * (one small aggregation job), broadcasts it to every fact partition, and
  * drops non-matching fact rows BEFORE the shuffle. False positives only
  * cost wasted shuffle rows — the exact join behind the filter makes the
  * final result identical to the plain join, so the rewrite is always
  * semantics-preserving.
  *
  * At 100 TB this is the single highest-leverage join optimization after
  * broadcast: a 1% -selective dim turns a 100 TB shuffle into a ~1 TB one.
  * (Catalyst's own injected runtime filters —
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` — apply the same idea
  * automatically when a selective filter sits on the build side; this
  * operator is the explicit form for when the planner can't see the
  * selectivity, e.g. a dim produced by an arbitrary subquery.)
  */
object RuntimeFilter {

  /** Exact inner equi-join `big ⋈ small on bigKey = smallKey` with the big
    * side pre-pruned by a Bloom filter of the small side's keys.
    *
    * `expectedKeys`/`fpp` size the filter (bits ≈ -n·ln(fpp)/ln2²; the
    * default 1M keys at 3% fpp is ~0.9 MB — cheap to broadcast). Join keys
    * must be integral (long-compatible) — the common surrogate-key case.
    * The small side is computed twice (filter build + join); pass a
    * checkpointed/cached frame if it is expensive. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // DataFrameStatFunctions.bloomFilter NPEs on a zero-row build side
    // (nothing ever merges into the sketch buffer), so probe emptiness
    // first — one cheap first-row job, and it keeps a genuine failure in
    // the sketch build distinguishable from "no build rows" (an empty
    // build side means an empty join: prune everything with a
    // constant-false filter, same plan shape, zero fact rows shuffled).
    val pruned =
      if (small.select(col(smallKey)).isEmpty) big.where(lit(false))
      else {
        val bf = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
        // Codegen probe (functions/BloomMightContain.scala): stays inside
        // the fact scan's whole-stage-codegen span, no per-row boxing; the
        // filter ships in the codegen references array once per stage.
        big.where(graft.functions.BloomMightContain(col(bigKey), bf))
      }
    // Dataframe-qualified key references so bigKey == smallKey (the common
    // same-name surrogate-key case) doesn't raise AMBIGUOUS_REFERENCE.
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
