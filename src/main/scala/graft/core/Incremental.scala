package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates over an append-only,
  * epoch-stamped table — one step past the reference's freshness model:
  * where the reference invalidates a cache when the committed epoch
  * advances and recomputes from scratch (grounding.py:55-68,
  * confidence_analyzer.py:116-143), this maintains the aggregate by
  * scanning ONLY the rows appended since the last maintained epoch and
  * merging them into the prior result.
  *
  * Cost per advance is O(delta) + O(groups) instead of O(table): at a
  * 100 TB table with a 10 GB daily delta that is the difference between
  * a full recompute and a trickle. Correct for algebraic aggregates
  * (count / sum — and avg, min, max as derived/merge-able forms) because
  * they decompose into per-partition partials merged by the same
  * operation; the spec proves merge ≡ full recompute across any advance
  * schedule.
  *
  * Works with [[Freshness]]: register the advance as the derivation and
  * key it on the epoch clock; or drive it from a Structured Streaming
  * `foreachBatch` where each micro-batch IS the delta.
  */
object Incremental {

  /** A maintained aggregate: result as-of `upToEpoch` (exclusive upper
    * bound = the max epoch id folded in so far). */
  final case class MaintainedAgg(upToEpoch: Long, agg: DataFrame)

  /** Fold everything in `appendLog` with `epochCol` > the state's horizon
    * into the maintained `groupBy(keyCol).agg(count, sum(valCol))`.
    *
    * The merged frame is lazily checkpointed so repeated advances don't
    * re-chain lineage over every historical delta (the same discipline as
    * the BFS hop loop); `appendLog` must be append-only in `epochCol` —
    * the delta predicate is a pushed-down range scan, so with the log
    * written epoch-partitioned the advance never touches old files. */
  def advance(state: Option[MaintainedAgg], appendLog: DataFrame,
      keyCol: String, valCol: String, epochCol: String): MaintainedAgg = {
    val horizon = state.map(_.upToEpoch).getOrElse(Long.MinValue)
    val delta = appendLog.where(col(epochCol) > horizon)
    val deltaAgg = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(28,4)")).as("total"))
    val newHorizon = delta.agg(max(col(epochCol))).head().get(0) match {
      case null       => horizon // empty delta: nothing advanced
      case e: Long    => e
      case e: Int     => e.toLong
      case other      => throw new IllegalArgumentException(
        s"epoch column must be integral, got $other")
    }
    val merged = state match {
      case None => deltaAgg
      case Some(prev) =>
        prev.agg.unionByName(deltaAgg)
          .groupBy(col(keyCol))
          .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
    }
    MaintainedAgg(newHorizon, merged.localCheckpoint(false))
  }

  /** The full-recompute reference the incremental path must equal. */
  def recompute(appendLog: DataFrame, keyCol: String, valCol: String): DataFrame =
    appendLog.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(28,4)")).as("total"))
}
