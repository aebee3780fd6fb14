package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank + running sum over a total order WITHOUT funneling the
  * data through a single-partition window.
  *
  * The scalable replacement for `Window.orderBy(...)` (which Spark
  * executes as one task holding the whole input): range-partition on the
  * sort key so partition i's keys all precede partition i+1's, window
  * locally in parallel, then lift local ranks/sums to global ones with
  * per-partition prefix offsets. The offsets come from a window over the
  * per-partition STATS — numPartitions rows, a post-aggregation bound —
  * so the only single-partition window in the plan sees ~32 rows whatever
  * the input size. The input is materialized once (eager localCheckpoint —
  * lazy checkpoints deadlock under broadcast threads, see Dedup's note)
  * because it feeds both the ranked pass and the offsets aggregation.
  *
  * Used by the vocabulary-coverage cutoff (q59) and sequence packing
  * (q77); the same shape serves any "global cumulative X" need.
  */
object GlobalWindow {

  /** Adds `rankName` (1-based global row_number), `cumName` (inclusive
    * global running sum of `value`), and `totalName` (grand total of
    * `value`) to `df`, ordered by `sortCols`. `value` must be integral
    * (sums are exact). */
  def rankedRunningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      rankName: String,
      cumName: String,
      totalName: String): DataFrame = {
    val base = df
      .withColumn("__v", value)
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val byPid = Window.orderBy(col("__pid"))
    val before = byPid.rowsBetween(Window.unboundedPreceding, -1)
    val whole = byPid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = base.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__rows"), sum(col("__v")).as("__s"))
      .select(col("__pid"),
        coalesce(sum(col("__rows")).over(before), lit(0L)).as("__rank_off"),
        coalesce(sum(col("__s")).over(before), lit(0L)).as("__cum_off"),
        sum(col("__s")).over(whole).as(totalName))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    base
      .withColumn("__lr", row_number().over(w).cast("long"))
      .withColumn("__lc", sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankName, col("__lr") + col("__rank_off"))
      .withColumn(cumName, col("__lc") + col("__cum_off"))
      .drop("__pid", "__v", "__lr", "__lc", "__rank_off", "__cum_off")
  }
}
