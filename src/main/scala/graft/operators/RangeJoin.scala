package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval join — the shuffle-friendly form of the keyless
  * range-predicate join `points ⋈ intervals ON pt BETWEEN lo AND hi`.
  *
  * Spark executes a pure theta join as BroadcastNestedLoopJoin (O(n·m)
  * compares, and only if one side fits in memory) — the classic 100 TB
  * trap. This operator makes the predicate an EQUI-join: pick a bucket
  * width, explode each interval to the buckets it overlaps (⌈len/width⌉
  * rows — bounded when interval length is), map each point to its one
  * bucket, hash-join on the bucket id, and keep the exact range predicate
  * as a post-filter. Output is identical to the theta join; the join is a
  * plain shuffled hash join that partitions on time like any other key.
  *
  * Pick `bucketWidth` ≈ the typical interval length: shorter explodes the
  * interval side, longer widens each bucket's candidate set. Both sides
  * stay exact regardless — width is purely a performance knob.
  * (The streaming twin is `StreamOps.intervalJoin`, where the same bound
  * keeps watermark state finite.)
  */
object RangeJoin {

  /** Inner-join `points` to every `intervals` row whose `[lo, hi]` (both
    * inclusive) contains the point. `ptCol`/`loCol`/`hiCol` must be
    * long-valued on the same scale (e.g. epoch micros). Column names must
    * be disjoint between the two frames. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Floor division in INTEGER arithmetic: (v - pmod(v, w)) is an exact
    // multiple of w, and the division runs in DECIMAL so values beyond
    // 2^53 (e.g. epoch nanos) never round through a double — a
    // double-rounded bucket id could disagree between the point and the
    // interval side and silently drop a matching row.
    def bucketOf(c: Column): Column = {
      val v = c.cast("long")
      ((v - pmod(v, lit(bucketWidth))).cast("decimal(28,0)") /
        lit(bucketWidth)).cast("long")
    }
    val bucketed = intervals.where(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    points.withColumn("__bucket", bucketOf(col(ptCol)))
      .join(bucketed, "__bucket")
      .where(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
