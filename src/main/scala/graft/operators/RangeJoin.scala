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

  /** Per-interval COUNT and MIN of contained points WITHOUT materializing
    * the pairs — the aggregate-pushdown twin of [[pointInInterval]].
    *
    * `pointInInterval(...).groupBy(interval).agg(count, min)` is optimal
    * only if the pairs are the product; when the product is a per-interval
    * AGGREGATE, the join output is pure waste — and it grows as
    * density(points) × density(intervals): the sf10 audit measured the
    * q81 shape at 5.65 G pairs from 2 M + 2 M events (100× the output for
    * 10× the input), 34 s spent streaming rows that immediately collapse
    * to 2 M aggregates. This operator never forms them:
    *
    *   1. points pre-aggregate per bucket into a SORTED `array<long>`
    *      (`sort_array(collect_list(pt))`) — one map-side-combined shuffle
    *      of the point side, O(points) total state;
    *   2. each interval explodes to its ⌈len/width⌉+1 covering buckets and
    *      equi-joins that bucket row — O(intervals) join rows, each
    *      carrying one bucket array by reference;
    *   3. per (interval, bucket) row, [[graft.functions.LowerBound]]
    *      binary-searches the array twice: contained count =
    *      `lower_bound(arr, hi+1) − lower_bound(arr, lo)`, and the min
    *      contained point is the element AT `lower_bound(arr, lo)` when it
    *      exists and ≤ hi — two O(log n) probes inside whole-stage
    *      codegen, the array never copied or exploded;
    *   4. one final groupBy over the interval's own columns sums the
    *      per-bucket counts and mins the per-bucket mins.
    *
    * Total cost: two shuffles of O(points + intervals) rows and
    * O(join rows · log bucket) compares — linear in the INPUTS however
    * dense the overlap. Same result as the pair-join form (differential
    * spec in AsOfJoinSpec), inner-join semantics: intervals containing no
    * point are dropped.
    *
    * Contract: interval ROWS must be distinct (the final groupBy keys on
    * all interval columns; exact duplicates would collapse). Point
    * multiplicity rides a COUNT column, not array length: step 1 first
    * deduplicates to (bucket, value, count) — `sort_array(collect_list)`
    * then holds SORTED DISTINCT values plus a [[graft.functions.PrefixSums]]
    * cumulative-count array, and the contained count becomes
    * `prefix[lower_bound(hi+1)] − prefix[lower_bound(lo)]`. The classic
    * degenerate bucket (a million points stamped the same boilerplate
    * timestamp) therefore collapses to ONE array entry before any array is
    * built. `bucketWidth` sizes the TYPICAL per-bucket DISTINCT-value
    * array; a bucket still over `maxBucketRows` distinct values is found
    * by a count pre-pass and hash-split into ⌈n/cap⌉ sub-arrays keyed on
    * `pmod(hash(value), splits)` — DETERMINISTIC in the row's value, so a
    * partial stage retry recomputes identical sub assignments (a
    * nondeterministic salt here is the SPARK-23207 shape: surviving map
    * outputs and retried ones disagree on row placement and rows silently
    * drop or double-count). Value-keyed splitting is safe precisely
    * BECAUSE of the dedup: within a bucket every row's value is distinct,
    * so identical-value pileups that would defeat a value hash no longer
    * exist. The two probes run per sub-array and the final groupBy
    * re-combines exactly (counts ADD across any partition of a bucket's
    * values, mins MIN) — bit-identical to the unsplit plan while no task
    * materializes more than ~2·cap longs in one row. The oversized-bucket
    * table is joined as a BROADCAST on both sides (empty in the
    * non-degenerate case, one row per hot bucket otherwise).
    *
    * Output: every `intervals` column, plus `<countName>` (long, ≥ 1) and
    * `<minName>` (long, the smallest contained point). */
  def intervalAggregate(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, bucketWidth: Long,
      countName: String = "n_points",
      minName: String = "min_pt",
      maxBucketRows: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketRows > 0, "maxBucketRows must be positive")
    val reserved = Seq("__bucket", "__sub", "__splits", "__pt", "__n",
      "__zs", "__pts", "__cum", "__c", "__m")
    val inputCols = (intervals.columns ++ Seq(ptCol, loCol, hiCol)).toSet
    val clash = reserved.filter(inputCols.contains) ++
      Seq(countName, minName).filter(intervals.columns.contains)
    require(clash.isEmpty,
      s"intervalAggregate: column name(s) ${clash.mkString(", ")} collide " +
        s"with reserved internal/output names (${reserved.mkString(", ")}, " +
        s"$countName, $minName) — rename the input columns")
    import graft.functions.{LowerBound, PrefixSums}
    def bucketOf(c: Column): Column = {
      val v = c.cast("long")
      ((v - pmod(v, lit(bucketWidth))).cast("decimal(28,0)") /
        lit(bucketWidth)).cast("long")
    }
    // Dedup FIRST: multiplicity becomes a count column (map-side combined,
    // so the shuffle carries distinct values, not raw rows), and every
    // later per-bucket structure is bounded by DISTINCT values.
    val ptsAgg = points
      .select(bucketOf(col(ptCol)).as("__bucket"),
        col(ptCol).cast("long").as("__pt"))
      .groupBy(col("__bucket"), col("__pt"))
      .agg(count(lit(1)).as("__n"))
    // Hot-bucket pre-pass (same shape as Dedup's maxBucketSize guard):
    // per-bucket DISTINCT-value counts, filtered to the over-cap buckets
    // only, so the broadcast is empty unless a bucket is degenerate.
    val oversized = ptsAgg.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__c"))
      .where(col("__c") > maxBucketRows)
      .select(col("__bucket"),
        ceil(col("__c").cast("double") / maxBucketRows).cast("int").as("__splits"))
    // Deterministic value-keyed sub assignment — retry-safe (see scaladoc):
    // post-dedup a bucket's values are distinct, so hash(value) spreads.
    val subOf =
      when(col("__splits").isNotNull,
        pmod(hash(col("__pt")), col("__splits"))).otherwise(lit(0))
    val ptsPerBucket = ptsAgg
      .join(broadcast(oversized), Seq("__bucket"), "left")
      .withColumn("__sub", subOf)
      .groupBy(col("__bucket"), col("__sub"))
      .agg(sort_array(collect_list(struct(col("__pt"), col("__n")))).as("__zs"))
      .select(col("__bucket"), col("__sub"),
        col("__zs").getField("__pt").as("__pts"),
        PrefixSums(col("__zs").getField("__n")).as("__cum"))
    // Each interval probes every sub-array of each covering bucket.
    val bucketed = intervals.where(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
      .join(broadcast(oversized), Seq("__bucket"), "left")
      .withColumn("__sub",
        explode(sequence(lit(0), coalesce(col("__splits"), lit(1)) - 1)))
      .drop("__splits")
    val lb = LowerBound(col("__pts"), col(loCol))
    val ub = LowerBound(col("__pts"), col(hiCol).cast("long") + lit(1L))
    // Contained count = prefix[ub] − prefix[lb] (element_at is 1-based and
    // __cum has size(__pts)+1 entries, so ub+1 ≤ size+1 is always valid).
    val perBucket = bucketed
      .join(ptsPerBucket, Seq("__bucket", "__sub"), "left")
      .withColumn("__c", coalesce(
        element_at(col("__cum"), ub + lit(1)) -
          element_at(col("__cum"), lb + lit(1)), lit(0L)))
      // element_at is 1-based; the candidate only counts when it exists
      // and is ≤ hi (lower_bound(lo) lands on the first element ≥ lo, so
      // ≥ lo is already guaranteed)
      .withColumn("__m",
        when(lb < size(col("__pts")),
          element_at(col("__pts"), lb + lit(1))).otherwise(lit(null)))
      .withColumn("__m", when(col("__m") <= col(hiCol), col("__m")))
    val intervalCols = intervals.columns.toSeq
    perBucket
      .groupBy(intervalCols.map(col): _*)
      .agg(sum(col("__c")).as(countName), min(col("__m")).as(minName))
      .where(col(countName) > 0)
  }
}
