package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Access shim for Spark's internal vectorized parquet DSv2 table.
  *
  * The `graft` connector (graft.sources.GraftDataSource) resolves a snapshot
  * pointer to one immutable directory and then wants everything Spark's own
  * parquet source provides over it — schema inference, vectorized columnar
  * reads, filter pushdown, column pruning, aggregate pushdown — rather than
  * a hand-rolled row reader that would lose all of that. `ParquetTable` is
  * `private[sql]`-adjacent internal API, so the constructor call lives in
  * this `org.apache.spark.sql` subpackage like the rest of graftbridge.
  */
object ParquetTableShim {
  /** A DSv2 parquet table over exactly `dir`, inferring schema from footers.
    * `options` flow into the file index + parquet reader (e.g. parquet
    * tuning options a caller passed through `spark.read.option`). */
  def table(name: String, spark: SparkSession, dir: String,
      options: java.util.Map[String, String]): Table =
    ParquetTable(
      name,
      spark,
      new CaseInsensitiveStringMap(options),
      Seq(dir),
      userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat])

  /** Same, over an explicit directory LIST with a known schema — the shape
    * both the change-feed planner (each micro-batch scans exactly the
    * `_changes` directories of its version range, possibly zero of them)
    * and the snapshot face (a chain-link version IS a directory list: base
    * chain + delta) need: the table schema fixed up front so nothing is
    * inferred from footers of a transient or multi-schema file set. */
  def tableWithSchema(name: String, spark: SparkSession, dirs: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      options: java.util.Map[String, String] =
        java.util.Collections.emptyMap[String, String]()): Table =
    ParquetTable(
      name,
      spark,
      new CaseInsensitiveStringMap(options),
      dirs,
      userSpecifiedSchema = Some(schema),
      fallbackFileFormat = classOf[ParquetFileFormat])

  /** Same, but scanning through a caller-supplied file index instead of a
    * fresh listing — the hook that lets the `graft` connector serve its
    * file set from the snapshot store's `_stats.json` manifests (with
    * zone-map pruning in `listFiles`) while everything else — schema
    * handling, pushdown, vectorized reading — stays Spark's own
    * [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable]].
    * `dirs` still names the logical roots for display/`inputFiles`. */
  def tableWithIndex(name: String, spark: SparkSession, dirs: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      options: java.util.Map[String, String],
      index: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex,
      dv: Map[String, Array[Long]] = Map.empty,
      bucket: Option[BucketLayout] = None,
      ndv: () => Map[String, Long] = () => Map.empty,
      bucketSorted: Boolean = false,
      hist: () => Map[String, Array[Double]] = () => Map.empty)
      : Table = {
    require(dv.isEmpty ||
      index.isInstanceOf[GraftFileIndex],
      "deletion vectors require the manifest-backed file index")
    new ParquetTable(
      name,
      spark,
      new CaseInsensitiveStringMap(options),
      dirs,
      userSpecifiedSchema = Some(schema),
      fallbackFileFormat = classOf[ParquetFileFormat]) {
      override lazy val fileIndex
          : org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =
        index
      // Manifest-backed statistics (SupportsReportStatistics with real
      // numbers): the stock FileScan estimate is fileIndex.sizeInBytes —
      // unpruned, row-count-less. When the index is manifest-backed, the
      // scan reports the rows/bytes the zone maps say will SURVIVE the
      // pushed filters, so Catalyst sizes joins from what the scan will
      // actually produce (auto-broadcast of small snapshots AND of
      // selective reads over big ones — no hints).
      override def newScanBuilder(opts: CaseInsensitiveStringMap)
          : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =
        index match {
          case g: GraftFileIndex =>
            new ManifestStatsScanBuilder(spark, g, this.schema, dataSchema,
              opts, dv, bucket, ndv, bucketSorted, hist)
          case _ => super.newScanBuilder(opts)
        }
    }
  }

  /** Deep all-nullable view of a schema (Spark's `private[spark]`
    * `StructType.asNullable`). The store pins this as the snapshot schema:
    * a chain's older files legitimately LACK columns a later append added —
    * they must read as null — and parquet round-trips don't preserve
    * non-nullability anyway, so pinning a non-nullable writer schema would
    * declare a constraint the scan cannot honor. */
  def asNullable(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    schema.asNullable

  /** The batch (partitions, reader factory) of a DSv2 table's unfiltered
    * scan — the delegation step that lets the change feed reuse Spark's
    * vectorized parquet reading end to end. */
  def unfilteredBatch(t: Table): org.apache.spark.sql.connector.read.Batch =
    t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch

  /** [[unfilteredBatch]] with the output PRUNED to `required` (standard
    * column pushdown, so the reader emits exactly `required`'s columns in
    * its order) — what lets a pinned feed subscriber read a WIDER
    * snapshot (a lossless-widen rewrite) under its own subscription
    * schema, positional binding intact. */
  def projectedBatch(t: Table,
      required: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.read.Batch = {
    val sb = t.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
        p.pruneColumns(required)
      case _ => ()
    }
    sb.build().toBatch
  }
}

/** [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]]
  * whose built scan reports manifest-derived statistics. Pushdown (filters,
  * columns, aggregates, limits) is entirely the parent's; only `build()` is
  * intercepted, AFTER pushdown has settled, to wrap the finished scan. */
private[graftbridge] final class ManifestStatsScanBuilder(
    spark: org.apache.spark.sql.SparkSession,
    index: GraftFileIndex,
    schema: org.apache.spark.sql.types.StructType,
    dataSchema: org.apache.spark.sql.types.StructType,
    options: CaseInsensitiveStringMap,
    dv: Map[String, Array[Long]] = Map.empty,
    bucket: Option[BucketLayout] = None,
    ndv: () => Map[String, Long] = () => Map.empty,
    bucketSorted: Boolean = false,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
    spark, index, schema, dataSchema, options) {

  // A DV'd snapshot must not push aggregates into footer statistics: the
  // footer counts include vector-deleted rows. (Clean snapshots keep
  // aggregate pushdown untouched.)
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    if (dv.nonEmpty) false else super.pushAggregation(aggregation)

  override def build()
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan = {
    val built = super.build()
    if (dv.nonEmpty) {
      // Deletion vectors present: wrap the finished scan so its readers
      // drop vectored rows (DvParquetScan). Statistics subtract only the
      // vectors of files SURVIVING pruning — a pruned file's deleted rows
      // were never counted, so subtracting the chain total would
      // undercount selective scans and mislead join sizing.
      val surviving = index.prunedKeys(built.dataFilters)
      val dvRows = dv.iterator
        .collect { case (k, v) if surviving.contains(k) => v.length.toLong }
        .sum
      val stats = index.prunedStats(built.dataFilters)
        .map { case (r, b, t) => (math.max(0L, r - dvRows), b, t) }
      bucket match {
        // A bucket-consistent chain KEEPS its KeyGroupedPartitioning
        // claim under vectors: a DV only REMOVES rows from a file, it
        // can never move a row across buckets, so bucket b's partition
        // still holds exactly bucket-b rows after filtering — the
        // zero-exchange join stays sound while the readers pay the
        // row-based DV trade (the r14 gap: any vector used to drop the
        // claim until compact).
        case Some(layout) => new DvKeyGroupedParquetScan(built, dv, layout, stats, ndv, hist)
        case None => new DvParquetScan(built, dv, stats, ndv, hist)
      }
    }
    // A pushed aggregate rewrites the scan output (rows become per-group);
    // manifest row counts would be wrong — keep the stock estimate, and
    // make no partitioning claim (the bucket column may not even survive
    // into the aggregated output).
    else if (built.pushedAggregate.nonEmpty) built
    else (bucket, index.prunedStats(built.dataFilters)) match {
      case (Some(layout), stats) =>
        new KeyGroupedParquetScan(built, layout, stats, ndv, bucketSorted, hist)
      case (None, Some((rows, bytes, total))) =>
        new ManifestStatsParquetScan(built, rows, bytes, total, ndv, hist)
      case (None, None) => built
    }
  }
}

/** Manifest-derived [[org.apache.spark.sql.connector.read.Statistics]]
  * with PER-COLUMN statistics for Spark's cost-based optimizer — the
  * piece that lets CBO (`spark.sql.cbo.enabled`) estimate equi-join
  * cardinalities over store tables (|A⋈B| ≈ |A|·|B| / max(ndv)) and
  * REORDER multi-table joins, instead of running on size heuristics
  * alone. Reference analog: Postgres ANALYZE feeding n_distinct and
  * bounds to its planner, which every reference query leans on.
  *
  * Sources, all already on disk: NDV from the chain-unioned `_ndv.json`
  * HLL sketches ([[graft.core.NdvStats]]); min/max/nullCount folded
  * across the `_stats.json` manifests ([[GraftFileIndex.chainColStats]]).
  * Bounds convert to the CATALYST-INTERNAL values estimation expects per
  * column type (Int days for dates, Long micros for timestamps);
  * string/bool bounds are withheld (estimation doesn't range over them).
  * numRows/sizeInBytes keep the pruned-manifest semantics the scans
  * always had. */
private[graftbridge] object GraftStatistics {
  import java.util.{Optional, OptionalLong}
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
  import org.apache.spark.sql.connector.read.{Statistics => V2Statistics}
  import org.apache.spark.sql.types._
  import graft.core.FileStats.{DoubleVal, LongVal, StatVal}

  /** Equi-height histogram from stored quantile boundaries: height =
    * non-null rows / bins; per-bin NDV is DERIVED (exact per-bin distinct
    * counts would need a second pass) — a singleton bin (lo == hi, a hot
    * value occupying whole equi-height bins) has NDV 1, which is the case
    * that matters for skewed-equality selectivity; spread bins share the
    * chain NDV evenly. Estimates feeding an estimator — documented
    * approximation, never answers. */
  private def equiHeightHistogram(bounds: Array[Double], ndv: Option[Long],
      rows: Option[Long], nulls: Option[Long])
      : Option[org.apache.spark.sql.connector.read.colstats.Histogram] = {
    import org.apache.spark.sql.connector.read.colstats.{Histogram, HistogramBin}
    if (bounds.length < 2 || rows.isEmpty) return None
    val nBins = bounds.length - 1
    val nonNull = math.max(0L, rows.get - nulls.getOrElse(0L))
    if (nonNull == 0L) return None
    val binHeight = nonNull.toDouble / nBins
    val spreadNdv = ndv.map(n => math.max(1L, n / nBins)).getOrElse(1L)
    val binArr: Array[HistogramBin] = (0 until nBins).map { i =>
      val binLo = bounds(i); val binHi = bounds(i + 1)
      new HistogramBin {
        override def lo(): Double = binLo
        override def hi(): Double = binHi
        override def ndv(): Long = if (binLo == binHi) 1L else spreadNdv
      }
    }.toArray
    Some(new Histogram {
      override def height(): Double = binHeight
      override def bins(): Array[HistogramBin] = binArr
    })
  }

  /** Manifest StatVal → the catalyst-internal boxed value of `dt`. */
  private def internal(v: StatVal, dt: DataType): Option[Object] = (v, dt) match {
    case (LongVal(x), ByteType) => Some(java.lang.Byte.valueOf(x.toByte))
    case (LongVal(x), ShortType) => Some(java.lang.Short.valueOf(x.toShort))
    case (LongVal(x), IntegerType) => Some(java.lang.Integer.valueOf(x.toInt))
    case (LongVal(x), LongType) => Some(java.lang.Long.valueOf(x))
    case (LongVal(x), DateType) => Some(java.lang.Integer.valueOf(x.toInt))
    case (LongVal(x), TimestampType) => Some(java.lang.Long.valueOf(x))
    case (LongVal(x), TimestampNTZType) => Some(java.lang.Long.valueOf(x))
    case (DoubleVal(x), DoubleType) => Some(java.lang.Double.valueOf(x))
    case (DoubleVal(x), FloatType) => Some(java.lang.Float.valueOf(x.toFloat))
    case _ => None
  }

  def apply(stock: V2Statistics, manifest: Option[(Long, Long, Long)],
      index: GraftFileIndex, fields: Array[StructField],
      ndvThunk: () => Map[String, Long],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
      histThunk: () => Map[String, Array[Double]] = () => Map.empty)
      : V2Statistics = {
    // LAZY: estimateStatistics is called on every store-backed plan for
    // numRows/sizeInBytes (broadcast sizing) even with CBO off (the
    // default), when columnStats() is never read — the O(files × cols)
    // fold must not run then.
    lazy val colStats: java.util.Map[NamedReference, ColumnStatistics] = {
      val m = new java.util.HashMap[NamedReference, ColumnStatistics]()
      // Scope the fold to the files SURVIVING the pushed data filters so
      // min/max/nullCount describe the same rows as the pruned numRows.
      val keep =
        if (dataFilters.isEmpty) None else Some(index.prunedKeys(dataFilters))
      val merged = index.chainColStats(
        fields.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSeq, keep)
      // NDV sketches are chain-level (per-link, not per-file) and cannot
      // be file-scoped: cap at the pruned row count instead (NDV can
      // never exceed the rows it describes). The sidecar read + HLL
      // union runs HERE, inside the lazy map — never on the default
      // cbo=off planning path.
      val ndv = ndvThunk()
      val rowCap = manifest.map(_._1)
      // histograms describe the WHOLE chain while numRows is file-pruned:
      // FilterEstimation derives a selectivity FRACTION from the bins and
      // applies it to the pruned row count, so the bins being chain-global
      // skews the fraction only to the degree pruning reshaped the
      // distribution — an approximation feeding an estimator, strictly
      // better than the 1/ndv uniform guess it replaces (and the main
      // consumer, a skewed-equality predicate, is exactly the filter zone
      // maps CANNOT prune on).
      val hists = histThunk()
      fields.foreach { f =>
        val cl = f.name.toLowerCase(java.util.Locale.ROOT)
        val (mn, mx, nulls0) = merged.getOrElse(cl, (None, None, None))
        // cap at numRows: NDV sketches are chain-level and nullCounts are
        // pre-deletion-vector, so either can exceed a DV-reduced row
        // count — and nullCount > rowCount hands FilterEstimation a
        // negative selectivity
        val d = ndv.get(cl).map(n => rowCap.fold(n)(math.min(n, _)))
        val nulls = nulls0.map(n => rowCap.fold(n)(math.min(n, _)))
        val minV = mn.flatMap(internal(_, f.dataType))
        val maxV = mx.flatMap(internal(_, f.dataType))
        val histo = hists.get(cl).flatMap(b =>
          equiHeightHistogram(b, d, rowCap, nulls))
        if (d.isDefined || minV.isDefined || maxV.isDefined ||
            nulls.isDefined || histo.isDefined)
          m.put(org.apache.spark.sql.connector.expressions.Expressions
            .column(f.name),
            new ColumnStatistics {
              override def distinctCount(): OptionalLong =
                d.map(OptionalLong.of).getOrElse(OptionalLong.empty())
              override def min(): Optional[Object] =
                minV.map(Optional.of[Object]).getOrElse(Optional.empty[Object]())
              override def max(): Optional[Object] =
                maxV.map(Optional.of[Object]).getOrElse(Optional.empty[Object]())
              override def nullCount(): OptionalLong =
                nulls.map(OptionalLong.of).getOrElse(OptionalLong.empty())
              override def histogram()
                  : Optional[org.apache.spark.sql.connector.read.colstats.Histogram] =
                histo.map(Optional.of[
                  org.apache.spark.sql.connector.read.colstats.Histogram])
                  .getOrElse(Optional.empty())
            })
      }
      m
    }
    new V2Statistics {
      override def numRows(): OptionalLong = manifest match {
        case Some((rows, _, _)) => OptionalLong.of(rows)
        case None => stock.numRows()
      }
      override def sizeInBytes(): OptionalLong = manifest match {
        case Some((_, prunedBytes, totalBytes)) =>
          val frac =
            if (totalBytes <= 0L) 1.0
            else prunedBytes.toDouble / totalBytes.toDouble
          if (stock.sizeInBytes.isPresent)
            OptionalLong.of(
              math.max(1L, (stock.sizeInBytes.getAsLong * frac).toLong))
          else stock.sizeInBytes
        case None => stock.sizeInBytes
      }
      override def columnStats()
          : java.util.Map[NamedReference, ColumnStatistics] = colStats
    }
  }
}

/** DSv2 RUNTIME filtering ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]])
  * over the manifest zone maps — the hook that lets Spark's dynamic
  * partition pruning prune snapshot-store FILES from a dim-side join
  * predicate AT RUNTIME, with nothing for the user to call (the explicit
  * twin, `operators.RuntimeFilter.bloomPrunedJoin`, stays for non-store
  * sources). Reference analog: the accelerator's pruned load
  * (api/app/lib/graph_facade.py:1041-1069) prunes its graph at load time
  * behind a filter the query supplies; here the filter ARRIVES from the
  * optimizer — Catalyst's PartitionPruning rule sees a selective
  * broadcast-able dim side joined on a declared filter attribute, plants
  * a DynamicPruningSubquery, and BatchScanExec feeds the materialized
  * build-side keys into [[filter]] before re-planning partitions.
  *
  * What 100 TB buys: a star join whose dim filter passes 2% of keys
  * scans ~2% of a Z-ordered fact chain's FILES — the static zone-map
  * pruner can't see the dim predicate, and without this hook the scan
  * reads the full fact chain and lets the join discard 98% of it.
  *
  * Mechanics:
  *   - [[filterAttributes]] declares every top-level column: zone maps
  *     exist for all stats-bearing columns, and an undeclared column
  *     would stop PartitionPruning from even considering the join key.
  *   - [[filter]] receives conjunctive V2 predicates — DPP sends
  *     `IN(col, v…)` (`DataSourceV2Strategy.translateRuntimeFilterV2`) —
  *     and intersects two prune sets: surviving manifest KEYS (per-file
  *     zone-map check, O(log V) per file via the sorted-values bound
  *     search) and, on a bucket-consistent chain, surviving BUCKET IDS
  *     (`pmod(murmur3(v, 42), n)` over the arriving keys — prunes even
  *     columns with useless min/max, because the bucket id is exact).
  *   - `partitions` overrides drop non-surviving files. KEYED scans keep
  *     all `n` partitions (a pruned bucket plans empty), so the
  *     KeyGroupedPartitioning claim — and the zero-exchange join riding
  *     on it — survives runtime filtering, which BatchScanExec verifies
  *     (filtered partition values must stay within the original set).
  *
  * Dropping a file is sound for exactly the reason DPP is: the dynamic
  * filter is implied by the join the query will apply afterward, so rows
  * of a pruned file could never survive it. Every conservative keep of
  * the static pruner is preserved: unlisted-dir files (no stats) and
  * cross-domain comparisons always survive; an unknown column name means
  * the predicate is not provable here and nothing is pruned. */
trait GraftRuntimeFiltering
  extends org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate
  import org.apache.spark.sql.execution.datasources.PartitionedFile

  /** The manifest-backed index whose zone maps answer the runtime check. */
  protected def rfIndex: GraftFileIndex
  /** Top-level data-schema fields (declared filter attributes). */
  protected def rfFields: Array[org.apache.spark.sql.types.StructField]
  /** Bucket layout claim, when the chain carries one. */
  protected def rfBucketSpec: Option[BucketLayout] = None

  // Surviving manifest keys / per-key-column surviving COMPONENT ids
  // (composite layouts prune per column independently — an IN on k1
  // constrains component 1 whatever k2's ids are); null = no runtime
  // filter yet. Written once by BatchScanExec before partition
  // re-planning (volatile + intersect keeps a hypothetical second filter
  // call sound).
  @volatile private var rfKept: Set[String] = null
  @volatile private var rfComp: Array[Set[Int]] = null
  private val rfIgnoredCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private lazy val rfAll: Set[String] = rfIndex.allManifestKeys

  override def filterAttributes(): Array[NamedReference] =
    rfFields.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  /** A predicate's conjuncts: AND flattens (a band filter arrives as
    * `lo <= col AND col <= hi`), everything else is one conjunct. */
  private def conjunctsOf(p: Predicate): Seq[Predicate] = p.name() match {
    case "AND" =>
      p.children().toSeq.collect { case q: Predicate => conjunctsOf(q) }.flatten
    case _ => Seq(p)
  }

  /** `col <op> lit` / `lit <op> col` (op flipped) for the four range
    * comparators, as (column, bound-value, isLower, inclusive). */
  private def parseRange(p: Predicate)
      : Option[(String, LiteralValue[_], Boolean, Boolean)] = {
    val kids = p.children()
    def shaped: Option[(String, LiteralValue[_], Boolean)] =
      if (kids.length != 2) None
      else (kids(0), kids(1)) match {
        case (r: NamedReference, l: LiteralValue[_])
            if r.fieldNames().length == 1 => Some((r.fieldNames()(0), l, false))
        case (l: LiteralValue[_], r: NamedReference)
            if r.fieldNames().length == 1 => Some((r.fieldNames()(0), l, true))
        case _ => None
      }
    p.name() match {
      // flipped = literal on the left, so `lit > col` is an UPPER bound
      case ">" => shaped.map { case (c, l, flip) => (c, l, !flip, false) }
      case ">=" => shaped.map { case (c, l, flip) => (c, l, !flip, true) }
      case "<" => shaped.map { case (c, l, flip) => (c, l, flip, false) }
      case "<=" => shaped.map { case (c, l, flip) => (c, l, flip, true) }
      case _ => None
    }
  }

  /** `IN(col, lits…)` / `=`-as-single-IN over a TOP-LEVEL column;
    * anything else is not provable against the manifest and is ignored
    * (runtime filters are best-effort row-superset reductions). */
  private def parseIn(p: Predicate): Option[(String, Seq[LiteralValue[_]])] = {
    val kids = p.children()
    p.name() match {
      case "IN" if kids.nonEmpty =>
        kids.head match {
          case r: NamedReference if r.fieldNames().length == 1 &&
              kids.tail.forall(_.isInstanceOf[LiteralValue[_]]) =>
            Some((r.fieldNames()(0),
              kids.tail.toSeq.map(_.asInstanceOf[LiteralValue[_]])))
          case _ => None
        }
      case "=" if kids.length == 2 =>
        (kids(0), kids(1)) match {
          case (r: NamedReference, l: LiteralValue[_])
              if r.fieldNames().length == 1 => Some((r.fieldNames()(0), Seq(l)))
          case (l: LiteralValue[_], r: NamedReference)
              if r.fieldNames().length == 1 => Some((r.fieldNames()(0), Seq(l)))
          case _ => None
        }
      case _ => None
    }
  }

  /** `p` as a DISJUNCTION of range-conjunct bands (the band-join rule's
    * per-window predicate: `OR(AND(lo₁≤k<hi₁), AND(lo₂≤k<hi₂), …)`).
    * AND-side laxity is sound the usual way (dropping a conjunct only
    * WIDENS a branch), but OR-side laxity is NOT — dropping a branch
    * would prune files the dropped window needs — so any unrecognizable
    * DISJUNCT poisons the whole parse to None (ignored, no pruning). */
  private def parseOrBands(p: Predicate)
      : Option[Seq[Seq[(String, LiteralValue[_], Boolean, Boolean)]]] = {
    def disjuncts(q: Predicate): Option[Seq[Predicate]] = q.name() match {
      case "OR" =>
        val kids = q.children().toSeq.map {
          case c: Predicate => disjuncts(c)
          case _ => None
        }
        if (kids.exists(_.isEmpty)) None else Some(kids.flatMap(_.get))
      case _ => Some(Seq(q))
    }
    if (p.name() != "OR") None
    else disjuncts(p).map(_.map(b => conjunctsOf(b).flatMap(parseRange(_))))
  }

  /** Files a single band (conjunction of range bounds) may still match —
    * the zone-map intersect over its provable conjuncts; an unprovable
    * conjunct (unknown column, null bound, cross-domain literal) widens
    * the band, never narrows it. */
  private def bandKeys(
      conjs: Seq[(String, LiteralValue[_], Boolean, Boolean)]): Set[String] =
    conjs.foldLeft(rfAll) { case (acc, (colName, lit, isLower, inclusive)) =>
      val field = rfFields.find(_.name.equalsIgnoreCase(colName))
      if (field.isEmpty || lit.value == null) acc
      else graft.sources.DataSkipping.statValOf(lit.value, lit.dataType) match {
        case Some(bound) =>
          val colLower = colName.toLowerCase(java.util.Locale.ROOT)
          val keys =
            if (isLower) rfIndex.runtimeRangeKeys(colLower,
              Some((bound, inclusive)), None)
            else rfIndex.runtimeRangeKeys(colLower, None,
              Some((bound, inclusive)))
          acc.intersect(keys)
        case None => acc
      }
    }

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.flatMap(conjunctsOf).foreach { p =>
      val range = parseRange(p)
      val in = parseIn(p)
      val orBands =
        if (range.isEmpty && in.isEmpty) parseOrBands(p) else None
      // Any OTHER predicate shape is recognized-and-ignored, BY DESIGN,
      // and counted for observability. The named case is a BLOOM-FILTER
      // membership predicate (Spark's InjectRuntimeFilter can synthesize
      // one for large joins): a bloom answers "might this VALUE be in the
      // set", which proves nothing about a file's [min, max] interval —
      // testing every point of the interval is unbounded for non-integral
      // domains and gratuitous for the rest, so no zone-map pruning
      // decision can ever be derived from it. Ignoring is sound because
      // SupportsRuntimeV2Filtering filters are best-effort row-superset
      // reductions: the join re-applies the real predicate to every
      // surviving row.
      if (range.isEmpty && in.isEmpty && orBands.isEmpty && p.name() != "AND")
        rfIgnoredCount.incrementAndGet()
      // DISJUNCTIONS of bands (per-window band-join pruning): a file
      // survives if ANY window may reach it — union of per-band
      // intersects. Scattered narrow windows then prune to their union
      // instead of the single hull interval the conjunct path would keep.
      orBands.foreach { branches =>
        if (branches.nonEmpty) {
          val kept = branches.map(bandKeys).reduce(_ union _)
          // an entirely unprovable disjunction keeps every file — skip
          // the write so the report stays None (same convention as a
          // null bound on the conjunct path)
          if (kept.size != rfAll.size) synchronized {
            rfKept = if (rfKept == null) kept else rfKept.intersect(kept)
          }
        }
      }
      // RANGE conjuncts (band-join dynamic filters): each bound prunes
      // independently against the zone maps — `lo <= col` drops files
      // whose max provably misses it, `col <= hi` files whose min does.
      range.foreach { case (colName, lit, isLower, inclusive) =>
        val field = rfFields.find(_.name.equalsIgnoreCase(colName))
        // a NULL bound never compares true: the predicate matches no row,
        // but proving that here is gratuitous — skip (best-effort)
        if (field.isDefined && lit.value != null) {
          val colLower = colName.toLowerCase(java.util.Locale.ROOT)
          graft.sources.DataSkipping.statValOf(lit.value, lit.dataType)
            .foreach { bound =>
              val keys =
                if (isLower)
                  rfIndex.runtimeRangeKeys(colLower,
                    Some((bound, inclusive)), None)
                else
                  rfIndex.runtimeRangeKeys(colLower, None,
                    Some((bound, inclusive)))
              synchronized {
                rfKept = if (rfKept == null) keys else rfKept.intersect(keys)
              }
            }
        }
      }
      in.foreach { case (colName, lits) =>
        // unknown column: nothing provable (and an absent-column lookup
        // would wrongly read as all-null and prune everything)
        val field = rfFields.find(_.name.equalsIgnoreCase(colName))
        if (field.isDefined) {
          val colLower = colName.toLowerCase(java.util.Locale.ROOT)
          // NULL literals never satisfy IN — drop them; a NON-null value
          // outside the stats domain makes the list unprovable: skip.
          val nonNull = lits.filter(_.value != null)
          val vals = nonNull.flatMap(lv =>
            graft.sources.DataSkipping.statValOf(lv.value, lv.dataType))
          if (vals.length == nonNull.length) {
            val sorted = vals.toArray
            java.util.Arrays.sort(sorted,
              (a: graft.core.FileStats.StatVal, b: graft.core.FileStats.StatVal) =>
                graft.core.FileStats.compare(a, b))
            val keys = rfIndex.runtimeInKeys(colLower, sorted)
            synchronized {
              rfKept = if (rfKept == null) keys else rfKept.intersect(keys)
            }
          }
          rfBucketSpec.foreach { layout =>
            // bucket-id pruning is EXACT (not a bound check) but demands
            // the literal type equal the column type — murmur3 of an int
            // and of the same value as a long differ. Composite layouts
            // prune the matched column's COMPONENT id — each key column
            // hashes independently, so one column's IN constrains its
            // own mixed-radix digit.
            layout.posOf(colLower).foreach { pos =>
              if (nonNull.forall(_.dataType == field.get.dataType)) {
                val ids = nonNull.map(lv => GraftBucketFunction.bucketId(
                  lv.value, lv.dataType, layout.dims(pos))).toSet
                synchronized {
                  if (rfComp == null)
                    rfComp = Array.fill[Set[Int]](layout.cols.length)(null)
                  rfComp(pos) =
                    if (rfComp(pos) == null) ids else rfComp(pos).intersect(ids)
                }
              }
            }
          }
        }
      }
    }

  /** Does `f` survive the runtime filter? (True before any arrived.) */
  protected def runtimeKeeps(f: PartitionedFile): Boolean = {
    val kept = rfKept; val comp = rfComp
    if (kept == null && comp == null) true
    else {
      val p = f.toPath
      val name = p.getName
      val bucketOk = comp == null || rfBucketSpec.forall { layout =>
        val parts = layout.decode(
          KeyGroupedParquetScan.bucketOf(name, layout.total))
        comp.indices.forall(i =>
          comp(i) == null || comp(i).contains(parts(i)))
      }
      if (!bucketOk) false
      else if (kept == null) true
      else {
        val key = s"${p.getParent.getName}/$name"
        !rfAll.contains(key) || kept.contains(key)
      }
    }
  }

  /** (total manifest files, surviving) once a zone-map runtime filter
    * arrived; None before — the spec/audit observability hook. */
  def runtimeFilterReport: Option[(Int, Int)] =
    Option(rfKept).map(k => (rfAll.size, k.size))

  /** Runtime predicates RECOGNIZED-AND-IGNORED (bloom membership and any
    * other shape no zone-map decision derives from) — pins that ignoring
    * is a counted decision, not a silent drop. */
  def runtimeIgnoredPredicateCount: Int = rfIgnoredCount.get()

  /** Bucket (partition) ids surviving runtime bucket pruning — on
    * composite layouts, the indices whose every constrained component
    * id survives; None = no bucket filter arrived. */
  def runtimeBucketReport: Option[Set[Int]] =
    (Option(rfComp), rfBucketSpec) match {
      case (Some(comp), Some(layout)) =>
        Some((0 until layout.total).filter { idx =>
          val parts = layout.decode(idx)
          comp.indices.forall(i =>
            comp(i) == null || comp(i).contains(parts(i)))
        }.toSet)
      case _ => None
    }
}

/** One bucket's files as a planned partition CARRYING ITS KEY — what lets
  * `DataSourceV2ScanExecBase` group a keyed scan's partitions and
  * EnsureRequirements match them across the two sides of a storage-
  * partitioned join. Extends [[FilePartition]] so the stock parquet
  * reader factory serves it unchanged. */
private[graftbridge] final class KeyedFilePartition(
    idx: Int,
    fs: Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
    key: org.apache.spark.sql.catalyst.InternalRow)
  extends org.apache.spark.sql.execution.datasources.FilePartition(idx, fs)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
}

/** The finished parquet scan of a BUCKET-CONSISTENT snapshot chain
  * (`SnapshotStore.commitBucketed` / `appendBucketed`): reports
  * `KeyGroupedPartitioning(bucket(n, col), n)` and plans exactly one
  * partition per bucket id, each carrying its key — the DSv2 contract for
  * storage-partitioned joins. Two graft tables bucketed with the same
  * (column-hash, count) then join with NO exchange on either side; a
  * single bucketed table's `groupBy(col)` aggregates without a shuffle.
  *
  * File→bucket attribution is the writer's task partition index, which
  * Spark burns into the file name (`part-NNNNN-…`): `repartition(n, col)`
  * routes every row to partition `pmod(murmur3(col, 42), n)`, and the
  * explicit count keeps AQE from coalescing buckets. Pruned files simply
  * drop out of their bucket's partition; empty buckets still plan (an
  * empty FilePartition reads nothing), so the reported partition count is
  * always exactly `n` on both sides. Eligibility (every chain link
  * bucketed identically, no deletion vectors, every file manifest-backed
  * and part-named) is established by the CALLER — GraftTable.forSnapshot
  * — before the claim is made here. */
private[graftbridge] final class KeyGroupedParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    layout: BucketLayout,
    manifestStats: Option[(Long, Long, Long)],
    ndv: () => Map[String, Long] = () => Map.empty,
    bucketSorted: Boolean = false,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions)
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering
  with GraftRuntimeFiltering {

  import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

  override protected def rfIndex: GraftFileIndex =
    base.fileIndex.asInstanceOf[GraftFileIndex]
  override protected def rfFields: Array[org.apache.spark.sql.types.StructField] =
    base.readDataSchema.fields // scan OUTPUT columns: runtime refs resolve against the pruned relation
  override protected def rfBucketSpec: Option[BucketLayout] = Some(layout)

  // ONE single-reference bucket(n_i, col_i) transform PER key column
  // (multi-reference transforms never satisfy ClusteredDistribution);
  // the partition key is the per-column component-id tuple, the
  // partition count the dims product.
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      layout.cols.lazyZip(layout.dims).map { (c, n) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
          : org.apache.spark.sql.connector.expressions.Transform
      }.toArray,
      layout.total)

  /** PER-PARTITION ordering claim (SupportsReportOrdering): every chain
    * link wrote its buckets `sortWithinPartitions(bucketCols…)` ASC
    * NULLS FIRST (Spark's ascending default), so each FILE is one sorted
    * run — single-file buckets read sorted as-is, and multi-file buckets
    * (append chains, the common 100 TB state) are restored to a sorted
    * stream by the reader factory's k-way MERGE over the per-file runs
    * at O(rows)·O(log k) cost ([[MergeSortedKeyedReaderFactory]]), so an
    * SMJ over two such tables skips BOTH sorts on top of both exchanges
    * whatever the append count — sorted once at write, merged at read,
    * never re-sorted per query. The caller (forSnapshot) only sets
    * `bucketSorted` when every chain link wrote sorted AND no deletion
    * vectors (the DV'd keyed reader chains file GROUPS without merging).
    * Runtime filtering only drops whole files — whole RUNS — and never
    * reorders, so the claim survives it. The claim is withheld when any
    * bucket column was pruned from the output (an ordering over a
    * non-output column cannot resolve), and the merge engages under
    * exactly the same condition the claim is reported under. */
  private def orderingClaimed: Boolean =
    bucketSorted && layout.cols.forall(c =>
      base.readDataSchema.fields.exists(_.name.equalsIgnoreCase(c)))

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (orderingClaimed)
      layout.cols.map(c =>
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
        .toArray
    else Array.empty

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    val inner = super.createReaderFactory()
    // Merge only when some bucket actually holds MULTIPLE files — a
    // compacted (single-file-per-bucket) chain keeps the fully columnar
    // passthrough. The answer must be uniform across partitions
    // (BatchScanExec refuses mixed row/columnar), so ONE multi-file
    // bucket flips the whole scan to row-based merging; runtime
    // filtering only removes files, so the pre-filter decision is
    // conservative and stays consistent with re-planned partitions.
    val anyMultiRun = partitions.exists(p =>
      p.files.iterator.map(_.filePath.toString).toSet.size > 1)
    if (!orderingClaimed || !anyMultiRun) inner
    else {
      val keyCols = layout.cols.map { c =>
        val i = readDataSchema.fields.indexWhere(_.name.equalsIgnoreCase(c))
        (i, readDataSchema.fields(i).dataType)
      }
      new MergeSortedKeyedReaderFactory(inner, keyCols)
    }
  }

  // Runtime-pruned files drop out of their bucket; every bucket still
  // PLANS (possibly empty), so the partition count and key set — the
  // KeyGroupedPartitioning claim — are invariant under runtime filtering.
  // Each bucket's splits are re-sorted by (path, start offset): a file
  // larger than maxPartitionBytes arrives as MULTIPLE PartitionedFiles,
  // and FileScan.partitions packs them length-descending — encounter
  // order is NOT offset order. The readers consume a partition's array
  // sequentially, so under the bucketSorted ordering claim an unsorted
  // split sequence would hand the sort-skipping SMJ out-of-order rows —
  // silent wrong joins. The explicit sort makes offset order a guarantee
  // instead of an accident of Spark's current packing.
  override def partitions: Seq[FilePartition] = {
    val byBucket = Array.fill(layout.total)(
      scala.collection.mutable.ArrayBuffer.empty[PartitionedFile])
    super.partitions.foreach(_.files.foreach { f =>
      if (runtimeKeeps(f))
        byBucket(KeyGroupedParquetScan.bucketOf(
          f.toPath.getName, layout.total)) += f
    })
    (0 until layout.total).map { b =>
      new KeyedFilePartition(b,
        KeyGroupedParquetScan.offsetOrdered(byBucket(b).toArray),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          layout.decode(b).map(x => x: Any)))
    }
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftStatistics(super.estimateStatistics(), manifestStats, rfIndex,
      rfFields, ndv, base.dataFilters, hist)
}

object KeyGroupedParquetScan {
  private val PartIndex = "^part-(\\d+)-".r.unanchored

  /** The writer task partition index burned into a part-file name — the
    * file's bucket id. Eligibility checks guarantee a match before any
    * partitioning claim; a non-matching name here is a broken invariant,
    * failed loudly rather than mis-bucketed silently. */
  def bucketOf(fileName: String, numBuckets: Int): Int = fileName match {
    case PartIndex(i) =>
      val b = i.toInt
      require(b < numBuckets,
        s"file $fileName claims bucket $b of $numBuckets — bucket layout " +
          "corrupted (was the table compacted by a pre-bucketing writer?)")
      b
    case _ => throw new IllegalStateException(
      s"bucketed scan over non-part-named file $fileName")
  }

  /** A file name the bucket attribution can parse — forSnapshot's
    * eligibility probe. */
  def isPartNamed(fileName: String): Boolean =
    PartIndex.findPrefixMatchOf(fileName).isDefined

  /** A bucket's splits in (path, start offset) order — the order the
    * per-partition ordering claim is made over. One file's splits
    * concatenate back to the file's own (sorted) row order; across files
    * the path tiebreak is deterministic (and the claim only rides
    * multi-file buckets through the merge reader, which re-orders rows
    * itself). */
  def offsetOrdered(
      fs: Array[org.apache.spark.sql.execution.datasources.PartitionedFile])
      : Array[org.apache.spark.sql.execution.datasources.PartitionedFile] =
    fs.sortBy(f => (f.filePath.toString, f.start))
}

/** Restores per-partition ORDER over multi-file buckets: each file of a
  * sorted bucketed chain is one sorted RUN (its splits concatenate in
  * offset order), so the partition's sorted stream is the k-way MERGE of
  * its per-file runs — O(rows · log k), no per-query sort, no spill.
  * This is what keeps the sortless SMJ through APPEND chains: before it,
  * any second file in a bucket dropped the ordering claim until compact.
  *
  * Single-run partitions (one file, however many splits) pass through
  * untouched — including COLUMNAR reads, so a compacted chain keeps full
  * vectorization; the scan only degrades to row-based merging exactly
  * where a merge is needed. Rows returned by the winning run stay valid
  * until that run's next advance (each inner reader reuses only its own
  * row buffer), which is the PartitionReader contract downstream relies
  * on. */
private[graftbridge] final class MergeSortedKeyedReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    keyCols: Seq[(Int, org.apache.spark.sql.types.DataType)])
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.execution.datasources.FilePartition

  /** The partition's sorted runs: its files grouped by path, each group's
    * splits already in offset order (KeyGroupedParquetScan.partitions). */
  private def runsOf(p: org.apache.spark.sql.connector.read.InputPartition)
      : Seq[FilePartition] = {
    val files = p.asInstanceOf[FilePartition].files
    // groupBy would scramble; files are (path, start)-sorted, so runs are
    // contiguous — split on path change, order preserved
    val runs = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.datasources.PartitionedFile]]
    files.foreach { f =>
      if (runs.isEmpty ||
          runs.last.head.filePath.toString != f.filePath.toString)
        runs += scala.collection.mutable.ArrayBuffer(f)
      else runs.last += f
    }
    runs.toSeq.zipWithIndex.map { case (fs, i) => FilePartition(i, fs.toArray) }
  }

  // Uniform row-based answer: the wrapping scan only installs this
  // factory when some bucket needs a merge, and BatchScanExec refuses
  // mixed row/columnar partition sets.
  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val runs = runsOf(p)
    if (runs.length <= 1) inner.createReader(p)
    else {
      // ASC NULLS FIRST on the key tuple — exactly the ordering the scan
      // reports and the writer's sortWithinPartitions produced
      val ordering = new org.apache.spark.sql.catalyst.expressions
        .InterpretedOrdering(keyCols.map { case (i, dt) =>
          org.apache.spark.sql.catalyst.expressions.SortOrder(
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, dt, nullable = true),
            org.apache.spark.sql.catalyst.expressions.Ascending)
        })
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        // ONE FRESH FACTORY PER RUN: ParquetPartitionReaderFactory holds a
        // per-instance mutable ParquetReaderCallback whose advanceFile
        // CLOSES the previously-opened file reader whenever any reader
        // from the same instance opens a new file — correct for the
        // sequential reads a stock partition does, fatal for k readers
        // held open concurrently (the closed reader's column vectors
        // read back zeros: silently corrupt rows, not an error). A
        // serialization round-trip yields an independent clone — own
        // callback, shared broadcast conf — per run.
        private val readers = runs.map { r =>
          org.apache.spark.util.Utils.deserialize[
            org.apache.spark.sql.connector.read.PartitionReaderFactory](
            org.apache.spark.util.Utils.serialize(inner),
            Thread.currentThread().getContextClassLoader).createReader(r)
        }.toArray
        // each run's CURRENT row, copied on advance: inner readers hand
        // out views over reused buffers with per-reader validity windows
        // the heap's deferred comparisons can't honor — a copy per
        // merged row buys an airtight contract
        private val rows = new Array[InternalRow](readers.length)
        private val heap = new java.util.PriorityQueue[Integer](
          readers.length,
          (a: Integer, b: Integer) =>
            ordering.compare(rows(a.intValue), rows(b.intValue)))
        private def advance(i: Int): Boolean =
          if (readers(i).next()) { rows(i) = readers(i).get().copy(); true }
          else false
        private var primed = false
        private var current = -1
        private def prime(): Unit = {
          var i = 0
          while (i < readers.length) {
            if (advance(i)) heap.add(Integer.valueOf(i))
            i += 1
          }
          primed = true
        }
        override def next(): Boolean = {
          if (!primed) prime()
          else if (current >= 0) {
            // advance the run whose run was just consumed, re-seat it
            if (advance(current)) heap.add(Integer.valueOf(current))
            current = -1
          }
          val head = heap.poll()
          if (head == null) false
          else { current = head.intValue; true }
        }
        override def get(): InternalRow = rows(current)
        override def close(): Unit = readers.foreach(_.close())
      }
    }
  }
}

/** The built scan with [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
  * answered from the snapshot manifest: exact surviving-file row counts,
  * and the stock (compression- and projection-scaled) size estimate scaled
  * by the surviving-bytes fraction. Construction copies the finished
  * scan's own fields, so pushdown state, partition planning, reader
  * factories, and exchange-reuse equality all stay the parent's. */
private[graftbridge] final class ManifestStatsParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    rows: Long, prunedBytes: Long, totalBytes: Long,
    ndv: () => Map[String, Long] = () => Map.empty,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions)
  with GraftRuntimeFiltering {

  import org.apache.spark.sql.execution.datasources.FilePartition

  override protected def rfIndex: GraftFileIndex =
    base.fileIndex.asInstanceOf[GraftFileIndex]
  override protected def rfFields: Array[org.apache.spark.sql.types.StructField] =
    base.readDataSchema.fields // scan OUTPUT columns: runtime refs resolve against the pruned relation

  // Re-planned by BatchScanExec after a runtime filter lands: surviving
  // files keep the parent's packing; emptied partitions drop, the rest
  // reindex densely (unkeyed scans make no partition-count claim).
  override def partitions: Seq[FilePartition] =
    if (runtimeFilterReport.isEmpty) super.partitions
    else super.partitions
      .map(p => p.files.filter(runtimeKeeps))
      .filter(_.nonEmpty)
      .zipWithIndex.map { case (fs, i) => FilePartition(i, fs) }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftStatistics(super.estimateStatistics(),
      Some((rows, prunedBytes, totalBytes)), rfIndex, rfFields, ndv,
      base.dataFilters, hist)
}

/** The finished parquet scan of a snapshot that carries DELETION VECTORS
  * (`SnapshotStore`'s `_dv.json` sidecars): sparse deletes recorded as
  * (file, row index) sets instead of file rewrites. The declared scan
  * surface — `readSchema`, pushdown state, file index, exchange-reuse
  * equality inputs — is the parent's, untouched; three things change:
  *
  *   1. READERS drop vectored rows. A twin inner scan re-reads with the
  *      parquet reader's row-index temporary column appended (the same
  *      mechanism that powers `_metadata.row_index`; the generated index
  *      is the row's position IN ITS FILE, correct under both row-group
  *      skipping and file splits), and [[DvPartitionReaderFactory]]
  *      binary-searches each row's index against its file's vector,
  *      projecting the temp column away.
  *   2. PARTITION PLANNING isolates each vectored file's splits into
  *      their own partitions, so a reader knows THE file its rows came
  *      from without per-row path bookkeeping; clean files keep the
  *      parent's packing.
  *   3. The scan reads ROW-BASED (no columnar batches): filtering a
  *      `ColumnarBatch` row-wise means rebuilding vectors. A DV'd
  *      snapshot trades vectorization for O(matched rows) delete cost
  *      until `compact` folds the vectors away and the scan returns to
  *      the fully vectorized path — the same trade Delta makes before
  *      DV-aware readers.
  *
  * Aggregate pushdown is refused upstream (footer counts include deleted
  * rows — ManifestStatsScanBuilder.pushAggregation); filter/column
  * pushdown survive (a pushed filter can only REMOVE rows the vector
  * would also have to check). */
private[graftbridge] final class DvParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    dv: Map[String, Array[Long]],
    manifestStats: Option[(Long, Long, Long)],
    ndv: () => Map[String, Long] = () => Map.empty,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions)
  with GraftRuntimeFiltering {

  import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

  override protected def rfIndex: GraftFileIndex =
    base.fileIndex.asInstanceOf[GraftFileIndex]
  override protected def rfFields: Array[org.apache.spark.sql.types.StructField] =
    base.readDataSchema.fields // scan OUTPUT columns: runtime refs resolve against the pruned relation

  /** The twin scan whose readers append the per-file row index as a
    * trailing long column. Its declared schema never reaches a plan —
    * only its reader factory is used. */
  private def extendedScan
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =
    new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
      base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
      org.apache.spark.sql.types.StructType(base.readDataSchema.fields :+
        org.apache.spark.sql.types.StructField(
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
            .ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true)),
      base.readPartitionSchema, base.pushedFilters, base.options,
      pushedAggregate = None, base.partitionFilters, base.dataFilters,
      base.pushedVariantExtractions)

  override def partitions: Seq[FilePartition] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[PartitionedFile]]()
    super.partitions.foreach { p =>
      // runtime-pruned files drop whole (their vectors with them — a
      // pruned file's rows could never survive the downstream join)
      val (vectored, clean) = p.files.filter(runtimeKeeps)
        .partition(f => dv.contains(DvParquetScan.keyOf(f)))
      if (clean.nonEmpty) out += clean
      vectored.foreach(f => out += Array(f)) // own partition: unambiguous file
    }
    out.toSeq.zipWithIndex.map { case (fs, i) => FilePartition(i, fs) }
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new DvPartitionReaderFactory(extendedScan.createReaderFactory(), dv,
      readDataSchema.length, readSchema())

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftStatistics(super.estimateStatistics(), manifestStats, rfIndex,
      rfFields, ndv, base.dataFilters)
}

private[graftbridge] object DvParquetScan {
  /** Store-relative key of a planned file: version directory name + bare
    * file name — the exact key `SnapshotStore`'s sidecars use. */
  def keyOf(pf: org.apache.spark.sql.execution.datasources.PartitionedFile): String = {
    val p = pf.toPath
    s"${p.getParent.getName}/${p.getName}"
  }
}

/** The DV-AND-BUCKETED scan: [[KeyGroupedParquetScan]]'s partitioning
  * claim with [[DvParquetScan]]'s row filtering. Sound because a deletion
  * vector is a per-file ROW SUBTRACTION — it cannot move a row across
  * buckets — so each keyed partition still holds exactly its bucket's
  * rows after filtering, and `KeyGroupedPartitioning(bucket(n, col), n)`
  * remains exactly the layout on disk. What this buys at 100 TB: a
  * mutation-heavy bucketed fact table keeps its ZERO-EXCHANGE
  * storage-partitioned joins between sparse deletes instead of paying a
  * full fact⋈fact shuffle until the next `compact` (the reference keeps
  * serving accelerated reads across invalidations the same way,
  * api/app/lib/graph_facade.py:50-58).
  *
  * Unlike [[DvParquetScan]] — which isolates each vectored file into its
  * own partition so the reader knows its vector — a keyed partition MUST
  * hold all of its bucket's files (the partition count and keys are the
  * claim), so the reader factory here chains one inner reader per FILE
  * GROUP inside the partition: clean splits ride one reader untouched,
  * each vectored file's splits get their own reader with that file's
  * vector bound. Row-based like every DV read (the columnar trade folds
  * away with the vectors at `compact`). */
private[graftbridge] final class DvKeyGroupedParquetScan(
    base: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan,
    dv: Map[String, Array[Long]],
    layout: BucketLayout,
    manifestStats: Option[(Long, Long, Long)],
    ndv: () => Map[String, Long] = () => Map.empty,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions)
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with GraftRuntimeFiltering {

  import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

  override protected def rfIndex: GraftFileIndex =
    base.fileIndex.asInstanceOf[GraftFileIndex]
  override protected def rfFields: Array[org.apache.spark.sql.types.StructField] =
    base.readDataSchema.fields // scan OUTPUT columns: runtime refs resolve against the pruned relation
  override protected def rfBucketSpec: Option[BucketLayout] = Some(layout)

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      layout.cols.lazyZip(layout.dims).map { (c, n) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
          : org.apache.spark.sql.connector.expressions.Transform
      }.toArray,
      layout.total)

  // As in KeyGroupedParquetScan: runtime-pruned files drop out of their
  // bucket, every bucket still plans, the layout claim is invariant.
  // Splits re-sorted to (path, offset) order for deterministic reader
  // grouping (no ordering claim here, but encounter order shouldn't
  // depend on FileScan's packing either).
  override def partitions: Seq[FilePartition] = {
    val byBucket = Array.fill(layout.total)(
      scala.collection.mutable.ArrayBuffer.empty[PartitionedFile])
    super.partitions.foreach(_.files.foreach { f =>
      if (runtimeKeeps(f))
        byBucket(KeyGroupedParquetScan.bucketOf(
          f.toPath.getName, layout.total)) += f
    })
    (0 until layout.total).map { b =>
      new KeyedFilePartition(b,
        KeyGroupedParquetScan.offsetOrdered(byBucket(b).toArray),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          layout.decode(b).map(x => x: Any)))
    }
  }

  /** The row-index-extended twin, as in [[DvParquetScan.extendedScan]]. */
  private def extendedScan
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =
    new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
      base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
      org.apache.spark.sql.types.StructType(base.readDataSchema.fields :+
        org.apache.spark.sql.types.StructField(
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
            .ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true)),
      base.readPartitionSchema, base.pushedFilters, base.options,
      pushedAggregate = None, base.partitionFilters, base.dataFilters,
      base.pushedVariantExtractions)

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new DvKeyedPartitionReaderFactory(extendedScan.createReaderFactory(), dv,
      readDataSchema.length, readSchema())

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftStatistics(super.estimateStatistics(), manifestStats, rfIndex,
      rfFields, ndv, base.dataFilters)
}

/** Reader factory of the DV'd KEYED scan: a partition's splits are
  * regrouped by (clean | vectored-file), each group served by its own
  * inner row-index-extended reader chained in sequence, vectored rows
  * binary-searched away against exactly their file's vector. The output
  * projection (temp index column dropped) matches
  * [[DvPartitionReaderFactory]]'s. */
private[graftbridge] final class DvKeyedPartitionReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    dv: Map[String, Array[Long]],
    readDataLen: Int,
    outSchema: org.apache.spark.sql.types.StructType)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    val files = p.asInstanceOf[FilePartition].files
    // (splits, vector-or-null) groups: clean splits together (one inner
    // reader, no per-row filtering), each vectored FILE's splits as their
    // own group bound to that file's vector.
    val (vectored, clean) =
      files.partition(f => dv.contains(DvParquetScan.keyOf(f)))
    val groups: Seq[(Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
        Array[Long])] =
      (if (clean.nonEmpty) Seq((clean, null: Array[Long])) else Nil) ++
        vectored.groupBy(DvParquetScan.keyOf).toSeq.sortBy(_._1)
          .map { case (k, fs) => (fs, dv(k)) }
    val ordinals = (0 until readDataLen) ++
      ((readDataLen + 1) until (outSchema.length + 1))
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
      outSchema, ordinals.toIndexedSeq)
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private var gi = -1
      private var cur: org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = null
      private var deleted: Array[Long] = null
      private def openNext(): Boolean = {
        if (cur != null) { cur.close(); cur = null }
        gi += 1
        if (gi >= groups.length) false
        else {
          val (fs, d) = groups(gi)
          cur = inner.createReader(FilePartition(gi, fs))
          deleted = d
          true
        }
      }
      override def next(): Boolean = {
        while (true) {
          if (cur == null && !openNext()) return false
          var ok = cur.next()
          while (ok && deleted != null &&
              java.util.Arrays.binarySearch(deleted,
                cur.get().getLong(readDataLen)) >= 0)
            ok = cur.next()
          if (ok) return true
          cur.close(); cur = null
        }
        false // unreachable
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = {
        proj.project(cur.get()); proj
      }
      override def close(): Unit = if (cur != null) { cur.close(); cur = null }
    }
  }
}

/** Row-filtering reader factory over the row-index-extended inner readers:
  * a partition holding a vectored file (always alone in its partition —
  * DvParquetScan.partitions) drops rows whose index binary-searches into
  * the file's vector; every partition projects the trailing temp index
  * column away so consumers see exactly the declared read schema. */
private[graftbridge] final class DvPartitionReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    dv: Map[String, Array[Long]],
    readDataLen: Int,
    outSchema: org.apache.spark.sql.types.StructType)
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean = false

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val files = p.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition].files
    val deleted: Array[Long] =
      if (files.length == 1) dv.getOrElse(DvParquetScan.keyOf(files.head), null)
      else null // multi-file partitions are clean by construction
    val innerReader = inner.createReader(p)
    // rows arrive as readData ++ [rowIndex] ++ partitionCols: project the
    // index (ordinal readDataLen) away, keep everything else in order
    val ordinals = (0 until readDataLen) ++
      ((readDataLen + 1) until (outSchema.length + 1))
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
      outSchema, ordinals.toIndexedSeq)
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      override def next(): Boolean = {
        var ok = innerReader.next()
        while (ok && deleted != null &&
            java.util.Arrays.binarySearch(deleted,
              innerReader.get().getLong(readDataLen)) >= 0)
          ok = innerReader.next()
        ok
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = {
        proj.project(innerReader.get()); proj
      }
      override def close(): Unit = innerReader.close()
    }
  }
}
