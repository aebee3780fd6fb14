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
      index: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex)
      : Table =
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
            new ManifestStatsScanBuilder(spark, g, this.schema, dataSchema, opts)
          case _ => super.newScanBuilder(opts)
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
    options: CaseInsensitiveStringMap)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
    spark, index, schema, dataSchema, options) {

  override def build()
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan = {
    val built = super.build()
    // A pushed aggregate rewrites the scan output (rows become per-group);
    // manifest row counts would be wrong — keep the stock estimate.
    if (built.pushedAggregate.nonEmpty) built
    else index.prunedStats(built.dataFilters) match {
      case Some((rows, bytes, total)) =>
        new ManifestStatsParquetScan(built, rows, bytes, total)
      case None => built
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
    rows: Long, prunedBytes: Long, totalBytes: Long)
  extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
    base.sparkSession, base.hadoopConf, base.fileIndex, base.dataSchema,
    base.readDataSchema, base.readPartitionSchema, base.pushedFilters,
    base.options, base.pushedAggregate, base.partitionFilters,
    base.dataFilters, base.pushedVariantExtractions) {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val stock = super.estimateStatistics()
    new org.apache.spark.sql.connector.read.Statistics {
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def sizeInBytes(): java.util.OptionalLong = {
        val frac =
          if (totalBytes <= 0L) 1.0
          else prunedBytes.toDouble / totalBytes.toDouble
        if (stock.sizeInBytes.isPresent)
          java.util.OptionalLong.of(
            math.max(1L, (stock.sizeInBytes.getAsLong * frac).toLong))
        else stock.sizeInBytes
      }
    }
  }
}
