package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.graftbridge.ParquetTableShim
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.SnapshotStore

/** DataSource V2 connector over the versioned snapshot store — the
  * `spark.read.format("graft")` face of `core.SnapshotStore` (reference M8
  * snapshot reads, api/app/lib/age_client.py pinned-snapshot queries;
  * schema/00_baseline.sql:2198-2240 epoch log):
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("root", "/data/kg")      // store root ("path" also accepted)
  *     .option("table", "concepts")
  *     .option("version", "7")          // optional time travel (VERSION AS OF)
  *     .load()
  * }}}
  *
  * Layering, not reimplementation: load-time work is ONLY pointer
  * resolution — `SnapshotStore.resolveVersionDir` pins one immutable
  * `v=n` directory — after which the scan IS Spark's own vectorized parquet
  * table over that directory, so filter pushdown, column pruning, aggregate
  * pushdown, and columnar reads all survive intact (PlanShapeSpec pins
  * `PushedFilters` + pruned `ReadSchema` through this connector). This is
  * the same shape Delta/Iceberg use: a thin log/pointer resolution in front
  * of the engine's native parquet scan. A provider instance resolves ONCE,
  * so one `load()` can never straddle two versions, and a commit racing a
  * running query never mutates scanned data (the store's directories are
  * immutable).
  *
  * Writes are refused by contract: a bare parquet write into a version
  * directory would bypass version allocation, the `_SUCCESS` committed-write
  * marker, and the forward-only pointer move — go through
  * `SnapshotStore.commit`/`append`.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // One resolution per provider instance (Spark constructs a fresh provider
  // per read): inferSchema and getTable must see the SAME pinned version
  // even if a commit lands between the two calls.
  private var cached: Option[GraftTable] = None

  private def resolvedTable(options: CaseInsensitiveStringMap): GraftTable =
    synchronized {
      cached.getOrElse {
        val root = Option(options.get("root")).orElse(Option(options.get("path")))
          .getOrElse(throw new IllegalArgumentException(
            "graft source requires option 'root' (or 'path'): the snapshot store root"))
        val table = Option(options.get("table")).getOrElse(
          throw new IllegalArgumentException(
            "graft source requires option 'table': the store table name"))
        val version = Option(options.get("version")).map(_.trim.toLong)
        val spark = SparkSession.active
        val (v, dir) =
          new SnapshotStore(spark, root).resolveVersionDir(table, version)
        val passThrough = new util.HashMap[String, String](options)
        passThrough.remove("root"); passThrough.remove("path")
        passThrough.remove("table"); passThrough.remove("version")
        val t = new GraftTable(table, v,
          ParquetTableShim.table(s"graft:$table@v$v", spark, dir.toString, passThrough))
        cached = Some(t)
        t
      }
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolvedTable(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolvedTable(new CaseInsensitiveStringMap(properties))
}

/** A pinned snapshot version as a read-only DSv2 table: scans delegate to
  * Spark's parquet table over the immutable version directory; writes raise
  * with the store's commit contract instead of silently corrupting a
  * version. */
final class GraftTable(tableName: String, version: Long, inner: Table)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft:$tableName@v$version"
  override def schema(): StructType = inner.schema()
  // BATCH_WRITE is declared ONLY so a write reaches newWriteBuilder and gets
  // the contract message below, instead of Spark's opaque capability error.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    inner.asInstanceOf[SupportsRead].newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    throw new UnsupportedOperationException(
      s"graft table '$tableName' is read-only through the connector: version " +
        "directories are immutable — write through SnapshotStore.commit/append")
}
