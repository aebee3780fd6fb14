package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.SnapshotStore
import scala.jdk.CollectionConverters._

/** The snapshot store as a Spark SQL CATALOG — the `SELECT … FROM` face of
  * the same layering the `graft` DataSource exposes to DataFrame readers:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.kg", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.kg.root", "/data/kg")
  *   spark.sql("SELECT * FROM kg.concepts")                   -- latest snapshot
  *   spark.sql("SELECT * FROM kg.concepts VERSION AS OF 3")   -- time travel
  *   spark.sql("SHOW TABLES IN kg")
  * }}}
  *
  * Resolution per query is one pointer read pinning one immutable version
  * directory; the scan is Spark's vectorized parquet table with pushdown
  * and pruning intact (same `GraftTable` the connector returns, so plan
  * shapes are identical through both faces). Every mutation the catalog
  * accepts — CREATE/CTAS, INSERT [OVERWRITE], DELETE/UPDATE/MERGE, ALTER
  * ADD/DROP/RENAME COLUMN, DROP TABLE — lands as a NEW version through
  * the store's commit protocol; version directories themselves are never
  * mutated, which keeps `VERSION AS OF` trivially consistent: every
  * version a query can name is an immutable directory (reference M8
  * pinned-snapshot reads, schema/00_baseline.sql:2198-2240). Only
  * table RENAME and column retypes keep the refusal.
  */
final class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name' requires spark.sql.catalog.$name.root"))
    // Opt-in CBO arming (spark.sql.catalog.<name>.cbo = true): the scans
    // always REPORT column statistics (NDV sketches, zone-map bounds,
    // equi-height histograms); these session flags make Catalyst CONSUME
    // them for selectivity + join reordering. An explicit catalog option
    // — not a silent default — because it changes plans session-wide
    // (graft.GraftExtensions.enableCbo is the code-first face).
    if (Option(options.get("cbo")).exists(_.equalsIgnoreCase("true")))
      graft.GraftExtensions.enableCbo(
        org.apache.spark.sql.SparkSession.active)
  }

  override def name(): String = catalogName

  /** Advertise ANSI table-constraint DDL: `ALTER TABLE … ADD CONSTRAINT
    * <n> CHECK (…)` / `DROP CONSTRAINT` route through `alterTable`
    * below; the tables report the active set via `constraints()`, which
    * also arms Spark's own analyzer-side INSERT validation. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def spark = SparkSession.active
  private def store = new SnapshotStore(spark, root)

  /** Tables live directly under the root (`kg.<table>`): any namespace
    * qualifier is a user error surfaced as table-not-found. */
  private def resolved(ident: Identifier, version: Option[Long]): Table = {
    if (ident.namespace().nonEmpty) throw new NoSuchTableException(ident)
    val table = ident.name()
    // snapshotSchema shares resolveVersionPaths' not-a-table failure mode
    // (IllegalArgumentException on a missing/uncommitted version), so it
    // belongs inside the same mapping to NoSuchTableException.
    try GraftTable.forSnapshot(spark, store, table, version)
    catch { case _: IllegalArgumentException => throw new NoSuchTableException(ident) }
  }

  override def loadTable(ident: Identifier): Table = resolved(ident, None)

  /** `VERSION AS OF n` — the SQL face of `SnapshotStore.readAt`. */
  override def loadTable(ident: Identifier, version: String): Table =
    resolved(ident, Some(version.trim.toLong))

  /** `TIMESTAMP AS OF t` — DSv2 hands the evaluated timestamp in MICROS;
    * resolved to the newest version whose expose-time stamp is at or
    * before it (`SnapshotStore.versionAtTimestamp`). A timestamp before
    * the table's first commit propagates the store's loud refusal —
    * mapping it to table-not-found would misdiagnose a real table. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (ident.namespace().nonEmpty) throw new NoSuchTableException(ident)
    val table = ident.name()
    if (store.latestVersion(table).isEmpty) throw new NoSuchTableException(ident)
    resolved(ident,
      Some(store.versionAtTimestamp(table, Math.floorDiv(timestamp, 1000L))))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) return Array.empty
    val dir = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(dir)) return Array.empty
    // existence = the HEAD BACKEND reports a version, not the POSIX
    // pointer file (a conditional-put HeadStore never writes one) — the
    // directory listing only proposes candidates
    val st = store
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        st.latestVersion(p.getFileName.toString).isDefined)
      .map(p => Identifier.of(Array.empty, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  // ---- FunctionCatalog: the bucket transform --------------------------
  // A bucketed graft scan reports KeyGroupedPartitioning(bucket(n, col));
  // Catalyst's V2ScanPartitioningAndOrdering can only honor that claim by
  // resolving `bucket` against THIS catalog (DataSourceV2Relation
  // .funCatalog) — without it the claim silently degrades to unknown
  // partitioning and every join shuffles. The bound function replicates
  // the writer's hash exactly (graftbridge.GraftBucketFunction).
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().isEmpty && ident.name().equalsIgnoreCase("bucket"))
      org.apache.spark.sql.graftbridge.GraftBucketFunction
    else throw new NoSuchFunctionException(ident)

  private def readOnly(): Nothing = throw new UnsupportedOperationException(
    s"graft catalog '$catalogName' does not support this DDL: version " +
      "directories are immutable — express the change as a new commit " +
      "through SnapshotStore (table renames: copy via commit + dropTable; " +
      "retypes: rewrite via commit)")

  /** `CREATE TABLE <cat>.<t> (…)` — version 1 as an empty snapshot
    * carrying the schema (`SnapshotStore.createTable`). Partition/bucket
    * transforms refuse: the catalog cannot promise the transform on
    * subsequent plain INSERTs (a bucketed layout is a per-commit write
    * contract — `commitBucketed`/`appendBucketed`). With the V1 write path
    * on the table, `CREATE TABLE … AS SELECT` works end to end. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (ident.namespace().nonEmpty) throw new NoSuchTableException(ident)
    require(partitions.isEmpty,
      s"CREATE TABLE ${ident.name()}: partitioning/bucketing transforms " +
        "are not supported through the catalog — a bucketed layout is a " +
        "per-commit write contract; use SnapshotStore.commitBucketed")
    if (store.latestVersion(ident.name()).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident.name())
    store.createTable(ident.name(), schema)
    loadTable(ident)
  }
  /** One SQL-face constraint, routed to the store: CHECK enforced,
    * PK/UNIQUE/FK accepted as INFORMATIONAL metadata iff NOT ENFORCED
    * (enforcement needs an index the store does not maintain; the
    * metadata still surfaces through `constraints()`/DESCRIBE so
    * planners and consumers see the keys — the Delta idiom). */
  private def addConstraint(table: String,
      c: org.apache.spark.sql.connector.catalog.constraints.Constraint): Unit = {
    import org.apache.spark.sql.connector.catalog.constraints._
    def cols(refs: Array[org.apache.spark.sql.connector.expressions.NamedReference])
        : Seq[String] = refs.toSeq.map { r =>
      require(r.fieldNames().length == 1,
        s"constraint ${c.name()} on $table: nested field " +
          s"${r.fieldNames().mkString(".")} — only top-level columns")
      r.fieldNames().head
    }
    def informational(kind: String, columns: Seq[String],
        refTable: Option[String] = None, refCols: Seq[String] = Nil): Unit = {
      require(!c.enforced(),
        s"constraint ${c.name()} on $table: ENFORCED ${kind.toUpperCase} " +
          "needs an index the store does not maintain — declare it NOT " +
          "ENFORCED (informational metadata, surfaced via DESCRIBE and " +
          "Table.constraints)")
      store.addKeyConstraint(table, c.name(), kind, columns, refTable,
        refCols, rely = c.rely())
    }
    c match {
      case ch: Check =>
        store.addCheckConstraint(table, ch.name(), ch.predicateSql())
      case pk: PrimaryKey => informational("primary", cols(pk.columns()))
      case u: Unique      => informational("unique", cols(u.columns()))
      case fk: ForeignKey => informational("foreign", cols(fk.columns()),
        Some(fk.referencedTable().name()), cols(fk.referencedColumns()))
      case other => throw new UnsupportedOperationException(
        s"constraint ${other.name()} on $table: unsupported kind")
    }
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val cons = Option(info.constraints()).map(_.toSeq).getOrElse(Nil)
    val created =
      createTable(ident, info.schema(), info.partitions(), info.properties())
    if (cons.isEmpty) created
    else {
      // ALL-OR-NOTHING: a failing constraint (unresolvable predicate,
      // ENFORCED key kind) must not leave a half-created table with a
      // partial constraint set behind — roll the CREATE back and rethrow.
      try cons.foreach(addConstraint(ident.name(), _))
      catch {
        case e: Throwable =>
          // The cleanup itself may fail (concurrent access, IO) — never
          // let that REPLACE the constraint failure the caller must see;
          // attach it as suppressed and rethrow the original.
          try store.dropTable(ident.name())
          catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
          throw e
      }
      loadTable(ident)
    }
  }

  /** `ALTER TABLE kg.t ADD COLUMNS (…)` / `DROP COLUMN` — the DDL the
    * store expresses natively as data-less schema chain links
    * (`SnapshotStore.addColumns` / `dropColumns`; no file touched — adds
    * read null on old rows, drops stop being scanned, and the store's
    * resurrection guard refuses re-adding a dropped name until compact).
    * `RENAME COLUMN` routes to `SnapshotStore.renameColumns` — an OCC
    * REWRITE, deliberately not a schema link (parquet resolves by name;
    * see the store's contract note). Everything else keeps the read-only
    * refusal: version directories are immutable, and retypes would need
    * a rewrite the caller should do deliberately through `commit`. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (ident.namespace().nonEmpty) throw new NoSuchTableException(ident)
    // Zero changes reach here when the analyzer swallowed them all (e.g.
    // DROP COLUMN IF EXISTS on a missing column) — a no-op, not DDL.
    if (changes.isEmpty) return loadTable(ident)
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    if (drops.nonEmpty) {
      if (drops.size != changes.size) readOnly()
      drops.foreach { d =>
        require(d.fieldNames().length == 1,
          s"DROP COLUMN on ${ident.name()}: nested field " +
            s"${d.fieldNames().mkString(".")} — only top-level columns " +
            "can be dropped without a rewrite")
      }
      try {
        // IF EXISTS drops are filtered against the live schema here (the
        // store refuses unknown names — that refusal IS the bare form).
        val present = store.snapshotSchema(ident.name()).fieldNames
        val names = drops.filter(d => !d.ifExists() ||
            present.exists(_.equalsIgnoreCase(d.fieldNames().head)))
          .map(_.fieldNames().head)
        if (names.nonEmpty) store.dropColumns(ident.name(), names)
      } catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.startsWith("no committed version") =>
          throw new NoSuchTableException(ident)
      }
      return loadTable(ident)
    }
    val addCons = changes.collect { case c: TableChange.AddConstraint => c }
    if (addCons.nonEmpty) {
      if (addCons.size != changes.size) readOnly()
      addCons.foreach(c => addConstraint(ident.name(), c.constraint()))
      return loadTable(ident)
    }
    val dropCons = changes.collect { case d: TableChange.DropConstraint => d }
    if (dropCons.nonEmpty) {
      if (dropCons.size != changes.size) readOnly()
      // Route by which namespace holds the name; a name in neither set is
      // the CHECK path's loud refusal (or a silent pass with IF EXISTS).
      dropCons.foreach { d =>
        if (store.latestVersion(ident.name()).exists(v =>
          store.keyConstraintsOf(ident.name(), v).contains(d.name())))
          store.dropKeyConstraint(ident.name(), d.name(), d.ifExists())
        else store.dropCheckConstraint(ident.name(), d.name(), d.ifExists())
      }
      return loadTable(ident)
    }
    val sets = changes.collect { case p: TableChange.SetProperty => p }
    if (sets.nonEmpty) {
      if (sets.size != changes.size) readOnly()
      try store.setTableProperties(ident.name(),
        sets.map(p => p.property() -> p.value()).toMap)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.startsWith("no committed version") =>
          throw new NoSuchTableException(ident)
      }
      return loadTable(ident)
    }
    val unsets = changes.collect { case p: TableChange.RemoveProperty => p }
    if (unsets.nonEmpty) {
      if (unsets.size != changes.size) readOnly()
      // Spark's UNSET TBLPROPERTIES is lenient about missing keys (it
      // sends RemoveProperty without an existence pre-check), so the SQL
      // face maps to the store's ifExists form; the strict form stays
      // available on SnapshotStore directly.
      try store.unsetTableProperties(ident.name(),
        unsets.map(_.property()), ifExists = true)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.startsWith("no committed version") =>
          throw new NoSuchTableException(ident)
      }
      return loadTable(ident)
    }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      if (renames.size != changes.size) readOnly()
      renames.foreach { r =>
        require(r.fieldNames().length == 1,
          s"RENAME COLUMN on ${ident.name()}: nested field " +
            s"${r.fieldNames().mkString(".")} — only top-level columns " +
            "can be renamed")
      }
      try store.renameColumns(ident.name(),
        renames.map(r => r.fieldNames().head -> r.newName()).toMap)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.startsWith("no committed version") =>
          throw new NoSuchTableException(ident)
      }
      return loadTable(ident)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.size != changes.size) readOnly()
    adds.foreach { a =>
      require(a.fieldNames().length == 1,
        s"ADD COLUMNS on ${ident.name()}: nested field " +
          s"${a.fieldNames().mkString(".")} — only top-level columns " +
          "can be added without a rewrite")
      require(a.isNullable,
        s"ADD COLUMNS on ${ident.name()}: ${a.fieldNames().head} NOT NULL — " +
          "existing rows have no value for it; add nullable, backfill, " +
          "then constrain via rewrite")
      require(a.defaultValue() == null,
        s"ADD COLUMNS on ${ident.name()}: ${a.fieldNames().head} has a " +
          "DEFAULT — the store does not record column defaults; backfill " +
          "explicitly")
    }
    try store.addColumns(ident.name(), StructType(adds.map(a =>
      org.apache.spark.sql.types.StructField(
        a.fieldNames().head, a.dataType(), nullable = true))))
    catch {
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.startsWith("no committed version") =>
        throw new NoSuchTableException(ident)
    }
    loadTable(ident)
  }
  /** `DROP TABLE <cat>.<t>` — deletes every version under the table's
    * pointer lock and purges the JVM-wide schema/stats memos (version
    * numbers are reused by a re-created table). */
  override def dropTable(ident: Identifier): Boolean =
    ident.namespace().isEmpty && store.dropTable(ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly()
}
