package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * resolution — `SnapshotStore.resolveVersionPaths` pins an immutable
  * directory set (the version's base chain) — after which the scan IS
  * Spark's own vectorized parquet
  * table over those directories, so filter pushdown, column pruning, aggregate
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
  private var cached: Option[Table] = None

  private def resolvedTable(options: CaseInsensitiveStringMap): Table =
    synchronized {
      cached.getOrElse {
        val root = Option(options.get("root")).orElse(Option(options.get("path")))
          .getOrElse(throw new IllegalArgumentException(
            "graft source requires option 'root' (or 'path'): the snapshot store root"))
        val table = Option(options.get("table")).getOrElse(
          throw new IllegalArgumentException(
            "graft source requires option 'table': the store table name"))
        val spark = SparkSession.active
        val store = new SnapshotStore(spark, root)
        val explicitVersion = Option(options.get("version")).map(_.trim.toLong)
        // TIMESTAMP AS OF through the DataFrame face: epoch millis or an
        // ISO-8601 instant, resolved NOW to a pinned version (so the read
        // carries the same immutability contract as an explicit version).
        val asOf = Option(options.get("timestampAsOf")).map { raw =>
          val s = raw.trim
          val ms =
            if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
            else java.time.Instant.parse(s).toEpochMilli
          require(explicitVersion.isEmpty,
            "options 'version' and 'timestampAsOf' are mutually exclusive")
          store.versionAtTimestamp(table, ms)
        }
        val version = explicitVersion.orElse(asOf)
        val t =
          if (Option(options.get("feed")).exists(_.equalsIgnoreCase("cdf"))) {
            // CHANGE-DATA feed: tagged insert/delete row images per version
            // (the streaming twin of SnapshotStore.changeFeedSince) — what
            // lets a long-running incremental consumer fold deletes and
            // updates signed, instead of resubscribing. Same pinned-schema
            // contract as feed=changes, plus the two tag columns.
            val (v, _) = store.resolveVersionPaths(table, None)
            val schema = store.snapshotSchema(table, Some(v))
            require(version.isEmpty,
              "feed=cdf streams forward — use 'startingVersion', not 'version'")
            val startingVersion =
              Option(options.get("startingVersion")).map(_.trim.toLong).getOrElse(0L)
            new GraftCdfTable(root, table, schema, startingVersion)
          } else if (Option(options.get("feed")).exists(_.equalsIgnoreCase("changes"))) {
            // Change feed: schema is PINNED to the current snapshot's at
            // stream start, and every change set is projected to it —
            // columns a later append ADDS are dropped from this stream
            // (resubscribe to pick them up), columns an older change set
            // lacks read as null, and a RETYPE cannot occur because
            // SnapshotStore.append refuses it. Same contract as Delta CDF
            // under additive evolution.
            val (v, _) = store.resolveVersionPaths(table, None)
            val schema = store.snapshotSchema(table, Some(v))
            require(version.isEmpty,
              "feed=changes streams forward — use 'startingVersion', not 'version'")
            val startingVersion =
              Option(options.get("startingVersion")).map(_.trim.toLong).getOrElse(0L)
            new GraftChangeFeedTable(root, table, schema, startingVersion)
          } else {
            // Strip every connector-only option so only genuine parquet
            // reader options reach the file scan (feed/startingVersion are
            // meaningless outside the changes branch but must not leak).
            val passThrough = new util.HashMap[String, String](options)
            passThrough.remove("root"); passThrough.remove("path")
            passThrough.remove("table"); passThrough.remove("version")
            passThrough.remove("feed"); passThrough.remove("startingVersion")
            passThrough.remove("timestampAsOf")
            GraftTable.forSnapshot(spark, store, table, version, passThrough)
          }
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

/** One element of a snapshot scan: a path Spark's parquet table will list,
  * either a whole version DIRECTORY (no manifest — legacy or crashed-stats
  * commit, reads unpruned) or one data FILE carrying its manifest entry,
  * the granularity the zone-map pruner works at. */
final case class ScanUnit(path: String, stat: Option[graft.core.FileStats.FileStat])

/** A pinned snapshot version as a read-only DSv2 table: scans delegate to
  * Spark's parquet table over the immutable version chain; writes raise
  * with the store's commit contract instead of silently corrupting a
  * version.
  *
  * Chain directories whose commits wrote a `_stats.json` manifest are
  * expanded to file-grained units and served through a
  * [[org.apache.spark.sql.graftbridge.GraftFileIndex]] — file listings
  * come from the manifest (no filesystem metadata calls) and pushed data
  * filters prune whole files against the zone maps in
  * `FileIndex.listFiles`, in front of parquet's own row-group skipping.
  * Manifest-less directories fall back to a real listing, unpruned. */
final class GraftTable(val tableName: String, val snapshotVersion: Long,
    spark: SparkSession, val units: Seq[ScanUnit], pinnedSchema: StructType,
    passThrough: util.Map[String, String],
    val storeRoot: Option[String] = None,
    val versionPinned: Boolean = false,
    dv: Map[String, Array[Long]] = Map.empty,
    bucket: Option[org.apache.spark.sql.graftbridge.BucketLayout] = None,
    physNames: Map[String, Map[String, String]] = Map.empty,
    ndv: () => Map[String, Long] = () => Map.empty,
    bucketSorted: Boolean = false,
    hist: () => Map[String, Array[Double]] = () => Map.empty)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  // The scan runs under the version's pinned snapshot schema, so older
  // chain files missing a later-added column read as null and no footer
  // merging happens at plan time.
  private lazy val inner: Table = {
    val known = units.collect { case ScanUnit(p, Some(st)) =>
      (new org.apache.hadoop.fs.FileStatus(st.bytes, false, 1,
        128L * 1024 * 1024, st.mtime, new org.apache.hadoop.fs.Path(p)), st)
    }
    val unlisted = units.collect { case ScanUnit(p, None) =>
      new org.apache.hadoop.fs.Path(p)
    }
    ParquetTableShim.tableWithIndex(name(), spark, units.map(_.path),
      pinnedSchema, passThrough,
      new org.apache.spark.sql.graftbridge.GraftFileIndex(spark, known,
        unlisted, physNames),
      dv, bucket, ndv, bucketSorted, hist)
  }

  override def name(): String = s"graft:$tableName@v$snapshotVersion"
  override def schema(): StructType = pinnedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Constraints of the pinned snapshot. ANSI CHECK (graft.check.* chain
    * props) report ENFORCED + VALID: the store validated existing rows at
    * ADD time and validates every delta at commit time, and reporting
    * them here arms Spark's analyzer-side INSERT validation as the
    * earliest (pre-job) refusal. Informational key constraints
    * (graft.keycons.* — PK/UNIQUE/FK) report NOT ENFORCED + UNVALIDATED
    * with their declared RELY bit: pure metadata for planners and
    * consumers, never checked by the store. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    cachedConstraints

  // Computed ONCE per (immutable) snapshot table instance: the optimizer
  // calls constraints() per Aggregate/Deduplicate node per fixed-point
  // iteration (RelyKeyOptimization's uniqueness walk), and re-reading
  // chain props from disk on every call would multiply metadata IO into
  // planning latency.
  private lazy val cachedConstraints
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    storeRoot match {
      case None => Array.empty
      case Some(root) =>
        import org.apache.spark.sql.connector.catalog.constraints.Constraint
        val store = new graft.core.SnapshotStore(spark, root)
        val checks = store.checkConstraintsOf(tableName, snapshotVersion)
          .toSeq.sortBy(_._1).map { case (n, sql) =>
            Constraint.check(n).predicateSql(sql).enforced(true)
              .validationStatus(Constraint.ValidationStatus.VALID)
              .build(): Constraint
          }
        val keys = store.keyConstraintsOf(tableName, snapshotVersion)
          .toSeq.sortBy(_._1).map { case (n, kc) =>
            def refs(cols: Seq[String])
                : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
              cols.map(c => org.apache.spark.sql.connector.expressions
                .Expressions.column(c)).toArray
            val unvalidated = Constraint.ValidationStatus.UNVALIDATED
            (kc.kind match {
              case "primary" => Constraint.primaryKey(n, refs(kc.columns))
                .enforced(false).rely(kc.rely).validationStatus(unvalidated)
                .build()
              case "unique" => Constraint.unique(n, refs(kc.columns))
                .enforced(false).rely(kc.rely).validationStatus(unvalidated)
                .build()
              case "foreign" => Constraint.foreignKey(n, refs(kc.columns),
                org.apache.spark.sql.connector.catalog.Identifier.of(
                  Array.empty, kc.refTable.getOrElse("")),
                refs(kc.refColumns))
                .enforced(false).rely(kc.rely).validationStatus(unvalidated)
                .build()
            }): Constraint
          }
        (checks ++ keys).toArray
    }

  /** `SHOW TBLPROPERTIES` / DESCRIBE: the chain-resolved commit props of
    * the pinned snapshot (`SnapshotStore.resolvedProps` — later links
    * override earlier keys, which is table-property semantics; includes
    * the store's own `graft.*` protocol keys, which read as useful
    * DESCRIBE output: op tags, bucket claims). UNSET tombstones (empty
    * values — `unsetTableProperties` and constraint drop markers) are
    * filtered: a forgotten key must not SHOW as an empty-valued one. */
  override def properties(): util.Map[String, String] = storeRoot match {
    case None => java.util.Collections.emptyMap[String, String]()
    case Some(root) =>
      val m = new java.util.HashMap[String, String]()
      val store = new graft.core.SnapshotStore(spark, root)
      store.resolvedProps(tableName, snapshotVersion)
        .foreach { case (k, v) => if (v.nonEmpty) m.put(k, v) }
      // Ops visibility: the retention horizon (highest vacuumed committed
      // version) — the line below which feed consumers must bootstrap
      // (`graft_feed_bootstrap`) instead of catching up incrementally.
      // Synthetic (state, not a commit prop), so SET/UNSET can't touch it.
      val h = store.vacuumHorizon(tableName)
      if (h > 0L) m.put("graft.vacuum.horizon", h.toString)
      m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    inner.asInstanceOf[SupportsRead].newScanBuilder(options)

  /** `INSERT INTO` / `INSERT OVERWRITE` / `df.writeTo(...).append()` —
    * planned through Spark's V1 write fallback (`V1Write` →
    * `InsertableRelation`), which hands the insert a driver-side
    * DataFrame: exactly the shape of the store's own atomic commits, so
    * the SQL surface inherits the full protocol — append is the OCC
    * chain-link commit (CAS until won, schema merge + widening rules,
    * change set recorded for the feeds), overwrite is the self-contained
    * rewrite `commit`. No version directory is ever mutated: both land as
    * NEW versions, keeping the immutability contract this builder used to
    * defend by refusing writes outright. A bucketed chain accepts plain
    * inserts but the SPJ layout claim drops (mixed chain) — use
    * `appendBucketed` to keep it. Time-travel resolutions refuse: the
    * write mutates the current head, not the pinned snapshot. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val root = storeRoot.getOrElse(throw new UnsupportedOperationException(
      s"graft table '$tableName' was resolved without a store root — " +
        "writes require the catalog or root-option face; or write through " +
        "SnapshotStore.commit/append"))
    require(!versionPinned,
      s"graft table '$tableName' is pinned to historical version " +
        s"$snapshotVersion — INSERT mutates the current head; resolve the " +
        "table without a version option to write")
    new GraftWriteBuilder(root, tableName)
  }

  // ---- ANSI DELETE (`DELETE FROM kg.t WHERE …`) --------------------------
  // Metadata-plus-matched-files delete through the store's tombstone
  // machinery (SnapshotStore.delete): Spark bridges the V2 predicates to
  // V1 source Filters, we translate those to a Column predicate, and the
  // store commits an O(matched files) delete version via its pointer CAS.
  // Like the insert path above, no version directory is ever mutated —
  // DELETE commits a NEW version like every other mutation. The delete resolves the CURRENT head (a DELETE is a
  // table mutation, not a read of this object's pinned snapshot; the
  // pinned version stays readable via time travel). Predicates outside
  // the translatable set (arithmetic, UDFs, subqueries) make
  // canDeleteWhere false and Spark raises its standard "cannot delete"
  // analysis error — use SnapshotStore.delete with an arbitrary Column
  // for those.
  // A table resolved with an EXPLICIT time-travel version refuses DELETE
  // outright (canDeleteWhere false -> Spark's standard analysis error):
  // the user addressed a historical snapshot, but a delete necessarily
  // mutates the CURRENT head — silently honoring it would delete against
  // a state the user never named. Mutate through an unpinned resolution.
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    storeRoot.isDefined && !versionPinned &&
      filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(!versionPinned,
      s"graft table '$tableName' is pinned to historical version " +
        s"$snapshotVersion — DELETE mutates the current head; resolve the " +
        "table without a version option to delete")
    val root = storeRoot.getOrElse(throw new UnsupportedOperationException(
      s"graft table '$tableName' was resolved without a store root — DELETE " +
        "requires the catalog or root-option face"))
    import org.apache.spark.sql.functions.lit
    val predicate = filters.toSeq
      .map(f => GraftTable.filterToColumn(f).getOrElse(
        throw new UnsupportedOperationException(s"untranslatable delete filter $f")))
      .reduceOption(_ && _)
      .getOrElse(lit(true)) // no WHERE = truncate semantics
    new graft.core.SnapshotStore(spark, root).delete(tableName, predicate)
    ()
  }
}

/** The V1-fallback write: `build()` yields a [[V1Write]] whose
  * [[org.apache.spark.sql.sources.InsertableRelation]] routes the
  * analyzer-aligned DataFrame (Spark has already reordered/cast the query
  * to the table schema) onto `SnapshotStore.append`/`commit`.
  * `SupportsTruncate` is what `INSERT OVERWRITE` (full, `deleteExpr` =
  * true) lowers to; partial overwrites (`replaceWhere`-style filters) are
  * not claimed, so they fail with Spark's standard capability error. */
private[sources] final class GraftWriteBuilder(root: String, table: String)
  extends WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation
          : org.apache.spark.sql.sources.InsertableRelation =
        new org.apache.spark.sql.sources.InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
              overwriteFlag: Boolean): Unit = {
            val store = new graft.core.SnapshotStore(data.sparkSession, root)
            if (overwrite || overwriteFlag) store.commit(table, data)
            else store.append(table, data)
            ()
          }
        }
    }
}

object GraftTable {
  /** Merge fan-in cap for the sorted-bucket ordering claim — canonical
    * value lives on the store ([[SnapshotStore.MaxSortedRunsPerBucket]]),
    * which since r19 also auto-folds bucketed appends BEFORE they cross
    * it; the scan-side drop below stays as the safety net for chains
    * grown through non-bucketed writers. */
  val MaxSortedRunsPerBucket: Int = SnapshotStore.MaxSortedRunsPerBucket

  /** Resolve (pointer → immutable chain) and expand each chain directory
    * to file-grained scan units where its commit wrote a `_stats.json`
    * manifest. Manifest reads are memoized per immutable version, so this
    * adds one small JSON read per chain directory on first touch — never
    * per query. */
  def forSnapshot(spark: SparkSession, store: SnapshotStore, table: String,
      version: Option[Long],
      passThrough: util.Map[String, String] =
        java.util.Collections.emptyMap[String, String]()): GraftTable = {
    val (v, dirs) = store.resolveVersionPaths(table, version)
    // Tombstoned files (`delete`'s `_removed.json` sidecars, keyed
    // "v=N/file") drop out of the scan-unit list here — the connector's
    // file-level twin of `readAt`'s live-file resolution. A manifest-less
    // directory that has tombstones must degrade to a real listing (the
    // whole-directory unit can't exclude single files); manifest-backed
    // directories just filter their keys, still zero filesystem calls.
    val removed = store.removedInChain(table, v)
    val units = dirs.flatMap { d =>
      val dirName = d.getFileName.toString
      val dirVersion = dirName.stripPrefix("v=").toLong
      store.fileStats(table, dirVersion) match {
        case Some(manifest) => manifest.toSeq.sortBy(_._1).collect {
          case (file, st) if !removed.contains(s"$dirName/$file") =>
            ScanUnit(d.resolve(file).toString, Some(st))
        }
        case None if removed.exists(_.startsWith(dirName + "/")) =>
          val s = java.nio.file.Files.list(d)
          try s.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet") &&
              !removed.contains(s"$dirName/${p.getFileName}"))
            .toSeq.sortBy(_.getFileName.toString)
            .map(p => ScanUnit(p.toString, None))
          finally s.close()
        case None => Seq(ScanUnit(d.toString, None))
      }
    }
    // Deletion vectors accumulated along the chain (sparse deletes that
    // rewrote nothing): handed to the scan layer, which drops vectored
    // rows inside the readers (DvParquetScan). Empty for the
    // overwhelmingly common clean snapshot — the scan then stays fully
    // vectorized with aggregate pushdown intact.
    val dv = store.dvInChain(table, v)
      .map { case (k, idxs) => k -> idxs.toArray }
    // Bucket layout (commitBucketed/appendBucketed): claimed to the scan
    // — which then reports KeyGroupedPartitioning for storage-partitioned
    // joins — ONLY when the whole chain carries one spec (bucketSpecOf)
    // and every scan unit is a manifest-backed file whose part-name
    // carries its writer task index (the bucket id). Deletion vectors do
    // NOT drop the claim (the r14 gap): a vector only subtracts rows
    // within a file and can never move a row across buckets, so the scan
    // serves the keyed layout with DV-filtering readers
    // (DvKeyGroupedParquetScan) — bucketSpecOf already breaks the claim
    // for any link that WROTE non-bucket-attributed files (copy-on-write
    // survivors, update post-images); only pure-vector links re-stamp it.
    // Anything else: no claim, plain scan, joins just shuffle as before.
    val bucket = store.bucketLayoutOf(table, v)
      .map { case (cols, dims) =>
        org.apache.spark.sql.graftbridge.BucketLayout(cols, dims) }
      .filter(_ => units.forall(u => u.stat.isDefined &&
        org.apache.spark.sql.graftbridge.KeyGroupedParquetScan.isPartNamed(
          new org.apache.hadoop.fs.Path(u.path).getName)))
    // Chain NDV estimates for CBO column statistics — best-effort (empty
    // for pre-NDV chains), memoized per immutable version in the store,
    // and LAZY: the sidecar reads + HLL unions run only when the
    // optimizer actually asks for columnStats() (cbo on), never on the
    // default planning path.
    val storeRootStr = store.root
    val ndv: () => Map[String, Long] = () =>
      try new graft.core.SnapshotStore(spark, storeRootStr).chainNdv(table, v)
      catch { case scala.util.control.NonFatal(_) => Map.empty[String, Long] }
    // CBO histograms — lazy like NDV; withheld under deletion vectors
    // (the boundaries describe pre-delete rows; a stale histogram can
    // flip a join side the wrong way, absence just falls back to
    // ndv-uniform estimation). Compact folds the vectors and restores.
    val hist: () => Map[String, Array[Double]] =
      if (dv.nonEmpty) () => Map.empty
      else () =>
        try new graft.core.SnapshotStore(spark, storeRootStr)
          .chainHistograms(table, v)
        catch { case scala.util.control.NonFatal(_) =>
          Map.empty[String, Array[Double]] }
    // Per-partition ORDERING claim (sorted buckets → SMJ skips its
    // sorts): every chain link wrote sortWithinPartitions(bucketCols)
    // (BucketSortedProp) — each file is one sorted RUN — and the chain
    // carries no deletion vectors (the DV'd keyed reader chains file
    // groups out of order). Multi-file buckets (append chains) keep the
    // claim: the scan's reader k-way MERGES the per-file runs back to a
    // sorted partition (MergeSortedKeyedReaderFactory), so the sortless
    // SMJ survives appends instead of waiting for a compact — up to a
    // FAN-IN CAP: the merge holds one open reader (row-group buffers)
    // per run, so an unbounded append chain would trade a sort for
    // executor memory; past the cap the claim drops and SMJ just sorts
    // (cheaper than an OOM, and the next compact restores the sortless
    // path). Purely additive: when it drops, the join sorts as before.
    val bucketSorted = bucket.exists { layout =>
      dv.isEmpty && store.bucketSortedOf(table, v) && {
        val counts = new Array[Int](layout.total)
        var maxRuns = 0
        units.foreach { u =>
          val b = org.apache.spark.sql.graftbridge.KeyGroupedParquetScan
            .bucketOf(new org.apache.hadoop.fs.Path(u.path).getName,
              layout.total)
          counts(b) += 1
          if (counts(b) > maxRuns) maxRuns = counts(b)
        }
        maxRuns <= GraftTable.MaxSortedRunsPerBucket
      }
    }
    new GraftTable(table, v, spark, units,
      store.snapshotSchema(table, Some(v)), passThrough, Some(store.root),
      versionPinned = version.isDefined, dv = dv, bucket = bucket,
      physNames = store.physicalNamesByVersion(table, v), ndv = ndv,
      bucketSorted = bucketSorted, hist = hist)
  }

  /** V1 source Filter → Column, for the DELETE translation. None marks a
    * filter outside the supported set (Spark then refuses the DELETE at
    * analysis rather than this table guessing semantics). */
  private[sources] def filterToColumn(
      f: org.apache.spark.sql.sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
      case StringContains(a, v)     => Some(col(a).contains(v))
      case And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(c)         => filterToColumn(c).map(!_)
      case _: AlwaysTrue  => Some(lit(true)) // TRUNCATE's delete-all form
      case _: AlwaysFalse => Some(lit(false))
      case _              => None
    }
  }
}

/** The store's CHANGE FEED as a Structured Streaming micro-batch source:
  * `spark.readStream.format("graft").option("feed", "changes")`. Offsets
  * are committed version numbers; each micro-batch scans exactly the
  * `v=n/_changes/` parquet directories of the versions in its offset range,
  * so a batch is the rows `append` admitted at those versions — never a
  * re-read of the accumulated snapshot. Versions are immutable once
  * committed, which is what makes restart replay exactly reproducible from
  * a checkpointed offset (the reference's epoch log gives its workers the
  * same replay contract, schema/00_baseline.sql:2198-2240). Rewrites (bare
  * `commit`) record no change set and are skipped, like overwrites outside
  * Delta CDF. Lagging consumers and `vacuum` compose the usual way: vacuum
  * drops old versions' change sets with the versions themselves, so set
  * `keepLast` to cover the longest expected consumer lag. */
final class GraftChangeFeedTable(root: String, table: String,
    tableSchema: StructType, startingVersion: Long)
  extends Table with SupportsRead {

  override def name(): String = s"graft:$table@changes"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def description(): String = name() + " (version change feed)"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftMicroBatchStream(root, table, tableSchema, startingVersion)
      }
    }
}

/** Version-number offsets: the feed's position is "all change sets of
  * committed versions ≤ v have been emitted". */
final case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** The store's CHANGE-DATA feed as a streaming source
  * (`spark.readStream.format("graft").option("feed", "cdf")`): every
  * micro-batch carries the TAGGED row images of its version range —
  * `_change_type` 'insert' for admitted change sets, 'delete' for
  * delete/update pre-images — plus `_version`. Where the insert-only
  * `feed=changes` contract treats a delete as "resubscribe", this feed
  * lets an incremental consumer FOLD the retraction
  * ([[graft.core.Incremental]]'s signed maintenance) and keep running
  * across deletes, sparse DV deletes, and updates (which appear as
  * delete(pre) + insert(post) at one version, netting exactly). REWRITES
  * (INSERT OVERWRITE / bare commits) record no images, but their
  * before/after snapshots are retained immutable versions, so the planner
  * SYNTHESIZES them at read time — whole pre-rewrite snapshot as
  * 'delete', whole new snapshot as 'insert', one version — and a
  * long-running consumer survives an overwrite without resubscribe.
  * Schema-CHANGING rewrites stay out (the pinned-schema evolution
  * contract: resubscribe) — `nonFeedMutationsSince` detects those. */
final class GraftCdfTable(root: String, table: String,
    tableSchema: StructType, startingVersion: Long)
  extends Table with SupportsRead {

  override def name(): String = s"graft:$table@cdf"
  override def schema(): StructType = GraftCdfTable.tagged(tableSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftCdfTable.tagged(tableSchema)
        override def description(): String = name() + " (change-data feed)"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdfMicroBatchStream(root, table, tableSchema, startingVersion)
      }
    }
}

object GraftCdfTable {
  /** The feed's output schema: every table column, then the two tags. */
  def tagged(tableSchema: StructType): StructType =
    StructType(tableSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
}

/** One planned parquet partition of the CDF stream, tagged with the
  * version and image kind its rows carry — the reader appends the tags as
  * constant trailing columns. `factory`, when set, overrides the stream's
  * default reader factory for this partition: SYNTHESIZED rewrite images
  * plan through the full snapshot scan (tombstones, deletion vectors,
  * manifests), whose reader factory is version-specific. */
final case class GraftCdfInputPartition(inner: InputPartition,
    changeType: String, version: Long,
    factory: Option[PartitionReaderFactory] = None,
    padNulls: Int = 0) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Micro-batch planner for the change-data feed: per version in the
  * offset range, the `_changes` directory plans as 'insert' partitions
  * and `_changes_removed` as 'delete' partitions — one immutable parquet
  * scan each, nothing proportional to table size. */
final class GraftCdfMicroBatchStream(root: String, table: String,
    tableSchema: StructType, startingVersion: Long) extends MicroBatchStream {

  private def spark = SparkSession.active
  private def store = new SnapshotStore(spark, root)

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)

  override def latestOffset(): Offset =
    GraftVersionOffset(
      store.latestVersion(table).getOrElse(startingVersion).max(startingVersion))

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def planDir(dir: String): Array[InputPartition] =
    ParquetTableShim.unfilteredBatch(
      ParquetTableShim.tableWithSchema(s"graft:$table@cdf", spark, Seq(dir),
        tableSchema)).planInputPartitions()

  /** The subscriber schema with field-ID metadata STRIPPED — what a
    * PRE-ADOPTION (ID-less) version's recorded files are read under:
    * their footers carry no IDs, so an ID'd read schema would fail
    * loudly; name resolution is those files' native (legacy) contract,
    * and the field ORDER is the subscriber's, so positional tag
    * composition is unchanged. */
  private lazy val strippedSchema: StructType =
    StructType(tableSchema.fields.map(f => f.copy(
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .remove(graft.core.SnapshotStore.FieldIdKey).build())))

  /** `v` predates the table's field-ID adoption while the subscriber
    * schema is ID'd — read that version's recorded files by NAME. */
  private def legacyVersion(v: Long): Boolean =
    graft.core.SnapshotStore.schemaHasFieldIds(tableSchema) &&
      !graft.core.SnapshotStore.schemaHasFieldIds(
        store.snapshotSchema(table, Some(v)))

  /** Plan a legacy version's directory under the stripped schema, with
    * the matching reader factory carried per partition. Refuses LOUDLY
    * when the legacy version carries a column name the subscriber schema
    * does not know (renamed or dropped since adoption): with no IDs in
    * those files, name resolution would silently read the renamed
    * column as NULL — never silent, so resubscribe instead. */
  private def planLegacyDir(dir: String, tag: String, v: Long)
      : Array[GraftCdfInputPartition] = {
    GraftFeedLegacy.requireNamesBind(store, table, v, tableSchema)
    val batch = ParquetTableShim.unfilteredBatch(
      ParquetTableShim.tableWithSchema(s"graft:$table@cdf", spark, Seq(dir),
        strippedSchema))
    val f = batch.createReaderFactory()
    batch.planInputPartitions().map(GraftCdfInputPartition(_, tag, v, Some(f)))
  }

  /** LOSSLESS-WIDEN bind of a rewrite's (prev, v) snapshot PAIR to the
    * subscriber schema — the only sound unit of decision: a subscriber
    * column absent from ONE side is benign exactly when its absence
    * means "not added yet" (pad NULL — the value a direct read of those
    * rows under the subscriber schema gives), and a silent corruption
    * when it means "dropped by this rewrite" (present in prev, gone in
    * v: the post-images would null a column whose data the rewrite
    * destroyed, while the batch twin refuses — the twins must agree).
    * Per subscriber column, matched by FIELD ID where both sides carry
    * them (rename-safe, and the fresh-ID re-add guarantee makes
    * absence-by-ID provably "this data never existed for this column"),
    * by case-insensitive name on legacy chains:
    *   - found on a side with the EXACT type → read there (pruned);
    *   - found NARROWER than the subscriber's pinned type, natively
    *     widenable (int→long, float→double…) → read under the wide type;
    *   - found with any other type skew → lossy retype → None
    *     (resubscribe);
    *   - absent from v but present in prev → DROPPED → None;
    *   - absent from a side otherwise → pad NULL on that side, required
    *     to be a TRAILING suffix (the reader pads positionally after
    *     the present columns — adds append at the schema's end).
    * Returns per-side (pruned read schema, trailing pad count). */
  private def rewriteBinding(prevOpt: Option[Long], v: Long)
      : Option[(Option[(StructType, Int)], (StructType, Int))] = {
    import org.apache.spark.sql.types.StructField
    val sv = store.snapshotSchema(table, Some(v))
    val sp = prevOpt.map(p => store.snapshotSchema(table, Some(p)))
    def idOf(f: StructField): Option[Long] =
      if (f.metadata.contains(graft.core.SnapshotStore.FieldIdKey))
        Some(f.metadata.getLong(graft.core.SnapshotStore.FieldIdKey))
      else None
    // Matched = Some(field); type-mismatch = poison (None short-circuit
    // via a sentinel); absent = Some-less. Encode: Right(field) found,
    // Left(()) type conflict, encoded as Option[Option[StructField]].
    def find(side: StructType, b: StructField): Option[Option[StructField]] = {
      val byId = idOf(b).flatMap(id =>
        side.fields.find(f => idOf(f).contains(id)))
      val m = byId.orElse(
        // name fallback only when ID matching can't apply on this pair
        if (idOf(b).isEmpty || side.fields.forall(idOf(_).isEmpty))
          side.fields.find(_.name.equalsIgnoreCase(b.name))
        else None)
      m match {
        case Some(f) if f.dataType == b.dataType => Some(Some(f))
        case Some(f) if store.widensTo(f.dataType, b.dataType) =>
          // the version's file is NARROWER than the subscriber's pinned
          // type (a retype-widen rewrite sits between them): read it
          // UNDER the wide type — the same native vectorized int->long /
          // float->double widen the store's append contract relies on —
          // so the positional row binding carries the wide value. The
          // reverse skew (file wider than the pinned type) has no
          // lossless read and stays the resubscribe poison below.
          Some(Some(f.copy(dataType = b.dataType)))
        case Some(_) => None // lossy retype: poison the whole bind
        case None => Some(None) // genuinely absent on this side
      }
    }
    val perCol: Array[Option[(Option[StructField], Option[Option[StructField]])]] =
      tableSchema.fields.map { b =>
        find(sv, b) match {
          case None => None
          case Some(inV) =>
            val inPrev = sp.map(find(_, b)) match {
              case Some(None) => return None // retype on the prev side
              case Some(Some(x)) => Some(x)
              case None => None // no predecessor at all
            }
            // DROPPED AT THIS REWRITE: prev had it, v lost it — refuse
            if (inV.isEmpty && inPrev.exists(_.isDefined)) return None
            Some((inV, inPrev))
        }
      }
    if (perCol.exists(_.isEmpty)) return None
    def sideOf(pick: Array[Option[StructField]]): Option[(StructType, Int)] = {
      val missing = pick.zipWithIndex.collect { case (None, i) => i }.toSeq
      val suffixStart = tableSchema.length - missing.length
      if (missing == (suffixStart until tableSchema.length))
        Some((StructType(pick.flatten.toSeq), missing.length))
      else None
    }
    val vSide = sideOf(perCol.map(_.get._1))
    val pSide = sp.map(_ => sideOf(perCol.map(_.get._2.flatten)))
    (vSide, pSide) match {
      case (Some(vb), None) => Some((None, vb))
      case (Some(vb), Some(Some(pb))) => Some((Some(pb), vb))
      case _ => None
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftVersionOffset].version
    val to = end.asInstanceOf[GraftVersionOffset].version
    store.requireFeedReach(table, from) // vacuumed history: refuse loudly
    val recorded = store.cdfVersions(table).filter(v => v > from && v <= to)
      .flatMap { v =>
        val legacy = legacyVersion(v)
        def plan(dir: String, tag: String): Array[GraftCdfInputPartition] =
          if (legacy) planLegacyDir(dir, tag, v)
          else planDir(dir).map(GraftCdfInputPartition(_, tag, v))
        val inserts =
          if (java.nio.file.Files.exists(
              store.changesDirOf(table, v).resolve("_SUCCESS")))
            plan(store.changesDirOf(table, v).toString, "insert")
          else Array.empty[GraftCdfInputPartition]
        val deletes =
          if (store.hasRemovedRows(table, v))
            plan(store.removedRowsDirOf(table, v).toString, "delete")
          else Array.empty[GraftCdfInputPartition]
        inserts ++ deletes
      }
    // REWRITE-CLASS versions (INSERT OVERWRITE / bare commits) recorded no
    // images, but both snapshots they connect are retained immutable
    // versions — so their images are SYNTHESIZED at read time: the whole
    // pre-rewrite snapshot as 'delete' rows and the whole new snapshot as
    // 'insert' rows, tagged with the rewrite's version. O(old + new),
    // zero storage amplification (Delta materializes change files for
    // this; immutable versions make it a free read). A long-running
    // feed=cdf consumer thus survives an overwrite exactly, without
    // resubscribe. Planned through the full snapshot scan machinery
    // (GraftTable.forSnapshot: tombstones, deletion vectors, manifests),
    // each side carrying its version-specific reader factory.
    // Drop/lossy-retype/rename-breaking rewrites stay out (resubscribe);
    // LOSSLESS-WIDEN ones (add-column overwrites, and native
    // retype-widens like int->long under a post-widen subscriber) serve
    // under the subscriber's pinned schema via column pruning, trailing
    // null-pads, and the vectorized reader's own numeric widening
    // — decided per (prev, v) PAIR, so a column this rewrite DROPPED is
    // distinguishable from one not yet added (see rewriteBinding).
    val rewrites = store.nonFeedMutationsSince(table, from)
      .filter(_ <= to)
      .flatMap { v =>
        val prev = store.history(table).filter(_ < v).lastOption
        rewriteBinding(prev, v) match {
          case None => Nil // not losslessly bindable: resubscribe
          case Some((prevBind, vBind)) =>
            // predecessor-integrity under vacuum (see changeFeedSince): a
            // reclaimed true predecessor would make the synthesized
            // before-image silently WRONG — refuse loudly instead
            val h = store.vacuumHorizon(table)
            if (prev.exists(_ <= h) || (prev.isEmpty && h > 0))
              throw new IllegalStateException(
                s"feed=cdf over $table: rewrite version $v's pre-image " +
                  s"snapshot was vacuumed (retention horizon $h) — recompute " +
                  "from the snapshot or resubscribe past the rewrite")
            def side(ver: Long, tag: String,
                bind: (StructType, Int)): Seq[GraftCdfInputPartition] = {
              val (proj, pad) = bind
              val batch = ParquetTableShim.projectedBatch(
                GraftTable.forSnapshot(spark, store, table, Some(ver)), proj)
              val f = batch.createReaderFactory()
              batch.planInputPartitions().toSeq
                .map(GraftCdfInputPartition(_, tag, v, Some(f), pad))
            }
            prev.toSeq.flatMap(p =>
              side(p, "delete", prevBind.getOrElse(
                throw new IllegalStateException(
                  s"feed=cdf over $table: predecessor bind missing for $v")))) ++
              side(v, "insert", vBind)
        }
      }
    (recorded ++ rewrites).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdfReaderFactory(
      ParquetTableShim.unfilteredBatch(
        ParquetTableShim.tableWithSchema(s"graft:$table@cdf", spark,
          Seq.empty, tableSchema)).createReaderFactory())
}

/** Appends the partition's constant (change type, version) tags to every
  * row via a reused JoinedRow — no per-row allocation. */
final class GraftCdfReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val cp = p.asInstanceOf[GraftCdfInputPartition]
    // a partition carrying its own factory (synthesized rewrite images,
    // pre-adoption legacy versions) reads through it; everything else
    // through the stream's default
    val innerReader = cp.factory.getOrElse(inner).createReader(cp.inner)
    // padNulls: trailing subscriber columns absent from this partition's
    // snapshot (a pre-widen image read by a post-widen subscriber) —
    // null-filled ahead of the constant tags, positions intact
    val tags = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array.fill[Any](cp.padNulls)(null) ++
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(cp.changeType),
          cp.version))
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      override def next(): Boolean = innerReader.next()
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        joined(innerReader.get(), tags)
      override def close(): Unit = innerReader.close()
    }
  }
}

/** Micro-batch planner for the change feed. Driver-side work per batch is
  * one pointer read + a directory listing of the version range — nothing
  * scales with table size — and the scan itself delegates to Spark's
  * vectorized parquet batch over the range's `_changes` directories. */
final class GraftMicroBatchStream(root: String, table: String,
    tableSchema: StructType, startingVersion: Long) extends MicroBatchStream {

  private def spark = SparkSession.active
  private def store = new SnapshotStore(spark, root)

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)

  override def latestOffset(): Offset =
    GraftVersionOffset(
      store.latestVersion(table).getOrElse(startingVersion).max(startingVersion))

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def changeVersions(from: Long, to: Long): Seq[Long] =
    store.changedVersions(table).filter(v => v > from && v <= to)

  /** PRE-ADOPTION (ID-less) versions under an ID'd subscriber schema read
    * by NAME: their files carry no footer IDs, so the ID'd schema would
    * fail loudly. Stripping only the ID metadata keeps the subscriber's
    * field order, so positional row binding is unchanged. */
  private lazy val strippedSchema: StructType =
    StructType(tableSchema.fields.map(f => f.copy(
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .remove(graft.core.SnapshotStore.FieldIdKey).build())))

  private def legacyVersion(v: Long): Boolean =
    graft.core.SnapshotStore.schemaHasFieldIds(tableSchema) &&
      !graft.core.SnapshotStore.schemaHasFieldIds(
        store.snapshotSchema(table, Some(v)))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftVersionOffset].version
    store.requireFeedReach(table, from) // vacuumed history: refuse loudly
    val vs = changeVersions(from,
      end.asInstanceOf[GraftVersionOffset].version)
    if (vs.isEmpty) return Array.empty
    val (legacy, idd) = vs.partition(legacyVersion)
    val iddParts: Array[InputPartition] =
      if (idd.isEmpty) Array.empty
      else ParquetTableShim.unfilteredBatch(
        ParquetTableShim.tableWithSchema(s"graft:$table@changes", spark,
          idd.map(v => store.changesDirOf(table, v).toString),
          tableSchema)).planInputPartitions()
    val legacyParts: Array[InputPartition] =
      if (legacy.isEmpty) Array.empty
      else {
        legacy.foreach(v =>
          GraftFeedLegacy.requireNamesBind(store, table, v, tableSchema))
        val batch = ParquetTableShim.unfilteredBatch(
          ParquetTableShim.tableWithSchema(s"graft:$table@changes", spark,
            legacy.map(v => store.changesDirOf(table, v).toString),
            strippedSchema))
        val f = batch.createReaderFactory()
        batch.planInputPartitions()
          .map(GraftFeedInputPartition(_, f): InputPartition)
      }
    iddParts ++ legacyParts
  }

  /** File-set-agnostic by construction: the parquet reader factory is built
    * from schema + conf, and every planned partition carries its own files,
    * so one factory serves any batch of this stream — except legacy
    * (pre-adoption) partitions, which carry their own name-resolving
    * factory and are dispatched by the wrapper. */
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFeedReaderFactory(ParquetTableShim.unfilteredBatch(
      ParquetTableShim.tableWithSchema(s"graft:$table@changes", spark,
        Seq.empty, tableSchema)).createReaderFactory())
}

object GraftFeedLegacy {
  /** Pre-adoption (ID-less) versions are read by NAME under the
    * subscriber's id-stripped schema; that is only sound when every
    * column the legacy version carried still exists under the same name.
    * A name the subscriber no longer knows means a rename (or drop)
    * happened since — with no footer IDs to follow, the renamed column
    * would silently read NULL, so the feed refuses loudly instead. */
  def requireNamesBind(store: SnapshotStore, table: String, v: Long,
      subscriber: StructType): Unit = {
    val vNames = store.snapshotSchema(table, Some(v))
      .fieldNames.map(_.toLowerCase).toSet
    val subNames = subscriber.fieldNames.map(_.toLowerCase).toSet
    val unknown = vNames -- subNames
    require(unknown.isEmpty,
      s"feed over $table: pre-adoption version $v carries column(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")} the subscriber schema no " +
        "longer names (renamed or dropped after field-ID adoption) — name " +
        "resolution would silently null the renamed data; resubscribe " +
        "with startingVersion at or past the adoption version")
  }
}

/** An insert-feed partition carrying its own reader factory (legacy
  * pre-adoption versions read by name). */
final case class GraftFeedInputPartition(inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Dispatches wrapped partitions to their carried factory; everything
  * else — including the columnar fast path — delegates to the default. */
final class GraftFeedReaderFactory(default: PartitionReaderFactory)
  extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: GraftFeedInputPartition => false
    case other => default.supportColumnarReads(other)
  }
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = p match {
    case f: GraftFeedInputPartition => f.factory.createReader(f.inner)
    case other => default.createReader(other)
  }
  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] =
    default.createColumnarReader(p)
}
