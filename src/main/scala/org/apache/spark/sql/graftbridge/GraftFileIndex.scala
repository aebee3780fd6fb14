package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, NoopCache, PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}

import graft.core.FileStats.FileStat
import graft.sources.DataSkipping

/** Manifest-backed file index for snapshot-store scans — the piece that
  * makes the store's `_stats.json` zone maps ACT on the read path.
  *
  * Placement: `FileScan.partitions` calls
  * `fileIndex.listFiles(partitionFilters, dataFilters)` with the CATALYST
  * predicates the scan builder received during V2 pushdown. Pruning here —
  * rather than in an optimizer rule — means every consumer (DataFrame
  * `format("graft")`, the `kg.*` SQL catalog, `VERSION AS OF` time travel)
  * skips automatically, on any session, with nothing to register; it is
  * exactly where Delta's `TahoeLogFileIndex` and Iceberg's Spark scan do
  * their skipping.
  *
  * Files carried in the manifest are served WITHOUT touching the
  * filesystem: size + mtime come from `_stats.json`, so a chain read costs
  * one small JSON per chain directory (memoized per immutable version)
  * instead of a recursive listing — at warehouse scale, listing is the
  * other half of the skipping win. Chain directories from commits without
  * a manifest (legacy, or a crash between data and stats) fall back to a
  * real listing via [[InMemoryFileIndex]] and are never pruned.
  */
final class GraftFileIndex(
    sparkSession: SparkSession,
    knownFiles: Seq[(FileStatus, FileStat)],
    unlistedDirs: Seq[Path],
    /** Per-version logical→physical column name mapping (both lowercased),
      * keyed by the version DIRECTORY name ("v=N") a file sits in: after a
      * metadata RENAME on a field-ID'd chain, pre-rename files hold a
      * column under its OLD name, and zone-map pruning must look its
      * stats up there — and must NOT infer all-null from the new name's
      * absence. Empty for rename-free tables (identity resolution). */
    physNames: Map[String, Map[String, String]] = Map.empty)
  extends PartitioningAwareFileIndex(sparkSession, Map.empty, None, NoopCache) {

  private def resolveFor(st: FileStatus): Map[String, String] =
    if (physNames.isEmpty) Map.empty
    else physNames.getOrElse(st.getPath.getParent.getName, Map.empty)

  private lazy val dirIndex: Option[InMemoryFileIndex] =
    if (unlistedDirs.isEmpty) None
    else Some(new InMemoryFileIndex(sparkSession, unlistedDirs, Map.empty, None))

  private def dirStatuses: Seq[FileStatus] = dirIndex.toSeq.flatMap(_.allFiles())

  override def rootPaths: Seq[Path] =
    knownFiles.map(_._1.getPath) ++ unlistedDirs

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    (knownFiles.map(_._1) ++ dirStatuses).foreach(st => m(st.getPath) = st)
    m
  }

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    (knownFiles.map(_._1) ++ dirStatuses)
      .groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  /** The pruning hook: keep a manifest file only if EVERY pushed data
    * filter may match it (the filters are conjuncts). Unlisted-dir files
    * always survive — no stats, no proof. */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) knownFiles.map(_._1)
      else knownFiles.collect {
        case (st, fs) if dataFilters.forall(
          DataSkipping.mayMatch(_, fs, resolveFor(st))) => st
      }
    Seq(PartitionDirectory(InternalRow.empty, (kept ++ dirStatuses).toArray))
  }

  /** Manifest-derived scan estimate under the pushed data filters:
    * Some((surviving rows, surviving bytes, total bytes)) when EVERY file
    * in scope carries a manifest entry; None when any unlisted directory
    * contributes files of unknown size/rows. Rows are exact per surviving
    * file (parquet footer counts), so the estimate reflects zone-map
    * pruning — a selective point read over a huge table reports the few
    * thousand rows it will actually produce, not the table's total. */
  def prunedStats(dataFilters: Seq[Expression]): Option[(Long, Long, Long)] =
    if (unlistedDirs.nonEmpty) None
    else {
      val kept =
        if (dataFilters.isEmpty) knownFiles.map(_._2)
        else knownFiles.collect {
          case (st, fs) if dataFilters.forall(
            DataSkipping.mayMatch(_, fs, resolveFor(st))) => fs
        }
      Some((kept.map(_.rows).sum, kept.map(_.bytes).sum,
        knownFiles.map(_._2.bytes).sum))
    }

  /** Store-relative keys ("v=N/name.parquet" — the deletion-vector
    * sidecar's key shape) of the manifest files SURVIVING the pushed data
    * filters. DV statistics subtract only these files' vector rows: a
    * pruned-away file's deleted rows were never in the pruned row count,
    * so subtracting them would undercount the scan and mis-size joins. */
  def prunedKeys(dataFilters: Seq[Expression]): Set[String] = {
    val kept =
      if (dataFilters.isEmpty) knownFiles.map(_._1)
      else knownFiles.collect {
        case (st, fs) if dataFilters.forall(
          DataSkipping.mayMatch(_, fs, resolveFor(st))) => st
      }
    kept.map(st =>
      s"${st.getPath.getParent.getName}/${st.getPath.getName}").toSet
  }

  /** Store-relative keys of manifest files that MAY hold any of
    * `sortedVals` in `colLower` — the RUNTIME-filter twin of
    * [[prunedKeys]], evaluated against a dynamic `IN` list (a broadcast
    * join's build-side keys) instead of static pushed predicates. Only
    * manifest-backed files appear (unlisted-dir files have no stats and
    * are never runtime-pruned); the per-file check is
    * [[DataSkipping.mayMatchIn]]'s O(log V) bound search, so a
    * 100k-key dynamic filter over a 10k-file chain costs ~10⁵
    * comparisons on the driver, not 10⁹. */
  def runtimeInKeys(colLower: String,
      sortedVals: Array[graft.core.FileStats.StatVal]): Set[String] =
    knownFiles.collect {
      case (st, fs) if DataSkipping.mayMatchIn(fs, colLower, sortedVals,
        resolveFor(st)) =>
        s"${st.getPath.getParent.getName}/${st.getPath.getName}"
    }.toSet

  /** Store-relative keys of manifest files whose [min, max] MAY intersect
    * the (lower, upper) range — [[runtimeInKeys]]'s RANGE twin, for
    * non-equi dynamic filters (band joins): each bound optional, each
    * carrying its inclusivity. */
  def runtimeRangeKeys(colLower: String,
      lower: Option[(graft.core.FileStats.StatVal, Boolean)],
      upper: Option[(graft.core.FileStats.StatVal, Boolean)]): Set[String] =
    knownFiles.collect {
      case (st, fs) if DataSkipping.mayMatchRange(fs, colLower, lower, upper,
        resolveFor(st)) =>
        s"${st.getPath.getParent.getName}/${st.getPath.getName}"
    }.toSet

  /** Keys of ALL manifest-backed files — the universe [[runtimeInKeys]]
    * prunes within (a file outside it has no stats and must survive any
    * runtime filter). */
  def allManifestKeys: Set[String] =
    knownFiles.map(st =>
      s"${st._1.getPath.getParent.getName}/${st._1.getPath.getName}").toSet

  /** CHAIN-merged per-column statistics for CBO: logical lowercased
    * column name → (min, max, nullCount) folded across every manifest
    * file (rename-aware via `physNames`, like the pruner). A bound is
    * reported only when EVERY file carrying the column proves one — a
    * partial min/max would silently narrow the domain and mislead range
    * estimation; a column physically ABSENT from a file is all-NULL
    * there (contributes its row count to nullCount, nothing to bounds).
    * Empty when any unlisted directory contributes unknown files. */
  def chainColStats(colsLower: Seq[String],
      keep: Option[Set[String]] = None)
      : Map[String, (Option[graft.core.FileStats.StatVal],
        Option[graft.core.FileStats.StatVal], Option[Long])] = {
    import graft.core.FileStats
    if (unlistedDirs.nonEmpty) return Map.empty
    // `keep` restricts the fold to the files SURVIVING the scan's pushed
    // data filters, so the reported column stats describe the same row
    // set as the scan's pruned numRows — mixing pruned rowCount with
    // chain-wide nullCounts hands CBO nullCount > rowCount and negative
    // selectivities.
    val scoped = keep match {
      case None => knownFiles
      case Some(ks) => knownFiles.filter { case (st, _) =>
        ks.contains(s"${st.getPath.getParent.getName}/${st.getPath.getName}")
      }
    }
    colsLower.map { cl =>
      var mn: Option[FileStats.StatVal] = None
      var mx: Option[FileStats.StatVal] = None
      var minKnown = true; var maxKnown = true
      var nulls = 0L; var nullsKnown = true
      scoped.foreach { case (st, fs) =>
        val phys = resolveFor(st).getOrElse(cl, cl)
        fs.cols.get(phys) match {
          case Some(cs) =>
            (cs.min, mn) match {
              case (Some(v), cur) if minKnown =>
                mn = cur match {
                  case Some(m) => FileStats.compareOpt(v, m) match {
                    case Some(c) => Some(if (c < 0) v else m)
                    case None => minKnown = false; None // cross-domain: drop
                  }
                  case None => Some(v)
                }
              case (None, _) =>
                // all-null files legitimately carry no bounds; a file with
                // non-null rows and no bound withholds the chain bound
                if (!cs.nullCount.contains(fs.rows)) { minKnown = false; mn = None }
              case _ => ()
            }
            (cs.max, mx) match {
              case (Some(v), cur) if maxKnown =>
                mx = cur match {
                  case Some(m) => FileStats.compareOpt(v, m) match {
                    case Some(c) => Some(if (c > 0) v else m)
                    case None => maxKnown = false; None
                  }
                  case None => Some(v)
                }
              case (None, _) =>
                if (!cs.nullCount.contains(fs.rows)) { maxKnown = false; mx = None }
              case _ => ()
            }
            cs.nullCount match {
              case Some(n) => nulls += n
              case None => nullsKnown = false
            }
          case None =>
            if (fs.leaves.contains(phys)) {
              // physically present, no stats recorded: unknown everything
              minKnown = false; maxKnown = false; nullsKnown = false
              mn = None; mx = None
            } else nulls += fs.rows // absent column reads all-NULL
        }
      }
      cl -> ((if (minKnown) mn else None, if (maxKnown) mx else None,
        if (nullsKnown) Some(nulls) else None))
    }.toMap
  }

  override def refresh(): Unit = dirIndex.foreach(_.refresh())

  override def sizeInBytes: Long =
    knownFiles.map(_._1.getLen).sum + dirIndex.map(_.sizeInBytes).getOrElse(0L)

  override def inputFiles: Array[String] =
    (knownFiles.map(_._1.getPath.toString) ++
      dirStatuses.map(_.getPath.toString)).toArray
}
