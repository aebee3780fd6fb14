package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Versioned parquet table store — the thin snapshot layer the epoch log
  * implies (reference M8, ADR-207: every read pins a committed snapshot;
  * schema/00_baseline.sql:2198-2240). No Delta/Iceberg is available
  * offline, so this is the minimal immutable-version design:
  *
  *   root/<table>/v=<n>/ …parquet…   — immutable version directories
  *   root/<table>/_latest            — pointer file, updated by atomic rename
  *
  * Writers `commit` a whole new version (append = union + commit);
  * readers resolve the pointer ONCE and then hold an immutable directory,
  * so a concurrent commit never mutates data under a running query —
  * exactly the snapshot-rewrite contract the mutation surface (M1-M7)
  * assumes. Old versions remain for time travel until `vacuum`.
  */
final class SnapshotStore(spark: SparkSession, root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def versionDir(table: String, v: Long): Path =
    tableDir(table).resolve(s"v=$v")
  private def pointer(table: String): Path = tableDir(table).resolve("_latest")

  /** Commit `df` as the next version of `table`; returns the new version.
    *
    * Version numbers are ALLOCATED by atomic `Files.createDirectory` on the
    * version dir: the committer that creates `v=n` owns it exclusively, and a
    * concurrent committer (other instance or other JVM on the same root) that
    * loses the race gets `FileAlreadyExistsException` and retries with n+1 —
    * a sibling's version directory can never be clobbered. The directory is
    * fully written before the pointer moves (write-then-rename), so readers
    * never observe a partial version. A mid-write crash leaves an orphan dir
    * ABOVE the pointer; it is skipped by later allocations, excluded from
    * `history`, and reclaimable via `vacuum(dropOrphans = true)`.
    *
    * The pointer only moves FORWARD (never to a lower version), so two racing
    * committers converge on the higher version; the lower one remains on disk
    * as a committed-but-superseded version. A version directory counts as
    * COMMITTED only once its `_SUCCESS` marker exists (written by the
    * FileOutputCommitter after every part file) — a racing committer that is
    * overtaken, or a crash mid-write, leaves a marker-less directory that
    * `history`/`read` never expose, whatever its position relative to the
    * pointer. Cross-JVM `append` linearization is still the caller's job
    * (see `append`). */
  def commit(table: String, df: DataFrame): Long = SnapshotStore.rootLock(root) {
    Files.createDirectories(tableDir(table))
    var next = math.max(latestVersion(table).getOrElse(0L), maxVersionDir(table)) + 1L
    var claimed = false
    while (!claimed) {
      try { Files.createDirectory(versionDir(table, next)); claimed = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => next += 1L }
    }
    // `append` into the just-claimed EMPTY directory — overwrite would
    // first DELETE it, and in that window a concurrent committer's
    // createDirectory on the same version would succeed, putting two
    // writers in one directory. The claim must exist continuously from
    // allocation to pointer move. (Allocation never reuses an existing
    // directory, so append semantics can never mix two commits.)
    df.write.mode("append").parquet(versionDir(table, next).toString)
    advancePointer(table, next)
    next
  }

  /** Move the pointer to `next` unless an already-committed version is newer.
    * Forward-only is enforced under a cross-process FILE LOCK on the table
    * root (plus the JVM-wide monitor inside [[SnapshotStore.rootLock]]) — a
    * bare check-then-rename would let two committers interleave reads and
    * regress the pointer. Local-filesystem design, like the store itself; an
    * object-store deployment swaps this layer for a commit log, exactly as
    * Delta/Iceberg do. */
  private def advancePointer(table: String, next: Long): Unit = {
    val lockPath = tableDir(table).resolve("_pointer.lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        if (latestVersion(table).forall(_ < next)) {
          val tmp = pointer(table).resolveSibling(s"_latest.$next.tmp")
          Files.writeString(tmp, next.toString)
          Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      } finally lock.release()
    } finally ch.close()
  }

  /** Highest existing version DIRECTORY (committed or orphan) — allocation
    * must start above both the pointer and any orphan. */
  private def maxVersionDir(table: String): Long =
    versionDirs(table).foldLeft(0L)(math.max)

  /** Append rows as a new version (union with the current snapshot).
    * Root-locked so that within ONE JVM the base resolution and the commit
    * are a single atomic step. Across instances/JVMs, version
    * allocation (see `commit`) guarantees neither append's data is ever
    * overwritten, but two appends basing off the same snapshot still produce
    * two sibling versions each missing the other's batch — read-modify-write
    * appends on a shared root require a single writer per table (the same
    * contract Delta/Iceberg enforce with a commit log; the reference gets it
    * from Postgres transactions, schema/00_baseline.sql:2198-2240). */
  def append(table: String, rows: DataFrame): Long = SnapshotStore.rootLock(root) {
    commit(table, latestVersion(table) match {
      case Some(v) => readAt(table, v).unionByName(rows, allowMissingColumns = true)
      case None    => rows
    })
  }

  def latestVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Read the current snapshot: the pointer is resolved NOW, after which
    * the returned DataFrame is bound to an immutable directory. */
  def read(table: String): DataFrame =
    readAt(table, latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"no committed version of $table")))

  /** Time travel: read a specific version. Refuses a version whose write
    * never completed (no `_SUCCESS` marker) — an in-flight or crashed
    * sibling commit must not be readable as data. */
  def readAt(table: String, version: Long): DataFrame = {
    require(isCommitted(table, version),
      s"version $version of $table is not a committed version")
    spark.read.parquet(versionDir(table, version).toString)
  }

  /** True iff the version directory's write COMPLETED: the
    * FileOutputCommitter writes `_SUCCESS` only after every part file is in
    * place, so a slow or crashed commit — even one overtaken by a sibling
    * whose pointer advanced past it — is never mistaken for data. */
  private def isCommitted(table: String, v: Long): Boolean =
    Files.exists(versionDir(table, v).resolve("_SUCCESS"))

  /** Every existing version directory number, ascending (committed or not). */
  private def versionDirs(table: String): Seq[Long] = {
    val d = tableDir(table)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
        .toSeq.sorted
      finally s.close()
    }
  }

  /** All COMMITTED versions, ascending: completed writes (`_SUCCESS`
    * present) at or below the pointer. A marker-less directory — in-flight,
    * crashed, or overtaken mid-write by a faster sibling — is not history
    * wherever it sits relative to the pointer. */
  def history(table: String): Seq[Long] = latestVersion(table) match {
    case None => Seq.empty
    case Some(latest) =>
      versionDirs(table).filter(v => v <= latest && isCommitted(table, v))
  }

  /** Drop committed versions older than the newest `keepLast`; the
    * pointer's version is always kept (keep set is derived from committed
    * history, never from stray directories). With `dropOrphans`, also remove
    * directories whose write never completed (no `_SUCCESS`) — crashed or
    * overtaken commits at ANY position — which is only safe when no commit
    * is in flight on this table. */
  def vacuum(table: String, keepLast: Int = 1, dropOrphans: Boolean = false): Unit =
    SnapshotStore.rootLock(root) {
      val committed = history(table)
      val keep = committed.takeRight(math.max(keepLast, 1)).toSet ++
        latestVersion(table)
      val orphans =
        if (!dropOrphans) Seq.empty
        else versionDirs(table).filterNot(committed.toSet)
      (committed.filterNot(keep) ++ orphans).foreach { v =>
        val w = Files.walk(versionDir(table, v))
        try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        finally w.close()
      }
    }
}

object SnapshotStore {
  /** One monitor per root path: serializes commit/append/vacuum across ALL
    * store instances in this JVM (the per-instance `synchronized` the file
    * lock replaced could not see a sibling instance on the same root), and
    * prevents OverlappingFileLockException on the pointer lock, whose file
    * lock covers the cross-JVM half of the contract. */
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def rootLock[T](root: String)(body: => T): T = {
    val m = monitors.computeIfAbsent(
      Paths.get(root).toAbsolutePath.normalize.toString, _ => new Object)
    m.synchronized(body)
  }
}
