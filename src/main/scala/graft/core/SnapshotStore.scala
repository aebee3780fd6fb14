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
    * The version directory is fully written before the pointer moves
    * (write-then-rename), so readers never observe a partial version.
    * `overwrite` on the version dir makes a retry after a mid-write crash
    * succeed: an orphan partial directory (pointer never moved) is simply
    * replaced — committed versions are never targeted because the pointer
    * only advances. */
  def commit(table: String, df: DataFrame): Long = synchronized {
    val next = latestVersion(table).getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(versionDir(table, next).toString)
    val tmp = pointer(table).resolveSibling("_latest.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Append rows as a new version (union with the current snapshot).
    * Synchronized so the base resolution and the commit are one atomic
    * step — two concurrent appends must not both base off the same
    * version and silently drop one batch. */
  def append(table: String, rows: DataFrame): Long = synchronized {
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

  /** Time travel: read a specific version. */
  def readAt(table: String, version: Long): DataFrame =
    spark.read.parquet(versionDir(table, version).toString)

  /** All COMMITTED versions, ascending: directory entries at or below the
    * pointer (an orphan directory from a failed commit is above the
    * pointer and is not history). */
  def history(table: String): Seq[Long] = latestVersion(table) match {
    case None => Seq.empty
    case Some(latest) =>
      val d = tableDir(table)
      if (!Files.exists(d)) Seq.empty
      else {
        val s = Files.list(d)
        try s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
          .filter(_ <= latest)
          .toSeq.sorted
        finally s.close()
      }
  }

  /** Drop committed versions older than the newest `keepLast`; the
    * pointer's version is always kept (keep set is derived from committed
    * history, never from stray directories). */
  def vacuum(table: String, keepLast: Int = 1): Unit = synchronized {
    val committed = history(table)
    val keep = committed.takeRight(math.max(keepLast, 1)).toSet ++
      latestVersion(table)
    committed.filterNot(keep).foreach { v =>
      val w = Files.walk(versionDir(table, v))
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }
}
