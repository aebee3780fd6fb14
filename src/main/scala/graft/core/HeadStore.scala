package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The table-HEAD pointer's storage protocol — the one store primitive
  * whose atomicity the whole OCC commit protocol rides on.
  *
  * The default deployment ([[PosixHeadStore]]) publishes heads by POSIX
  * atomic rename under the store's cross-process pointer lock — correct
  * on a local/NFS-class filesystem, unavailable on S3-class object
  * stores (no rename, no lock). There the pointer object needs a
  * CONDITIONAL PUT (put-if-match on a version tag / etag — S3's
  * `If-Match`, GCS's generation precondition, or a DynamoDB conditional
  * write): [[MockObjectHeadStore]] is the in-memory reference of that
  * protocol, and the store's `casAdvance` runs it LOCK-FREE — both
  * racers stamp their candidate, the conditional put picks exactly one
  * winner, the loser unstamps and rebases. The fuzz suite races
  * committers through the mock to pin zero-lost-commit linearizability.
  *
  * Scope note: the head swap is the only primitive abstracted here. The
  * multi-table transaction intents (`_txn/`) additionally need mutual
  * exclusion, which the POSIX deployment gets from the pointer file
  * lock; an object-store deployment pairs this trait with a lock
  * service (DynamoDB-style) for those, or runs single-writer. */
trait HeadStore {

  /** Current head of `root`/`table`, with the backend's conditional
    * token riding along (None = no pointer yet). */
  def read(root: String, table: String): Option[HeadStore.Head]

  /** Publish `next` as the head IFF the current head still equals
    * `expected` (None = create-if-absent). Returns whether this call
    * won. MUST be atomic with respect to concurrent calls when
    * [[conditional]] is true; the POSIX impl instead relies on the
    * caller's pointer lock and merely re-checks. */
  def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long): Boolean

  /** Whether [[compareAndPut]] ALONE arbitrates concurrent committers (a
    * true conditional put). False for POSIX rename — the store then
    * wraps the read→put window in its pointer lock; true lets the store
    * run the head swap lock-free. */
  def conditional: Boolean
}

object HeadStore {
  /** A head observation: the version and the token [[HeadStore.compareAndPut]]
    * conditions on (etag/generation; the version itself for POSIX). */
  final case class Head(version: Long, tag: Long)
}

/** Pointer-file head store: `<root>/<table>/_latest`, published by temp
  * write + atomic rename. `compareAndPut` is NOT self-arbitrating
  * (rename is unconditional) — callers hold the store's pointer lock,
  * and the re-read inside the put keeps the conditional CONTRACT honest
  * even so. */
final class PosixHeadStore extends HeadStore {
  override def conditional: Boolean = false

  private def pointer(root: String, table: String) =
    Paths.get(root, table, "_latest")

  override def read(root: String, table: String): Option[HeadStore.Head] = {
    val p = pointer(root, table)
    if (Files.exists(p)) {
      val v = Files.readString(p).trim.toLong
      Some(HeadStore.Head(v, v))
    } else None
  }

  override def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long): Boolean = {
    if (read(root, table).map(_.version) != expected.map(_.version)) false
    else {
      val p = pointer(root, table)
      val tmp = p.resolveSibling(s"_latest.$next.tmp")
      Files.writeString(tmp, next.toString)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      true
    }
  }
}

/** In-memory OBJECT-STORE head reference: no rename, no lock — a
  * put-if-match on a per-key generation counter inside one atomic
  * compute is the entire arbitration, exactly the shape S3 `If-Match` /
  * GCS `ifGenerationMatch` / DynamoDB conditional writes provide.
  * Process-wide state (companion map) so every SnapshotStore instance
  * in the JVM sees one consistent head namespace, like a real bucket. */
final class MockObjectHeadStore extends HeadStore {
  import MockObjectHeadStore._
  override def conditional: Boolean = true

  override def read(root: String, table: String): Option[HeadStore.Head] =
    Option(objects.get((root, table))).map { case (v, gen) =>
      HeadStore.Head(v, gen)
    }

  override def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long): Boolean = {
    val key = (root, table)
    var won = false
    objects.compute(key, (_, cur) => {
      val matches = (Option(cur), expected) match {
        case (None, None) => true
        case (Some((_, gen)), Some(h)) => gen == h.tag
        case _ => false
      }
      if (matches) { won = true; (next, generations.incrementAndGet()) }
      else cur
    })
    won
  }
}

object MockObjectHeadStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Long)]()
  private val generations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test hygiene: forget every head under `root`. */
  def clear(root: String): Unit =
    objects.keySet.removeIf(_._1 == root)
}
