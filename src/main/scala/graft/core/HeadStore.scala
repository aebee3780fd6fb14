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
  * MULTI-TABLE transactions additionally need mutual exclusion across
  * the tables' publish windows (validate → intent → stamp+put per
  * table): a single-table conditional put slipping between a txn's
  * validation and its puts would orphan one side or the other. The
  * POSIX deployment gets that exclusion from the pointer file locks;
  * conditional backends get it from the trait's LEASE surface —
  * [[tryLease]]/[[unlease]] grant a TTL'd per-table publish lease, and
  * [[compareAndPut]] arbitrates puts against it in the SAME atomic
  * conditional write (one-item condition expression: exactly what a
  * DynamoDB lock-client row or a lease field in the pointer object
  * gives a real deployment). A put by anyone else while a live lease is
  * held FAILS (the caller backs off and retries — the head did not
  * move); the holder's own puts carry its owner id and pass. Expired
  * leases are broken by the next acquirer, and the broken owner is
  * FENCED: its later puts fail permanently on that key, so a paused
  * holder resuming after takeover can never corrupt the head
  * (fencing-token discipline; the crashed txn's `_txn/` intent is the
  * roll-forward point that completes its cascade). */
trait HeadStore {

  /** Current head of `root`/`table`, with the backend's conditional
    * token riding along (None = no pointer yet). */
  def read(root: String, table: String): Option[HeadStore.Head]

  /** Publish `next` as the head IFF the current head still equals
    * `expected` (None = create-if-absent) AND no OTHER owner's live
    * lease covers the table (`owner` is the caller's lease identity;
    * None = un-leased single-table committer). Returns whether this
    * call won. MUST be atomic with respect to concurrent calls when
    * [[conditional]] is true; the POSIX impl instead relies on the
    * caller's pointer lock and merely re-checks. */
  def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long,
      owner: Option[String]): Boolean

  /** Un-leased form — the single-table committer's put. */
  final def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long): Boolean =
    compareAndPut(root, table, expected, next, None)

  /** Whether [[compareAndPut]] ALONE arbitrates concurrent committers (a
    * true conditional put). False for POSIX rename — the store then
    * wraps the read→put window in its pointer lock; true lets the store
    * run the head swap lock-free and routes multi-table exclusion
    * through the lease surface instead of file locks. */
  def conditional: Boolean

  /** Acquire or renew the table's publish lease for `owner` with the
    * given TTL. True when held after the call. An expired foreign lease
    * is BROKEN (taken over) and its owner fenced; a live foreign lease
    * returns false — the caller backs off and retries. POSIX default:
    * always true (the pointer file locks are the exclusion). */
  def tryLease(root: String, table: String, owner: String,
      ttlMs: Long): Boolean = true

  /** Release `owner`'s lease if it still holds one (no-op otherwise,
    * including after a takeover — the usurper's lease is not touched). */
  def unlease(root: String, table: String, owner: String): Unit = ()

  /** Forget the table's head entirely — dropTable's half of the
    * contract. POSIX: the pointer file (it dies with the tree anyway);
    * conditional backends: the pointer object/row, which SURVIVES a
    * directory-tree delete and would otherwise keep reporting a head
    * for a dropped table. */
  def delete(root: String, table: String): Unit

  /** Remove the head VALUE while PRESERVING lease/fence state —
    * dropTable's mid-flight step. [[delete]] would retire the lease
    * with the entry, and dropTable's exclusion on a conditional backend
    * IS that lease: deleting it first would let a racing lock-free
    * committer recreate the head while the tree is still being torn
    * down. clearHead makes the pointer stop resolving (a crash mid-drop
    * leaves no ghost head — only an unreferenced tree) without opening
    * the window; [[delete]] runs as the drop's LAST step. POSIX default
    * delegates to [[delete]]: the file is the whole value and the
    * pointer file lock is the exclusion there. */
  def clearHead(root: String, table: String): Unit = delete(root, table)
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
  * even so. Leases are no-ops: the file locks are the exclusion. */
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
      expected: Option[HeadStore.Head], next: Long,
      owner: Option[String]): Boolean = {
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

  override def delete(root: String, table: String): Unit =
    Files.deleteIfExists(pointer(root, table))
}

/** In-memory OBJECT-STORE head reference: no rename, no lock — a
  * put-if-match on a per-key generation counter inside one atomic
  * compute is the entire arbitration, exactly the shape S3 `If-Match` /
  * GCS `ifGenerationMatch` / DynamoDB conditional writes provide. The
  * LEASE state rides the same per-key entry, so the lease check and
  * the tag check land in ONE conditional write (a DynamoDB condition
  * expression over one item — no cross-key atomicity is assumed
  * anywhere). Process-wide state (companion map) so every SnapshotStore
  * instance in the JVM sees one consistent head namespace, like a real
  * bucket. */
final class MockObjectHeadStore extends HeadStore {
  import MockObjectHeadStore._
  override def conditional: Boolean = true

  override def read(root: String, table: String): Option[HeadStore.Head] =
    Option(objects.get((root, table))).flatMap(_.head).map {
      case (v, gen) => HeadStore.Head(v, gen)
    }

  override def compareAndPut(root: String, table: String,
      expected: Option[HeadStore.Head], next: Long,
      owner: Option[String]): Boolean = {
    val key = (root, table)
    val now = System.currentTimeMillis()
    var won = false
    objects.compute(key, (_, cur0) => {
      val cur = Option(cur0).getOrElse(Entry(None, None, Set.empty))
      // a fenced owner lost its lease to a takeover: its puts fail
      // FOREVER on this key (fencing-token discipline — a paused holder
      // resuming after its TTL can never move the head)
      val fenced = owner.exists(cur.fenced.contains)
      // a LIVE lease blocks every put but the holder's own
      val leaseBlocked = cur.lease.exists { case (o, until) =>
        until > now && !owner.contains(o)
      }
      val tagMatches = (cur.head, expected) match {
        case (None, None) => true
        case (Some((_, gen)), Some(h)) => gen == h.tag
        case _ => false
      }
      if (!fenced && !leaseBlocked && tagMatches) {
        won = true
        cur.copy(head = Some((next, generations.incrementAndGet())))
      } else cur0
    })
    won
  }

  override def tryLease(root: String, table: String, owner: String,
      ttlMs: Long): Boolean = {
    val key = (root, table)
    val now = System.currentTimeMillis()
    var held = false
    objects.compute(key, (_, cur0) => {
      val cur = Option(cur0).getOrElse(Entry(None, None, Set.empty))
      cur.lease match {
        case Some((o, until)) if until > now && o != owner => cur0 // foreign live
        case Some((o, _)) if o == owner => // own (live or expired): renew
          held = true; cur.copy(lease = Some((owner, now + ttlMs)))
        case other => // absent or expired-foreign: take over, fence the loser
          held = true
          val fenced = other.fold(cur.fenced) { case (o, _) => cur.fenced + o }
          cur.copy(lease = Some((owner, now + ttlMs)), fenced = fenced)
      }
    })
    held
  }

  override def unlease(root: String, table: String, owner: String): Unit = {
    objects.computeIfPresent((root, table), (_, cur) =>
      if (cur.lease.exists(_._1 == owner)) cur.copy(lease = None) else cur)
    ()
  }

  override def delete(root: String, table: String): Unit = {
    objects.remove((root, table)); ()
  }

  override def clearHead(root: String, table: String): Unit = {
    objects.computeIfPresent((root, table), (_, cur) => cur.copy(head = None))
    ()
  }
}

object MockObjectHeadStore {
  /** One pointer object: the head (version, generation), the publish
    * lease, and the fenced former holders. */
  private final case class Entry(head: Option[(Long, Long)],
      lease: Option[(String, Long)], fenced: Set[String])

  private val objects =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]()
  private val generations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test hygiene: forget every head under `root`. */
  def clear(root: String): Unit =
    objects.keySet.removeIf(_._1 == root)
}
