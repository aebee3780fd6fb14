package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregate over a TWO-TABLE JOIN — the
  * classic incremental-view-maintenance delta algebra, made cheap by the
  * snapshot store's two defining capabilities:
  *
  *   - TIME TRAVEL supplies the old-snapshot term for free. The exact
  *     multiset identity
  *         Δ(L ⋈ R) = ΔL ⋈ R@new  +  L@old ⋈ ΔR
  *     (expand L1⋈R1 − L0⋈R0 = (L1−L0)⋈R1 + L0⋈(R1−R0)) needs L at the
  *     PREVIOUS cut — a classical IVM engine maintains auxiliary state
  *     for it; here `readAt(left, vL0)` is a pinned immutable snapshot
  *     that already exists. Per-refresh cost is O(|ΔL| ⋈ R) + O(L ⋈ |ΔR|)
  *     with the delta side broadcast-size in the common case — never a
  *     full re-join.
  *   - [[SnapshotStore.snapshotAll]] supplies a TRANSACTIONALLY
  *     CONSISTENT (vL1, vR1) cut, so a maintained concept⋈edge view can
  *     never fold half of an `appendAll` ingest or `deleteAll` cascade —
  *     with independent per-table reads, an edge could join a concept
  *     its own transaction had already retired.
  *
  * The maintained shape is `groupBy(key).agg(count, sum(val))` over the
  * inner equi-join, the same (key, n, total) contract as
  * [[MaterializedView]]; signs from both change feeds multiply through
  * the delta terms (an UPDATE's delete+insert image pair retracts and
  * re-adds its exact join contribution). The two-part horizon (vL, vR)
  * rides in commit props exactly like MaterializedView's, so a crash
  * between refreshes can never double-fold.
  *
  * Fallbacks mirror MaterializedView's posture: a rewrite on either
  * source, or a horizon below either source's vacuum line, triggers ONE
  * full recompute at the current cut (reads only current bytes), after
  * which folding resumes. And the same single-maintainer contract: the
  * view table is written only by this maintainer — two concurrent
  * refreshers could commit horizons out of order (last writer wins the
  * pointer), which a crash-REPLAYED refresh cannot do (it reads the
  * committed horizon first; the double-fold spec pins this).
  *
  * Reference analog: the reference recomputes concept↔edge rollups from
  * scratch per epoch (grounding.py:55-68, ontology_scoring.py) — at
  * 100 TB this is the scale-correct replacement for the JOINED rollups
  * a single-table view cannot express.
  */
object JoinMaterializedView {

  /** Commit-props key carrying the two-part horizon as "vL,vR". */
  val HorizonProp = "graft.joinview.up_to_versions"

  /** The maintained view's queryable rows: (key, n, total). */
  def read(store: SnapshotStore, viewTable: String): DataFrame =
    store.read(viewTable)

  /** Source versions the view has folded through (None = never
    * refreshed). */
  def horizon(store: SnapshotStore, viewTable: String): Option[(Long, Long)] =
    store.latestVersion(viewTable).flatMap(horizonAt(store, viewTable, _))

  /** [[horizon]] pinned to an explicit view version — ONE parse of the
    * "vL,vR" wire format, shared by the public face and the guarded
    * refresh (which must derive its horizon from exactly the version its
    * CAS expectation names). */
  private def horizonAt(store: SnapshotStore, viewTable: String,
      v: Long): Option[(Long, Long)] =
    store.commitProps(viewTable, v).get(HorizonProp).map { s =>
      val Array(a, b) = s.split(",", 2)
      (a.trim.toLong, b.trim.toLong)
    }

  /** Fold everything committed past the view's (vL, vR) horizon into the
    * maintained aggregate; returns the new horizon. `keyCol`/`valCol`
    * name columns of the JOINED frame (either side; names must not
    * collide across the sides except the join keys). No-op when neither
    * source moved.
    *
    * SINGLE-MAINTAINER ENFORCED, exactly as [[MaterializedView.refresh]]:
    * the view head is captured once, the horizon derives from that
    * version, and every commit — the fold, the recompute, and the
    * data-less horizon advance — is CAS-conditioned on the head being
    * unmoved ([[SnapshotStore.commitIfHead]] /
    * [[SnapshotStore.commitMaintainerPropsIf]]). A racing refresher
    * loses the CAS and throws
    * [[MaterializedView.ConcurrentMaintainerException]]: exactly one
    * maintainer wins per horizon, folds stay exact. */
  def refresh(store: SnapshotStore, left: String, right: String,
      leftKey: String, rightKey: String, keyCol: String, valCol: String,
      viewTable: String): Option[(Long, Long)] = {
    val cut = store.snapshotAll(Seq(left, right))
    val (vL1, vR1) = (cut(left), cut(right))
    val viewHead = store.latestVersion(viewTable)

    def joined(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, l(leftKey) === r(rightKey), "inner")

    def aggOf(j: DataFrame): DataFrame = j.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(28,4)")).as("total"))

    def raced(): Nothing = throw new MaterializedView.ConcurrentMaintainerException(
      s"join view $viewTable moved past ${viewHead.getOrElse(0L)} during " +
        "refresh — a concurrent maintainer committed; re-run refresh " +
        "from the new horizon")

    def commitView(rows: DataFrame): Option[(Long, Long)] =
      store.commitIfHead(viewTable, rows, viewHead,
        Map(HorizonProp -> s"$vL1,$vR1")) match {
        case Some(_) => Some((vL1, vR1))
        case None => raced()
      }

    def recomputeAtCut(): Option[(Long, Long)] =
      commitView(aggOf(joined(store.readAt(left, vL1),
        store.readAt(right, vR1))))

    // a view head WITHOUT a horizon prop (pre-protocol views) recomputes
    // like a never-refreshed one
    viewHead.flatMap(horizonAt(store, viewTable, _)) match {
      case None => recomputeAtCut()
      case Some((vL0, vR0)) if vL0 == vL1 && vR0 == vR1 =>
        Some((vL0, vR0)) // nothing moved: idempotent no-op
      case Some((vL0, vR0)) =>
        // Rewrites have exact synthesized feed images for the lossless
        // classes, but ONE recompute reads only current bytes and covers
        // every class — MaterializedView's preference, kept here. A
        // horizon at or below either vacuum line also recomputes: the
        // old-snapshot term (readAt at vL0/vR0) and the deltas after it
        // are no longer guaranteed retained.
        //
        // Checked against the HEAD, not just <= the cut: changeFeedSince
        // below constructs the feed over the full current head and only
        // then filters _version <= v1, so a lossy rewrite (or a rewrite
        // whose pre-image was vacuumed) committed AFTER the cut — version
        // > vL1/vR1 — would make the feed CONSTRUCTION throw even though
        // every delta inside the horizon is intact. Recompute at the cut
        // instead: readAt(vL1)/readAt(vR1) are pinned retained snapshots,
        // so the refresh stays exact without waiting for the next cut to
        // self-heal past the rewrite.
        val needRecompute =
          store.nonFeedMutationsSince(left, vL0).nonEmpty ||
          store.nonFeedMutationsSince(right, vR0).nonEmpty ||
          vL0 <= store.vacuumHorizon(left) ||
          vR0 <= store.vacuumHorizon(right)
        if (needRecompute) recomputeAtCut()
        else {
          def signedDelta(table: String, v0: Long, v1: Long): DataFrame =
            store.changeFeedSince(table, v0)
              .where(col("_version") <= v1)
              .withColumn("_sign",
                when(col("_change_type") === "delete", lit(-1L))
                  .otherwise(lit(1L)))
              .drop("_change_type", "_version")
          val dL = signedDelta(left, vL0, vL1)
          val dR = signedDelta(right, vR0, vR1)
          // Δ(L⋈R) = ΔL ⋈ R@new + L@old ⋈ ΔR — term1 carries ΔL's
          // signs, term2 ΔR's; the cross term ΔL⋈ΔR is inside term1
          // (R@new already contains ΔR), which is exactly why term2
          // must use L@OLD, not L@new.
          val term1 = joined(dL, store.readAt(right, vR1))
          val term2 = joined(store.readAt(left, vL0),
            dR.withColumnRenamed("_sign", "_rsign"))
            .withColumn("_sign", col("_rsign"))
          // localCheckpoint: the delta job runs ONCE — the isEmpty probe
          // and the merge both read the materialized blocks
          val delta = term1.select(col(keyCol), col(valCol), col("_sign"))
            .unionByName(term2.select(col(keyCol), col(valCol), col("_sign")))
            .groupBy(col(keyCol))
            .agg(sum(col("_sign")).as("n"),
              sum((col(valCol) * col("_sign")).cast("decimal(28,4)"))
                .as("total"))
            .localCheckpoint(true)
          if (delta.isEmpty) {
            // versions moved but nothing folded (e.g. a compaction on a
            // source): advance the horizon as one DATA-LESS props link —
            // never a full copy of the view's rows. Same CAS condition.
            store.commitMaintainerPropsIf(viewTable,
              Map(HorizonProp -> s"$vL1,$vR1"),
              viewHead.getOrElse(raced())) match {
              case Some(_) => ()
              case None => raced()
            }
            Some((vL1, vR1))
          } else {
            val merged = read(store, viewTable).unionByName(delta)
              .groupBy(col(keyCol))
              .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
              .where(col("n") =!= 0)
            commitView(merged)
          }
        }
    }
  }
}
