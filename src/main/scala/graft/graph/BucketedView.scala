package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.SnapshotStore

/** Generic INCREMENTALLY-MAINTAINED bucketed view — the machinery behind
  * [[AdjacencyStore]] with the row transform pluggable, so ANY bucketed
  * derivation of an append-mostly chain can stay fresh under ingest:
  * q117's (node, o, i) adjacency rows, q115's dst-bucketed edge
  * projection, a bucketed feature extraction — one refresh contract.
  *
  * CONTRACT on `rowTransform` (the caller's proof obligation, stated
  * loudly because nothing here can check it): it must DISTRIBUTE OVER
  * UNION — transform(a ∪ b) ≡ transform(a) ∪ transform(b) — which is
  * exactly the per-row maps / flatMaps / projections / filters class.
  * An aggregation, dedup, or window does NOT qualify: folding its
  * transform of the delta would double-count across batches (that class
  * belongs to [[graft.core.MaterializedView]], which folds ALGEBRAIC
  * state instead of rows).
  *
  * Mechanics (shared with the adjacency instance): the view's source
  * horizon — the source-chain version folded up to, inclusive — is
  * pinned in the view's OWN commit props, atomically with each link.
  * Deltas land via [[SnapshotStore.appendBucketedIfHead]], a CONDITIONAL
  * append, so two racing maintainers can never fold the same source
  * delta twice: the loser re-reads the advanced horizon and re-derives.
  * The incremental path folds the INSERT-ONLY feed and is taken only
  * when every source version past the horizon is an append — a
  * delete/update version doesn't break feed REACH (its removed rows live
  * in `_changes_removed`, which the insert feed rightly omits), it
  * breaks feed SUFFICIENCY, so it is detected from version metadata
  * alone and triggers an exact whole rebuild, conditioned on the view
  * head. The store's sorted-run auto-fold keeps the view's chain under
  * the merge fan-in cap, and the layout-preserving compact inherits the
  * horizon prop, so maintenance and folding compose. */
object BucketedView {

  /** Default horizon prop; instances may pin their own key (the
    * adjacency view predates this generalization and keeps
    * `graft.adjview.horizon`). */
  val HorizonProp = "graft.view.horizon"

  def refresh(store: SnapshotStore, srcTable: String, viewTable: String,
      rowTransform: DataFrame => DataFrame,
      bucketBy: Seq[String], dims: Seq[Int],
      horizonProp: String = HorizonProp, maxRetries: Int = 8): Long = {
    val srcHead = store.latestVersion(srcTable).getOrElse(
      throw new IllegalArgumentException(s"no committed version of $srcTable"))
    var attempt = 0
    while (true) {
      attempt += 1
      store.latestVersion(viewTable) match {
        case None =>
          // initial build: the full snapshot's transform, layout claim
          // and horizon pinned ATOMICALLY with the content (conditioned
          // on the table still being absent — a racing initializer loses
          // the CAS and loops into the incremental branch)
          store.commitIfHeadBucketed(viewTable,
            rowTransform(store.readAt(srcTable, srcHead)),
            bucketBy, dims, None,
            Map(horizonProp -> srcHead.toString)) match {
            case Some(v) => return v
            case None => () // a sibling initialized first: loop re-reads
          }
        case Some(v) =>
          val from = store.resolvedProps(viewTable, v).get(horizonProp)
            .map(_.toLong).getOrElse(
              throw new IllegalStateException(
                s"$viewTable carries no $horizonProp — not a maintained view"))
          if (from >= srcHead) return v
          else {
            // insert-only feed SUFFICIENCY, from version metadata alone
            val appendOnly =
              store.nonFeedMutationsSince(srcTable, from).isEmpty &&
                !store.history(srcTable).filter(_ > from)
                  .exists(w => store.hasRemovedRows(srcTable, w))
            val delta =
              if (!appendOnly) None // non-append mutation: rebuild
              else try Some(store.changesSince(srcTable, from)
                .where(col("_version") <= srcHead)
                .drop("_version"))
              catch { case _: Exception => None } // feed unreachable: rebuild
            delta match {
              case Some(d) =>
                store.appendBucketedIfHead(viewTable, rowTransform(d),
                  bucketBy, dims, Some(v),
                  Map(horizonProp -> srcHead.toString)) match {
                  case Some(nv) => return nv
                  case None => () // lost to a sibling maintainer: re-derive
                }
              case None =>
                // rewritten/deleted past feed sufficiency or reach:
                // rebuild whole, conditioned on the view head we read
                store.commitIfHeadBucketed(viewTable,
                  rowTransform(store.readAt(srcTable, srcHead)),
                  bucketBy, dims, Some(v),
                  Map(horizonProp -> srcHead.toString)) match {
                  case Some(nv) => return nv
                  case None => ()
                }
            }
          }
      }
      if (attempt >= maxRetries) throw new IllegalStateException(
        s"BucketedView.refresh($viewTable) lost the view-head race " +
          s"$maxRetries times — maintainers are hot; retry later")
    }
    throw new IllegalStateException("unreachable")
  }
}
