package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore

/** Incrementally-maintained ADJACENCY layout — the piece that keeps the
  * graph-store twins (q117's node-bucketed degree table; by the same
  * mechanics q115's dst-bucketed edge store) fresh as ingest batches
  * land, instead of being built once from a static snapshot (the r18
  * gap). Reference analog: the accelerator keeps its adjacency lists
  * warm by consuming the epoch feed (graph-accel/core/src/graph.rs:77-140
  * plus its invalidation hooks); here the layout is a bucketed store
  * TABLE maintained from the edges chain's own change feed.
  *
  * Mechanics: the view table holds one (node, o, i) row per edge
  * endpoint, bucketed on `node` — so degree-class aggregations plan
  * ZERO-exchange (partial sums per bucket). Each [[refresh]] reads the
  * edges chain's CHANGES past the view's recorded horizon
  * (`graft.adjview.horizon`, committed atomically with each view link),
  * transforms the delta, and lands it with
  * [[SnapshotStore.appendBucketedIfHead]] — a CONDITIONAL append, so two
  * racing maintainers can never fold the same source delta twice: the
  * loser re-reads the advanced horizon and re-derives (MaterializedView's
  * OCC contract, on a bucketed chain). The store's sorted-run auto-fold
  * keeps the chain under the merge fan-in cap, and the layout-preserving
  * compact INHERITS the horizon prop, so maintenance and folding compose.
  *
  * APPEND-ONLY contract, stated loudly: the maintenance consumes the
  * batch feed (appended edges). A delete/rewrite on the edges chain
  * breaks feed reach and [[refresh]] REBUILDS the view from the snapshot
  * — correct, just O(table); the reference's accelerator invalidates and
  * reloads on the same events. */
object AdjacencyStore {

  /** The view's source horizon: the edges-chain version this view version
    * has folded up to (inclusive). Chain-inherited like every prop. */
  val HorizonProp = "graft.adjview.horizon"

  private def adjRows(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame =
    edges.select(col(srcCol).as("node"), lit(1L).as("o"), lit(0L).as("i"))
      .unionByName(edges.select(col(dstCol).as("node"), lit(0L).as("o"),
        lit(1L).as("i")))

  /** Fold everything the edges chain committed past the view's horizon
    * into the bucketed adjacency view; returns the view version holding
    * the new horizon (the current head when already fresh). First call
    * builds the view whole. */
  def refresh(store: SnapshotStore, edgesTable: String, viewTable: String,
      srcCol: String = "src", dstCol: String = "dst",
      buckets: Int = 32, maxRetries: Int = 8): Long = {
    val srcHead = store.latestVersion(edgesTable).getOrElse(
      throw new IllegalArgumentException(s"no committed version of $edgesTable"))
    var attempt = 0
    while (true) {
      attempt += 1
      store.latestVersion(viewTable) match {
        case None =>
          // initial build: the full snapshot's adjacency, layout claim
          // and horizon pinned ATOMICALLY with the content (conditioned
          // on the table still being absent — a racing initializer loses
          // the CAS and loops into the incremental branch)
          store.commitIfHeadBucketed(viewTable,
            adjRows(store.readAt(edgesTable, srcHead), srcCol, dstCol),
            Seq("node"), Seq(buckets), None,
            Map(HorizonProp -> srcHead.toString)) match {
            case Some(v) => return v
            case None => () // a sibling initialized first: loop re-reads
          }
        case Some(v) =>
          val from = store.resolvedProps(viewTable, v).get(HorizonProp)
            .map(_.toLong).getOrElse(
              throw new IllegalStateException(
                s"$viewTable carries no $HorizonProp — not an adjacency view"))
          if (from >= srcHead) return v
          else {
            // The incremental path folds the INSERT-ONLY feed — valid
            // only when every source version past the horizon is an
            // append. A delete/update version doesn't break feed REACH
            // (its removed rows live in `_changes_removed`, which
            // changesSince rightly omits), it breaks feed SUFFICIENCY:
            // folding just the inserts would leave phantom endpoints in
            // the view. Detected from version metadata alone — no scan.
            val appendOnly =
              store.nonFeedMutationsSince(edgesTable, from).isEmpty &&
                !store.history(edgesTable).filter(_ > from)
                  .exists(w => store.hasRemovedRows(edgesTable, w))
            val delta =
              if (!appendOnly) None // non-append mutation: rebuild
              else try Some(store.changesSince(edgesTable, from)
                .where(col("_version") <= srcHead)
                .drop("_version"))
              catch { case _: Exception => None } // feed unreachable: rebuild
            delta match {
              case Some(d) =>
                store.appendBucketedIfHead(viewTable,
                  adjRows(d, srcCol, dstCol),
                  Seq("node"), Seq(buckets), Some(v),
                  Map(HorizonProp -> srcHead.toString)) match {
                  case Some(nv) => return nv
                  case None => () // lost to a sibling maintainer: re-derive
                }
              case None =>
                // the edges chain was rewritten/compacted past feed reach:
                // rebuild whole, conditioned on the view head we read
                store.commitIfHeadBucketed(viewTable,
                  adjRows(store.readAt(edgesTable, srcHead), srcCol, dstCol),
                  Seq("node"), Seq(buckets), Some(v),
                  Map(HorizonProp -> srcHead.toString)) match {
                  case Some(nv) => return nv
                  case None => ()
                }
            }
          }
      }
      if (attempt >= maxRetries) throw new IllegalStateException(
        s"AdjacencyStore.refresh($viewTable) lost the view-head race " +
          s"$maxRetries times — maintainers are hot; retry later")
    }
    throw new IllegalStateException("unreachable")
  }
}
