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
  * ZERO-exchange (partial sums per bucket). The refresh protocol
  * (horizon pinned in the view's own props, conditional bucketed
  * appends, metadata-detected rebuilds) is [[BucketedView]]'s — this
  * object is its adjacency INSTANCE, with the per-endpoint explode as
  * the row transform.
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

  // distributes over union (projection + unionByName of projections) —
  // the [[BucketedView]] rowTransform contract
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
      buckets: Int = 32, maxRetries: Int = 8): Long =
    BucketedView.refresh(store, edgesTable, viewTable,
      adjRows(_, srcCol, dstCol), Seq("node"), Seq(buckets),
      horizonProp = HorizonProp, maxRetries = maxRetries)
}
