package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore

/** IVF index AT REST: [[Ann.ivfTopK]]'s inverted-file layout persisted
  * into the snapshot store so the cell-probe predicate prunes FILES, not
  * just rows (reference V1 is a client-side full scan,
  * api/app/lib/age_client/query.py:35-119 — fine at 10³ vectors; this is
  * the 10¹⁰ shape).
  *
  * `build` assigns every vector to its nearest centroid and commits the
  * table CLUSTERED BY `cell` (range-partition + sort), so each written
  * file covers a narrow band of cell ids and its `_stats.json` zone map
  * pins cell ∈ [min, max]. `search` turns the query into a
  * `cell IN (probes)` predicate; the connector's manifest-backed
  * FileIndex then drops every non-covering file before any listing or
  * footer I/O — with C cells and nprobe probes, the scan reads
  * ~nprobe/C of the index bytes, and the rest of the query is the exact
  * [[Ann.bruteForceTopK]] kernel over the survivors.
  *
  * Centroids persist beside the index as `<table>_centroids` — O(C·d)
  * rows, read driver-side at query time exactly like the query-vector
  * literal (an index-metadata lookup, never a data scan). The PAIRING is
  * atomic: the centroids table commits first, and its version number is
  * pinned INSIDE the index commit as a commit property
  * (`centroids_version` in `_props.json`, written with the version
  * directory itself) — so `search` resolves ONE index version and reads
  * exactly the centroids that version was built against. A crash between
  * the two commits, or a rebuild racing a search, leaves the index
  * pointer on the old version whose property still names the old
  * centroids — never a new-centroids/old-cells mismatch. Rebuilds are
  * snapshot commits: readers pinned to the old version keep a consistent
  * (centroids, cells) pair, `VERSION AS OF` time-travels the index, and
  * vacuum reclaims superseded builds.
  */
object AnnIndex {

  /** The property key pairing an index version with its centroids version. */
  val CentroidsVersionProp = "centroids_version"

  /** Build (or rebuild) the index: one pass to assign cells, one
    * clustered write. `partitions` pins the index file count (default one
    * file band per centroid — the layout where `cell IN (...)` prunes to
    * exactly the probed cells; an explicit count also opts the range
    * shuffle out of AQE coalescing, which would otherwise collapse a
    * small build into one unprunable file). Returns the committed index
    * version. */
  def build(store: SnapshotStore, table: String, vectors: DataFrame,
      idCol: String, vecCol: String, centroids: Seq[Seq[Double]],
      partitions: Int = 0): Long = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // Payload columns ride along (label, text, …): the index IS the table,
    // clustered — not a sidecar needing a join-back at query time.
    val assigned = Ann.assignCells(
      vectors.withColumn(vecCol, col(vecCol).cast("array<double>")),
      vecCol, centroids)
    // Centroids first; the index commit then pins THIS version by number.
    // Publication order makes the pair atomic: an index version is only
    // visible once its directory (property included) is complete, and the
    // centroids version it names is already committed by then.
    val cv = store.commit(s"${table}_centroids",
      centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("cell", "centroid"))
    store.commitClustered(table, assigned, clusterBy = Seq("cell"),
      targetPartitions = if (partitions > 0) partitions else centroids.size,
      props = Map(CentroidsVersionProp -> cv.toString))
  }

  /** [[build]] with centroids TRAINED on the corpus ([[Ann.trainCentroids]],
    * seeded Lloyd over the cosine metric the probes use) instead of
    * caller-supplied — the production path: first-k "centroids" leave cell
    * populations arbitrary, trained ones make cells compact so a given
    * nprobe buys real recall (AnnSpec pins ≥0.9 @ nprobe=2 on a
    * planted-cluster corpus). */
  def buildTrained(store: SnapshotStore, table: String, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int = 5,
      seed: Long = 42L, partitions: Int = 0): Long = {
    val cents = Ann.trainCentroids(vectors, vecCol, k, iters, seed)
    build(store, table, vectors, idCol, vecCol, cents, partitions)
  }

  /** INCREMENTAL maintenance — the streaming twin of [[build]]: assign the
    * new vectors against the index's pinned centroids and append them as a
    * cell-clustered chain-link delta (O(batch) written, never a corpus
    * rewrite; the delta's files are themselves zone-map-prunable on
    * `cell`, so probes skip inside every append too). The centroids
    * pairing rides [[SnapshotStore.resolvedProps]] chain inheritance, so
    * search stays consistent across any number of appends.
    *
    * DRIFT GUARD: centroids trained on the original corpus slowly mismatch
    * a shifting stream — cells bloat and recall decays. When the chained
    * deltas exceed `rebuildFraction` of the base's rows (manifest row
    * counts — a metadata check, no scan), the index is RETRAINED and
    * rebuilt from the full table: one snapshot commit, readers pinned to
    * the old version never skew. Returns the committed version and whether
    * this append triggered the rebuild. */
  def appendIncremental(store: SnapshotStore, table: String,
      vectors: DataFrame, idCol: String, vecCol: String,
      rebuildFraction: Double = 0.25, iters: Int = 3,
      seed: Long = 42L): (Long, Boolean) = {
    val spark = vectors.sparkSession
    val (iv, _) = store.resolveVersionPaths(table, None)
    val cv = store.resolvedProps(table, iv)(CentroidsVersionProp).toLong
    val centroids = store.readAt(s"${table}_centroids", cv)
      .orderBy(col("cell")).collect()
      .map(r => r.getSeq[Double](1).toSeq).toSeq
    val assigned = Ann.assignCells(
      vectors.withColumn(vecCol, col(vecCol).cast("array<double>")),
      vecCol, centroids)
    val nv = store.appendClustered(table, assigned, clusterBy = Seq("cell"))

    // Drift check from the manifests of the new version's chain: rows in
    // the self-contained root vs rows in the appended links.
    val (_, dirs) = store.resolveVersionPaths(table, Some(nv))
    val rowsOf: Seq[Long] = dirs.map { d =>
      val v = d.getFileName.toString.stripPrefix("v=").toLong
      store.fileStats(table, v).map(_.values.map(_.rows).sum).getOrElse(0L)
    }
    val baseRows = rowsOf.headOption.getOrElse(0L)
    val deltaRows = rowsOf.drop(1).sum
    if (baseRows > 0L && deltaRows.toDouble / baseRows > rebuildFraction) {
      val snapshot = store.readAt(table, nv).drop("cell")
      buildTrained(store, table, snapshot, idCol, vecCol,
        k = centroids.size, iters = iters, seed = seed)
      (store.latestVersion(table).get, true)
    } else (nv, false)
  }

  /** Probe the `nprobe` nearest cells through the graft connector; exact
    * cosine top-k over the surviving files. Resolves the index version
    * ONCE, then reads both the centroids (via the version's pinned
    * `centroids_version` property) and the cells (via `VERSION AS OF` the
    * same number) from that single consistent snapshot — a concurrent
    * rebuild can commit freely mid-search without skewing the pair.
    * Pre-property index versions (no pinned pairing) fall back to the
    * latest centroids. */
  def search(spark: SparkSession, root: String, table: String,
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      nprobe: Int, threshold: Double = -1.0): DataFrame = {
    val store = new SnapshotStore(spark, root)
    val (iv, _) = store.resolveVersionPaths(table, None)
    val centroidsDf = store.resolvedProps(table, iv)
      .get(CentroidsVersionProp).map(_.toLong) match {
        case Some(cv) => store.readAt(s"${table}_centroids", cv)
        case None => store.read(s"${table}_centroids")
      }
    val centroids = centroidsDf
      .orderBy(col("cell"))
      .collect() // C rows of index metadata — bounded, driver-side by design
      .map(r => r.getSeq[Double](1).toSeq).toSeq
    val probes = Ann.nearestCells(centroids, query, nprobe)
    val cells = spark.read.format("graft")
      .option("root", root).option("table", table)
      .option("version", iv.toString)
      .load()
      .where(col("cell").isin(probes: _*))
    Ann.bruteForceTopK(cells, idCol, vecCol, query, k, threshold)
  }
}
