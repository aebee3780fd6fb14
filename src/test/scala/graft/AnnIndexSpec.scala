package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore
import graft.similarity.{Ann, AnnIndex}

/** IVF index at rest: persisted cells must answer exactly what the
  * in-memory IVF tier answers, and the cell-probe predicate must prune
  * index FILES through the store's zone maps. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // Four well-separated directions in 8-dim; 60 vectors per cluster with
  // small deterministic jitter on the off-axis coordinates.
  private val dim = 8
  private val centroids: Seq[Seq[Double]] =
    (0 until 4).map(a => Seq.tabulate(dim)(i => if (i == a) 1.0 else 0.0))

  private def corpus() = {
    val rows = for {
      a <- 0 until 4
      j <- 0 until 60
    } yield {
      val id = a * 60 + j
      val v = Seq.tabulate(dim) { i =>
        if (i == a) 1.0 else 0.02 * (((id * 31 + i * 7) % 11) - 5)
      }
      (id.toLong, v)
    }
    rows.toDF("vid", "vec")
  }

  private val query: Seq[Double] =
    Seq.tabulate(dim)(i => if (i == 2) 1.0 else 0.01)

  test("index-at-rest search ≡ in-memory ivfTopK") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)

    val atRest = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 7, nprobe = 1)
      .select(col("vid"), round(col("sim"), 9).as("sim")).collect().toSeq
    val inMem = Ann.ivfTopK(
      Ann.assignCells(corpus().select(col("vid"),
        col("vec").cast("array<double>").as("vec")), "vec", centroids),
      "vid", "vec", centroids, query, k = 7, nprobe = 1)
      .select(col("vid"), round(col("sim"), 9).as("sim")).collect().toSeq
    assert(atRest === inMem)
    // probe cell is the query's own cluster → top hits are cluster-2 ids
    assert(atRest.map(_.getLong(0)).forall(id => id >= 120 && id < 180))
  }

  test("cell probes prune index files via the manifest") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)

    val all = spark.read.format("graft")
      .option("root", root).option("table", "vecs").load()
    val probed = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 7, nprobe = 1)
    val total = scannedFiles(all).size
    assert(total > 1, "clustered build must write multiple files")
    assert(scannedFiles(probed).size < total,
      "probing one cell must skip the other cells' files")
  }

  test("buildTrained: Lloyd-trained index at rest recovers the planted clusters") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.buildTrained(store, "vecs", corpus(), "vid", "vec",
      k = 4, iters = 4, seed = 11L)
    // Probing 1 of 4 trained cells must still surface the query's own
    // cluster (ids 120..179 point along axis 2) — trained centroids land
    // on the planted directions, so recall at nprobe=1 is total here.
    val got = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 7, nprobe = 1).select("vid").as[Long].collect().toSeq
    assert(got.size === 7)
    assert(got.forall(id => id >= 120 && id < 180), s"got $got")
  }

  test("(centroids, cells) pair is atomic: a crashed rebuild cannot skew search") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)
    val before = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 7, nprobe = 1)
      .select(col("vid"), round(col("sim"), 9).as("sim")).collect().toSeq

    // The index version pins the centroids version it was built against.
    val iv = store.latestVersion("vecs").get
    val cv = store.commitProps("vecs", iv)(AnnIndex.CentroidsVersionProp).toLong
    assert(store.latestVersion("vecs_centroids").contains(cv))

    // Simulate a rebuild that crashed AFTER committing new centroids but
    // BEFORE committing the re-assigned cells: latest centroids now
    // disagree with the index. Search must keep serving the old
    // consistent pair via the pinned version — not pair new centroids
    // with old cell assignments.
    val garbage = centroids.map(_.map(-_)) // inverted axes: worst-case skew
    store.commit("vecs_centroids",
      garbage.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid"))
    val after = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 7, nprobe = 1)
      .select(col("vid"), round(col("sim"), 9).as("sim")).collect().toSeq
    assert(after === before,
      "search must resolve centroids from the index version's pinned pairing")
  }

  test("incremental append: new vectors searchable as a chain delta, no rebuild") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)
    // A small batch of fresh cluster-2 vectors (ids 5000+).
    val batch = (0 until 5).map { j =>
      (5000L + j, Seq.tabulate(dim)(i => if (i == 2) 1.0 else 0.001 * j))
    }.toDF("vid", "vec")
    val (nv, rebuilt) = AnnIndex.appendIncremental(store, "vecs", batch, "vid", "vec")
    assert(!rebuilt, "a 5-row delta must not trigger the drift rebuild")
    assert(store.baseOf("vecs", nv).nonEmpty, "the delta is a chain link")
    // Search (nprobe=1 on the query's own cell) must surface the appended
    // ids — the centroids pairing inherited through the chain.
    val got = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 5, nprobe = 1).select("vid").as[Long].collect().toSet
    assert((5000L until 5005L).toSet.subsetOf(got), s"got $got")
  }

  test("drift rebuild: deltas past the fraction retrain and collapse the chain") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)
    val cvBefore = store.resolvedProps("vecs",
      store.latestVersion("vecs").get)(AnnIndex.CentroidsVersionProp).toLong
    // 100 rows on a 240-row base > 25% → rebuild fires on this append.
    val big = (0 until 100).map { j =>
      (9000L + j, Seq.tabulate(dim)(i => if (i == (j % 4)) 1.0 else 0.0))
    }.toDF("vid", "vec")
    val (nv, rebuilt) = AnnIndex.appendIncremental(store, "vecs", big, "vid", "vec")
    assert(rebuilt, "a 100/240 delta must trip the 25% drift guard")
    assert(store.baseOf("vecs", nv).isEmpty, "the rebuild is self-contained")
    val cvAfter = store.resolvedProps("vecs", nv)(AnnIndex.CentroidsVersionProp).toLong
    assert(cvAfter > cvBefore, "the rebuild trains and pins NEW centroids")
    // Everything — original and appended — is searchable post-rebuild.
    val got = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 400, nprobe = 4).count()
    assert(got === 340)
  }

  test("rebuild is a snapshot commit: search follows the latest index") {
    val root = Files.createTempDirectory("annidx").toString
    val store = new SnapshotStore(spark, root)
    AnnIndex.build(store, "vecs", corpus(), "vid", "vec", centroids)
    // Rebuild with the corpus shifted by 1000 ids: results must come from
    // the NEW build only.
    AnnIndex.build(store, "vecs",
      corpus().select((col("vid") + 1000).as("vid"), col("vec")),
      "vid", "vec", centroids)
    val ids = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 5, nprobe = 1).select("vid").as[Long].collect().toSeq
    assert(ids.nonEmpty && ids.forall(_ >= 1000))
  }
}
