package graft

import java.nio.file.{Files, Path}
import graft.core.{Catalog, IncrementalCatalog, SnapshotStore}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Incremental catalog maintenance (VERDICT r7 item #3): an epoch advance
  * folds ONLY the source change sets into the maintained tree —
  * `_changes` dirs are read, the source snapshots are not — and the
  * result is row-identical to [[Catalog]]'s full recompute. */
class IncrementalCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): (SnapshotStore, IncrementalCatalog, String) = {
    val root = Files.createTempDirectory("graft-inc-catalog").toString
    val store = new SnapshotStore(spark, root)
    // batch 1 — the CatalogSpec graph: O1←s1←d1←{c1,c2}; O2←s2←d2←{c3};
    // d3 sourceless, c4 orphan, one semantic edge that must not leak
    store.append("ontologies", Seq(("O1", "ont one"), ("O2", "ont two"))
      .toDF("ontology_id", "name"))
    store.append("documents", Seq(("d1", "doc one"), ("d2", "doc two"),
      ("d3", null)).toDF("document_id", "name"))
    store.append("concepts", Seq(("c1", "alpha"), ("c2", "beta"),
      ("c3", "gamma"), ("c4", "orphan")).toDF("concept_id", "label"))
    store.append("edges", Seq(
      ("s1", "O1", "SCOPED_BY"), ("s2", "O2", "SCOPED_BY"),
      ("d1", "s1", "HAS_SOURCE"), ("d2", "s2", "HAS_SOURCE"),
      ("d3", "s3", "HAS_SOURCE"),
      ("c1", "s1", "APPEARS"), ("c2", "s1", "APPEARS"), ("c3", "s2", "APPEARS"),
      ("c1", "c2", "SUPPORTS")).toDF("src", "dst", "rel_type"))
    (store, new IncrementalCatalog(spark, store), root)
  }

  // batch 2 exercises all delta-join terms: d4→s1 (ΔH ⋈ old S — and d4
  // inherits s1's existing concepts c1/c2 via old A ⋈ ΔH),
  // s4→O1 + d5→s4 (ΔH ⋈ ΔS), c5→s2 (ΔA ⋈ old H), plus a replayed edge
  // that must fold to zero
  private def appendBatch2(store: SnapshotStore): Unit = {
    store.append("documents", Seq(("d4", "doc four"), ("d5", "doc five"))
      .toDF("document_id", "name"))
    store.append("concepts", Seq(("c5", "delta")).toDF("concept_id", "label"))
    store.append("edges", Seq(
      ("d4", "s1", "HAS_SOURCE"),
      ("s4", "O1", "SCOPED_BY"), ("d5", "s4", "HAS_SOURCE"),
      ("c5", "s2", "APPEARS"),
      ("c1", "s1", "APPEARS") // replay of a batch-1 infra edge
    ).toDF("src", "dst", "rel_type"))
  }

  private def asEdgeSet(df: DataFrame) =
    df.select("parent_kind", "parent_id", "child_kind", "child_id", "graph_epoch")
      .as[(String, String, String, String, Long)].collect().toSet
  private def asNodeSet(df: DataFrame) =
    df.select("kind", "node_id", "name", "name_lower", "child_count", "graph_epoch")
      .as[(String, String, String, String, Long, Long)].collect().toSet

  private def fullRecompute(store: SnapshotStore, epoch: Long) = (
    asEdgeSet(Catalog.projectEdges(store.read("edges"), epoch)),
    asNodeSet(Catalog.projectNodes(store.read("ontologies"),
      store.read("documents"), store.read("concepts"),
      store.read("edges"), epoch)))

  test("incremental fold equals the full recompute across two epochs") {
    val (store, inc, _) = fixture()
    assert(inc.refresh("edges", "ontologies", "documents", "concepts") == 5L)
    val (fe1, fn1) = fullRecompute(store, 1L)
    assert(asEdgeSet(inc.edges(1L)) == fe1)
    assert(asNodeSet(inc.nodes(1L)) == fn1)

    appendBatch2(store)
    assert(inc.refresh("edges", "ontologies", "documents", "concepts") == 5L)
    val (fe2, fn2) = fullRecompute(store, 2L)
    assert(asEdgeSet(inc.edges(2L)) == fe2)
    assert(asNodeSet(inc.nodes(2L)) == fn2)
    // spot-check the interesting counts: O1 gained d4 (old source) and d5
    // (new source); d2 gained c5
    val counts = asNodeSet(inc.nodes(2L))
      .map(n => (n._1, n._2) -> n._5).toMap
    assert(counts(("ontology", "O1")) == 3L)
    assert(counts(("document", "d2")) == 2L)
    assert(counts(("document", "d3")) == 0L)
  }

  test("refresh is a no-op when nothing is past the horizon") {
    val (store, inc, _) = fixture()
    inc.refresh("edges", "ontologies", "documents", "concepts")
    val vEdges = store.latestVersion("catalog_edges")
    val vNodes = store.latestVersion("catalog_nodes")
    val vMeta = store.latestVersion("catalog_meta")
    assert(inc.refresh("edges", "ontologies", "documents", "concepts") == 0L)
    assert(store.latestVersion("catalog_edges") == vEdges)
    assert(store.latestVersion("catalog_nodes") == vNodes)
    assert(store.latestVersion("catalog_meta") == vMeta)
  }

  test("a refold with a stale horizon adds nothing (crash between state and meta commits)") {
    val (store, inc, _) = fixture()
    inc.refresh("edges", "ontologies", "documents", "concepts")
    // simulate the crash window: state committed, meta lost
    val metaDir = java.nio.file.Paths.get(store.root, "catalog_meta")
    val w = Files.walk(metaDir)
    try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally w.close()
    assert(new IncrementalCatalog(spark, store).horizons.isEmpty)
    // the refold sees every change set again but anti-joins fold it to zero
    assert(inc.refresh("edges", "ontologies", "documents", "concepts") == 0L)
    val (fe, fn) = fullRecompute(store, 1L)
    assert(asEdgeSet(inc.edges(1L)) == fe)
    assert(asNodeSet(inc.nodes(1L)) == fn)
  }

  test("delta-only: refresh succeeds after the source SNAPSHOT files are destroyed") {
    val (store, inc, root) = fixture()
    inc.refresh("edges", "ontologies", "documents", "concepts")
    appendBatch2(store)
    val (expEdges, _) = fullRecompute(store, 2L) // computed BEFORE destruction
    // destroy every source table's snapshot part files, keep `_changes`:
    // a full-rebuild implementation now has nothing to read
    for (t <- Seq("edges", "ontologies", "documents", "concepts");
         v <- store.history(t)) {
      val dir = java.nio.file.Paths.get(root, t, s"v=$v")
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .foreach(Files.delete)
      finally s.close()
    }
    // The full-rebuild path is genuinely dead, not just slow: reading the
    // destroyed snapshot either throws (missing-file strict mode) or yields
    // zero rows (newer Spark tolerates missing files silently) — either way
    // a full recompute cannot reproduce the 5 appended edges below.
    val fullPathRows =
      try Catalog.projectEdges(store.read("edges"), 2L).collect().length
      catch { case _: Exception => 0 }
    assert(fullPathRows == 0, "destroyed snapshot must be unreadable for full rebuild")
    assert(inc.refresh("edges", "ontologies", "documents", "concepts") == 5L)
    assert(asEdgeSet(inc.edges(2L)) == expEdges)
  }
}
