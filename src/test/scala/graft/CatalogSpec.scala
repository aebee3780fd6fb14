package graft

import graft.core.{Catalog, Freshness}

/** The catalog projection (reference catalog_facade.py:98-420): tree
  * shape, child counts, sourceless/orphan handling, and the ADR-207
  * staleness gate — rebuilt exactly once per committed-epoch advance. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  // O1 ← s1 ← d1 ← {c1, c2};  O2 ← s2 ← d2 ← {c3}
  // d3's source s3 has no SCOPED_BY (sourceless doc); c4 never APPEARS
  // (orphan concept). Both stay nodes, neither gets a tree edge.
  val ontologies = Seq(("O1", "ont one"), ("O2", "ont two"))
    .toDF("ontology_id", "name")
  val documents = Seq(("d1", "doc one"), ("d2", "doc two"), ("d3", null))
    .toDF("document_id", "name")
  val concepts = Seq(("c1", "alpha"), ("c2", "beta"), ("c3", "gamma"),
    ("c4", "orphan")).toDF("concept_id", "label")
  val edges = Seq(
    ("s1", "O1", "SCOPED_BY"), ("s2", "O2", "SCOPED_BY"),
    ("d1", "s1", "HAS_SOURCE"), ("d2", "s2", "HAS_SOURCE"),
    ("d3", "s3", "HAS_SOURCE"),
    ("c1", "s1", "APPEARS"), ("c2", "s1", "APPEARS"), ("c3", "s2", "APPEARS"),
    // semantic edges must not leak into the catalog tree
    ("c1", "c2", "SUPPORTS")).toDF("src", "dst", "rel_type")

  test("projects the ontology→document→concept tree with child counts") {
    val nodes = Catalog.projectNodes(ontologies, documents, concepts, edges, 7L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    assert(nodes.size == 9)
    assert(nodes(("ontology", "O1")) == (("ont one", "ont one", 1L, 7L)))
    assert(nodes(("ontology", "O2")) == (("ont two", "ont two", 1L, 7L)))
    assert(nodes(("document", "d1"))._3 == 2L) // c1, c2
    assert(nodes(("document", "d2"))._3 == 1L) // c3
    assert(nodes(("document", "d3"))._3 == 0L) // sourceless: leafless node
    // NULL name falls back to the id (reference: name or id)
    assert(nodes(("document", "d3"))._1 == "d3")
    assert(nodes(("concept", "c4"))._3 == 0L)  // orphan: node, no edge
    assert(nodes.keys.count(_._1 == "concept") == 4)

    val tree = Catalog.projectEdges(edges, 7L)
      .select("parent_kind", "parent_id", "child_kind", "child_id")
      .as[(String, String, String, String)].collect().toSet
    assert(tree == Set(
      ("ontology", "O1", "document", "d1"),
      ("ontology", "O2", "document", "d2"),
      ("document", "d1", "concept", "c1"),
      ("document", "d1", "concept", "c2"),
      ("document", "d2", "concept", "c3")))
  }

  test("listChildren browses the tree: root, drill-down, fragment, paging") {
    val nodes = Catalog.projectNodes(ontologies, documents, concepts, edges, 1L)
      .localCheckpoint(true)
    val tree = Catalog.projectEdges(edges, 1L).localCheckpoint(true)
    // root: all ontologies, name-ordered
    val roots = Catalog.listChildren(nodes, tree, None, "ontology")
      .select("node_id").as[String].collect().toSeq
    assert(roots == Seq("O1", "O2"))
    // drill into d1's concepts
    val d1kids = Catalog.listChildren(nodes, tree,
        Some(("document", "d1")), "concept")
      .select("node_id").as[String].collect().toSeq
    assert(d1kids == Seq("c1", "c2")) // alpha, beta
    // fragment filter is case-insensitive on name_lower
    val frag = Catalog.listChildren(nodes, tree, Some(("document", "d1")),
        "concept", q = Some("ALPH"))
      .select("name").as[String].collect().toSeq
    assert(frag == Seq("alpha"))
    // children sort puts the fuller document first; paging slices it
    val byCount = Catalog.listChildren(nodes, tree, None, "document",
        sort = "children")
      .select("node_id").as[String].collect().toSeq
    assert(byCount == Seq("d1", "d2", "d3"))
    val page2 = Catalog.listChildren(nodes, tree, None, "document",
        sort = "children", limit = 1, offset = 1)
      .select("node_id").as[String].collect().toSeq
    assert(page2 == Seq("d2"))
    // a sourceless document has no children to list
    assert(Catalog.listChildren(nodes, tree, Some(("document", "d3")),
      "concept").isEmpty)
  }

  test("randomized DAG invariants: N parent docs ⇒ N edges; counts match") {
    // The reference separates _project from I/O precisely so these DAG
    // invariants are unit-testable (catalog_facade.py:259-280): a concept
    // appearing in N documents yields N document→concept edges, and an
    // ontology's child_count is its distinct document count.
    val rnd = new scala.util.Random(13)
    val onts = (1 to 4).map(i => s"O$i")
    val docs = (1 to 12).map(i => s"d$i")
    val srcs = (1 to 20).map(i => s"s$i")
    val cons = (1 to 30).map(i => s"c$i")
    // each source scoped to ≤1 random ontology; docs own random sources;
    // concepts appear in random sources (some in none — orphans)
    val scopedBy = srcs.filter(_ => rnd.nextDouble() < 0.8)
      .map(s => (s, onts(rnd.nextInt(onts.size)), "SCOPED_BY"))
    val hasSource = docs.flatMap(d => srcs.filter(_ => rnd.nextDouble() < 0.2)
      .map(s => (d, s, "HAS_SOURCE")))
    val appears = cons.flatMap(c => srcs.filter(_ => rnd.nextDouble() < 0.15)
      .map(s => (c, s, "APPEARS")))
    val e = (scopedBy ++ hasSource ++ appears).toDF("src", "dst", "rel_type")

    // driver-side expected model from the same tuples
    val srcOnt = scopedBy.map(t => t._1 -> t._2).toMap
    val docSrcs = hasSource.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val conSrcs = appears.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expDocOnt = (for {
      (d, ss) <- docSrcs.toSeq; s <- ss; o <- srcOnt.get(s)
    } yield (o, d)).toSet
    val expDocCon = (for {
      (c, ss) <- conSrcs.toSeq; s <- ss
      d <- docSrcs.collect { case (d, dss) if dss.contains(s) => d }
    } yield (d, c)).toSet

    val tree = Catalog.projectEdges(e, 1L)
      .select("parent_kind", "parent_id", "child_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tree.filter(_._1 == "ontology").map(t => (t._2, t._3)).toSet == expDocOnt)
    assert(tree.filter(_._1 == "document").map(t => (t._2, t._3)).toSet == expDocCon)

    val nodes = Catalog.projectNodes(
      onts.map(o => (o, o)).toDF("ontology_id", "name"),
      docs.map(d => (d, d)).toDF("document_id", "name"),
      cons.map(c => (c, c)).toDF("concept_id", "label"), e, 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(nodes.size == onts.size + docs.size + cons.size)
    onts.foreach { o =>
      assert(nodes(("ontology", o)) == expDocOnt.count(_._1 == o).toLong, o)
    }
    docs.foreach { d =>
      assert(nodes(("document", d)) == expDocCon.count(_._1 == d).toLong, d)
    }
    cons.foreach(c => assert(nodes(("concept", c)) == 0L, c))
  }

  test("staleness gate: rebuilt once per epoch advance, served cached within") {
    var epoch = 1L
    var rebuilds = 0
    val freshness = new Freshness(() => epoch)
    Catalog.register(freshness, () => epoch,
      ontologies, documents, concepts, { rebuilds += 1; edges })
    // two reads at the same epoch: one rebuild, cached result served
    val first = freshness.get("catalog_nodes")
    assert(first.count() == 9)
    freshness.get("catalog_nodes")
    assert(rebuilds == 1)
    assert(first.select("graph_epoch").head().getLong(0) == 1L)
    // the clock advances: next read rebuilds exactly once, stamped anew
    epoch = 2L
    val second = freshness.get("catalog_nodes")
    assert(rebuilds == 2)
    assert(second.select("graph_epoch").head().getLong(0) == 2L)
    freshness.get("catalog_nodes")
    assert(rebuilds == 2)
    // the edge derivation is gated independently and sees the same clock
    assert(freshness.get("catalog_edges").select("graph_epoch").head().getLong(0) == 2L)
  }
}
