package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The catalog projection — the reference's browse index
  * (api/app/lib/catalog_facade.py:98-420, kg_api.catalog_node/
  * catalog_edge, schema/00_baseline.sql:1817-1873): a materialized
  * ontology → document → concept tree with per-node child counts, rebuilt
  * only when the graph's committed epoch advances past the epoch the
  * index was built at (ensure_fresh / ADR-207).
  *
  * The reference derives the tree with three aggregate Cypher passes and
  * TRUNCATE+INSERTs the rows under an advisory lock. Here the derivation
  * is a declarative plan over the one edge table — three filtered views
  * of the same scan, two equi-joins, distinct, and a partial-aggregated
  * count — and the staleness machinery is [[Freshness]]: epoch-keyed
  * cache, whole-entry eviction on clock advance, persist() within an
  * epoch. The lock dissolves — a rebuild is a pure recompute, so two
  * concurrent readers at worst both compute the same immutable result.
  *
  * Infra-edge orientation follows FIXTURES.md §A:
  * source SCOPED_BY ontology, document HAS_SOURCE source,
  * concept APPEARS source.
  */
object Catalog {

  /** The tree's edges: (parent_kind, parent_id, child_kind, child_id,
    * graph_epoch). ontology→document via HAS_SOURCE⋈SCOPED_BY,
    * document→concept via HAS_SOURCE⋈APPEARS — both deduped, mirroring
    * the reference's DISTINCT collects (catalog_facade.py:360-388). A
    * document with no resolvable parent ontology (sourceless) or a
    * concept reachable from no document (orphan) simply contributes no
    * edge — it stays a node, absent from drill-down, exactly the
    * reference's logged-not-dropped behavior. */
  def projectEdges(edges: DataFrame, epoch: Long): DataFrame = {
    val scoped = edges.where(col("rel_type") === "SCOPED_BY")
      .select(col("src").as("source_id"), col("dst").as("ontology_id"))
    val hasSrc = edges.where(col("rel_type") === "HAS_SOURCE")
      .select(col("src").as("document_id"), col("dst").as("source_id"))
    val appears = edges.where(col("rel_type") === "APPEARS")
      .select(col("src").as("concept_id"), col("dst").as("source_id"))
    val docOnt = hasSrc.join(scoped, "source_id")
      .select(col("ontology_id"), col("document_id")).distinct()
    val docConcept = hasSrc.join(appears, "source_id")
      .select(col("document_id"), col("concept_id")).distinct()
    docOnt
      .select(lit("ontology").as("parent_kind"),
        col("ontology_id").cast("string").as("parent_id"),
        lit("document").as("child_kind"),
        col("document_id").cast("string").as("child_id"))
      .unionByName(docConcept
        .select(lit("document").as("parent_kind"),
          col("document_id").cast("string").as("parent_id"),
          lit("concept").as("child_kind"),
          col("concept_id").cast("string").as("child_id")))
      .withColumn("graph_epoch", lit(epoch))
  }

  /** The tree's nodes: (kind, node_id, name, name_lower, child_count,
    * graph_epoch). child_count comes from the projected edges (an
    * ontology counts its distinct documents, a document its distinct
    * concepts, a concept is a leaf at 0); a NULL name falls back to the
    * id, and name_lower feeds case-insensitive fragment search — the
    * reference's catalog_node row shape (00_baseline.sql:1817-1840). */
  def projectNodes(ontologies: DataFrame, documents: DataFrame,
      concepts: DataFrame, edges: DataFrame, epoch: Long): DataFrame = {
    val counts = projectEdges(edges, epoch)
      .groupBy(col("parent_kind").as("kind"), col("parent_id").as("node_id"))
      .agg(count(lit(1)).as("n"))
    def kindNodes(df: DataFrame, kind: String, idCol: String,
        nameCol: String): DataFrame =
      df.select(lit(kind).as("kind"), col(idCol).cast("string").as("node_id"),
        coalesce(col(nameCol).cast("string"), col(idCol).cast("string")).as("name"))
    kindNodes(ontologies, "ontology", "ontology_id", "name")
      .unionByName(kindNodes(documents, "document", "document_id", "name"))
      .unionByName(kindNodes(concepts, "concept", "concept_id", "label"))
      .join(counts, Seq("kind", "node_id"), "left")
      .select(col("kind"), col("node_id"), col("name"),
        lower(col("name")).as("name_lower"),
        coalesce(col("n"), lit(0L)).as("child_count"),
        lit(epoch).as("graph_epoch"))
  }

  /** The browse API over a projected catalog — list_children
    * (catalog_facade.py:400-470): the children of a parent node (or the
    * root ontologies when `parent` is None), optionally filtered by a
    * case-insensitive name fragment, ordered, and offset/limit paged.
    * All predicates are per-row filters on the (persisted, Freshness-
    * cached) index — the fragment filter plays the reference's pg_trgm
    * index role as a scan predicate; pagination is the reference's own
    * offset contract (limit ≤ 100-ish pages over an already-small index).
    * `sort`: "name" (default) or "children" (child_count desc). */
  def listChildren(nodes: DataFrame, edges: DataFrame,
      parent: Option[(String, String)], childKind: String,
      q: Option[String] = None, sort: String = "name",
      limit: Int = 100, offset: Int = 0): DataFrame = {
    val children = parent match {
      case None => nodes.where(col("kind") === childKind)
      case Some((pKind, pId)) =>
        nodes.join(
          edges.where(col("parent_kind") === pKind && col("parent_id") === pId &&
              col("child_kind") === childKind)
            .select(col("child_kind").as("kind"), col("child_id").as("node_id")),
          Seq("kind", "node_id"), "left_semi")
    }
    val filtered = q match {
      case Some(frag) if frag.nonEmpty =>
        children.where(col("name_lower").contains(frag.toLowerCase))
      case _ => children
    }
    val ordered = sort match {
      case "children" => filtered.orderBy(col("child_count").desc,
        col("name_lower").asc, col("node_id").asc)
      case _ => filtered.orderBy(col("name_lower").asc, col("node_id").asc)
    }
    ordered.offset(math.max(offset, 0)).limit(limit)
  }

  /** Register both catalog tables as [[Freshness]] derivations — the
    * ensure_fresh contract: `freshness.get("catalog_nodes")` serves the
    * epoch-stamped cached index until `clock` advances past the epoch it
    * was built at, then rebuilds once and re-caches. The source frames
    * are by-name so each rebuild re-reads the CURRENT snapshot (pair with
    * [[SnapshotStore.read]] for the M8 versioned tables). */
  def register(freshness: Freshness, clock: () => Long,
      ontologies: => DataFrame, documents: => DataFrame,
      concepts: => DataFrame, edges: => DataFrame): Unit = {
    freshness.register("catalog_nodes")(
      projectNodes(ontologies, documents, concepts, edges, clock()))
    freshness.register("catalog_edges")(projectEdges(edges, clock()))
  }
}
