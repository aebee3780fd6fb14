package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally maintained catalog projection — [[Catalog]]'s tree kept
  * fresh from the snapshot store's CHANGE FEED instead of the reference's
  * TRUNCATE+INSERT full rebuild (catalog_facade.py:98-259, rebuilt per
  * epoch advance). Each `refresh` folds only the change sets recorded
  * after the view's horizon (`SnapshotStore.changesSince`) into the
  * maintained state; the 100 TB source edge table is never re-scanned.
  *
  * Incremental join maintenance: the tree edge ontology→document is
  * HAS_SOURCE ⋈ SCOPED_BY on source_id, so its delta under an
  * append-only source is the standard two-term expansion
  *
  *   Δ(H ⋈ S) = ΔH ⋈ (S ∪ ΔS)  ∪  H ⋈ ΔS
  *
  * evaluated against the maintained INFRA STATE (the filtered
  * SCOPED_BY/HAS_SOURCE/APPEARS relations — the browse-index-sized slice
  * of the edge table, kept as a view table), never against the source
  * snapshot. Every fold is `distinct` + anti-join against existing state,
  * so refolding a change set is a no-op — which makes the horizon commit
  * (a separate tiny meta table, written LAST) safe: a crash between the
  * state commits and the meta commit merely refolds an already-applied
  * delta into zero new rows on the next refresh.
  *
  * Per-refresh cost: O(|delta| ⋈ infra-state) for the tree edges (the
  * delta side broadcasts), one partial-aggregated count of the new edges,
  * and an O(view) rewrite of the node table (child counts change in
  * place) — bounded by the browse index, never the corpus.
  *
  * Contract (same as [[MaterializedView]]): the four source tables must
  * be APPEND-maintained (`append` / `SnapshotSink`) so every version
  * records its change set; dim rows (names) are immutable once appended.
  * The view tables (`<view>_infra`, `<view>_edges`, `<view>_nodes`,
  * `<view>_meta`) are written only by this maintainer.
  */
final class IncrementalCatalog(spark: SparkSession, store: SnapshotStore,
    view: String = "catalog") {

  private val infraTable = s"${view}_infra"
  private val edgesTable = s"${view}_edges"
  private val nodesTable = s"${view}_nodes"
  private val metaTable  = s"${view}_meta"

  private def empty(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)

  private val infraSchema = StructType(Seq(
    StructField("kind", StringType), StructField("src_key", StringType),
    StructField("member", StringType)))
  private val edgeSchema = StructType(Seq(
    StructField("parent_kind", StringType), StructField("parent_id", StringType),
    StructField("child_kind", StringType), StructField("child_id", StringType)))
  private val nodeSchema = StructType(Seq(
    StructField("kind", StringType), StructField("node_id", StringType),
    StructField("name", StringType), StructField("name_lower", StringType),
    StructField("child_count", LongType)))

  private def stateOr(table: String, schema: StructType): DataFrame =
    if (store.latestVersion(table).isDefined) store.read(table) else empty(schema)

  /** Folded-through source versions, one row per source table name. */
  def horizons: Map[String, Long] =
    if (store.latestVersion(metaTable).isEmpty) Map.empty
    else store.read(metaTable).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The maintained tree edges, shaped exactly as
    * [[Catalog.projectEdges]] (graph_epoch stamped at read). */
  def edges(epoch: Long): DataFrame =
    stateOr(edgesTable, edgeSchema).withColumn("graph_epoch", lit(epoch))

  /** The maintained node index, shaped exactly as
    * [[Catalog.projectNodes]]. */
  def nodes(epoch: Long): DataFrame =
    stateOr(nodesTable, nodeSchema).withColumn("graph_epoch", lit(epoch))

  /** Fold every change set past the horizon into the maintained tree.
    * Source column shapes follow FIXTURES.md §A / [[Catalog]]:
    * edges(src, dst, rel_type), ontologies(ontology_id, name),
    * documents(document_id, name), concepts(concept_id, label).
    * Returns the number of NEW tree edges discovered (0 = no-op: nothing
    * past the horizon, or deltas produced no new tree rows). */
  def refresh(srcEdges: String, srcOntologies: String, srcDocuments: String,
      srcConcepts: String): Long = {
    val h = horizons
    def delta(src: String) = store.changesSince(src, h.getOrElse(src, 0L))
    def newestVersion(src: String): Long =
      math.max(h.getOrElse(src, 0L),
        store.changedVersions(src).lastOption.getOrElse(0L))

    // ---- infra deltas: the three filtered views of the edge delta,
    // deduped against the maintained infra state (replays fold to zero)
    val oldInfra = stateOr(infraTable, infraSchema).localCheckpoint(true)
    val edgeDelta = delta(srcEdges)
    def infraOf(rel: String, kind: String, srcIsMember: Boolean) = {
      val raw = edgeDelta.where(col("rel_type") === rel)
      val shaped =
        if (srcIsMember) raw.select(lit(kind).as("kind"),
          col("dst").cast("string").as("src_key"),
          col("src").cast("string").as("member"))
        else raw.select(lit(kind).as("kind"),
          col("src").cast("string").as("src_key"),
          col("dst").cast("string").as("member"))
      shaped.distinct()
        .join(oldInfra.where(col("kind") === kind), Seq("kind", "src_key", "member"),
          "left_anti")
    }
    // orientation per FIXTURES.md §A: source SCOPED_BY ontology,
    // document HAS_SOURCE source, concept APPEARS source
    val dScoped  = infraOf("SCOPED_BY", "scoped", srcIsMember = false)
      .select(col("src_key"), col("member").as("ontology_id"))
    val dHasSrc  = infraOf("HAS_SOURCE", "has_source", srcIsMember = true)
      .select(col("src_key"), col("member").as("document_id"))
    val dAppears = infraOf("APPEARS", "appears", srcIsMember = true)
      .select(col("src_key"), col("member").as("concept_id"))
    val newInfra = (
      dScoped.select(lit("scoped").as("kind"), col("src_key"),
        col("ontology_id").as("member"))
        unionByName dHasSrc.select(lit("has_source").as("kind"), col("src_key"),
          col("document_id").as("member"))
        unionByName dAppears.select(lit("appears").as("kind"), col("src_key"),
          col("concept_id").as("member"))
      ).localCheckpoint(true)

    val oldScoped = oldInfra.where(col("kind") === "scoped")
      .select(col("src_key"), col("member").as("ontology_id"))
    val oldHasSrc = oldInfra.where(col("kind") === "has_source")
      .select(col("src_key"), col("member").as("document_id"))
    val oldAppears = oldInfra.where(col("kind") === "appears")
      .select(col("src_key"), col("member").as("concept_id"))
    val nd = (k: String, a: String) => newInfra.where(col("kind") === k)
      .select(col("src_key"), col("member").as(a))
    val (dS, dH, dA) = (nd("scoped", "ontology_id"),
      nd("has_source", "document_id"), nd("appears", "concept_id"))
    val allScoped = oldScoped.unionByName(dS)

    // ---- Δ(H ⋈ S): the delta side broadcasts, the state side is the
    // maintained infra slice — the source edge table never appears
    val dDocOnt = broadcast(dH).join(allScoped, "src_key")
      .unionByName(oldHasSrc.join(broadcast(dS), "src_key"))
      .select(lit("ontology").as("parent_kind"),
        col("ontology_id").as("parent_id"),
        lit("document").as("child_kind"), col("document_id").as("child_id"))
    val allHasSrc = oldHasSrc.unionByName(dH)
    val dDocCon = broadcast(dA).join(allHasSrc, "src_key")
      .unionByName(oldAppears.join(broadcast(dH), "src_key"))
      .select(lit("document").as("parent_kind"),
        col("document_id").as("parent_id"),
        lit("concept").as("child_kind"), col("concept_id").as("child_id"))
    val oldEdges = stateOr(edgesTable, edgeSchema).localCheckpoint(true)
    val newEdges = dDocOnt.unionByName(dDocCon).distinct()
      .join(oldEdges, Seq("parent_kind", "parent_id", "child_kind", "child_id"),
        "left_anti")
      .localCheckpoint(true)
    val nNew = newEdges.count()

    // ---- node deltas: new dim rows (names resolved at fold time, the
    // reference's name-or-id fallback) anti-joined against known nodes
    val oldNodes = stateOr(nodesTable, nodeSchema).localCheckpoint(true)
    def dimDelta(src: String, kind: String, idCol: String, nameCol: String) =
      delta(src).select(lit(kind).as("kind"),
          col(idCol).cast("string").as("node_id"),
          coalesce(col(nameCol).cast("string"),
            col(idCol).cast("string")).as("name"))
        .distinct()
        .join(oldNodes, Seq("kind", "node_id"), "left_anti")
        .withColumn("name_lower", lower(col("name")))
        .withColumn("child_count", lit(0L))
        .select("kind", "node_id", "name", "name_lower", "child_count")
    val newNodes = dimDelta(srcOntologies, "ontology", "ontology_id", "name")
      .unionByName(dimDelta(srcDocuments, "document", "document_id", "name"))
      .unionByName(dimDelta(srcConcepts, "concept", "concept_id", "label"))
      .localCheckpoint(true)
    val nNewNodes = newNodes.count()

    // ---- commits: state first (all idempotent under refold), meta last.
    if (newInfra.count() > 0) store.append(infraTable, newInfra)
    if (nNew > 0) store.append(edgesTable, newEdges)
    if (nNew > 0 || nNewNodes > 0) {
      // child-count increments from the new edges only — O(delta groups)
      val inc = newEdges
        .groupBy(col("parent_kind").as("kind"), col("parent_id").as("node_id"))
        .agg(count(lit(1)).as("inc"))
      val nodes2 = oldNodes.unionByName(newNodes)
        .join(inc, Seq("kind", "node_id"), "left")
        .withColumn("child_count",
          col("child_count") + coalesce(col("inc"), lit(0L)))
        .drop("inc")
      store.commit(nodesTable, nodes2) // O(view) rewrite, never O(source)
    }
    import spark.implicits._
    val newMeta = Seq(srcEdges, srcOntologies, srcDocuments, srcConcepts)
      .map(s => (s, newestVersion(s))).toDF("src", "up_to_version")
    if (horizons != newMeta.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      store.commit(metaTable, newMeta)
    nNew
  }
}
