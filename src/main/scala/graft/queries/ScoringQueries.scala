package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Scoring
import graft.sources.Tables

/** Scoring-operator coverage (SURVEY §2.4 A5/A7/A9, §2.10 V7) exercised on
  * testdata: ontology affinity over a (brand → supplier) membership table,
  * ontology mass over per-language document stats, and polarity-axis
  * projection between two label centroids in embedding space.
  */
object ScoringQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Membership table: ontology = part brand, member = supplier.
    *
    * The fact side joins a BROADCAST of the two-column (p_partkey,
    * p_brand) dim projection: the full-row shuffle join exchanged every
    * lineitem row by partkey (sf10: 60M rows, the bulk of q43's cost)
    * just to attach a 10-char brand; the pruned dim is ~16 B/part and
    * broadcasts at any dim size a driver can hold, so the fact rows are
    * branded map-side and the only remaining exchange is the downstream
    * (brand, supplier) dedup — which partial-aggregates 60M → ~8M inside
    * the scan stage. (A dim too large to broadcast is the signal to
    * bucket both sides by partkey instead — SCALE.md §Joins.)
    * NOT deduped and NOT stringified here: since the r12 rewrite,
    * ontologyAffinityAll dedups inside its own collect_set aggregation
    * (a producer-side distinct would just add back the fact-stream
    * exchange the rewrite removed), and the concept id never reaches the
    * output, so the raw long suppkey rides as the concept key — no
    * per-fact-row string allocation at all. */
  private def membership(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("ontology"), col("l_suppkey").as("concept_id"))

  val queries: Map[String, Q] = Map(
    // A7: cross-ontology affinity — shared members / target size, top-30
    // (ontology_scoring.py:213-265). The ontology DOMAIN (25 brands)
    // comes off the part DIMENSION — dims-scale, never a fact scan — and
    // unlocks the bitmask set aggregation (codegen bit_or instead of the
    // fact-stream collect_set object aggregation; Scoring scaladoc).
    "q43_affinity" -> ((s, dir) => {
      val brands = Tables.part(s, dir).select(col("p_brand"))
        .distinct().collect().map(_.getString(0)).toSeq
      Scoring.ontologyAffinity(membership(s, dir), topN = 30,
        domain = Some(brands))
    }),

    // V7: polarity projection of every embedding onto the label-0 ↔
    // label-1 centroid axis with ±0.3 direction bands
    // (polarity_axis.py:63-130).
    "q44_polarity" -> ((s, dir) => {
      val cent = Tables.embeddings(s, dir)
        .where(col("label").isin(0, 1))
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("v"))
        .collect()
      def centroid(l: Int): Array[Double] =
        cent.filter(_.getInt(0) == l).sortBy(_.getInt(1)).map(_.getDouble(2))
      Scoring.polarityProjection(
          Tables.embeddings(s, dir).select(col("vec_id"),
            col("embedding").cast("array<double>").as("emb")),
          "emb", centroid(0), centroid(1))
        .select(col("vec_id"),
          round(col("position"), 6).as("position"),
          col("direction"),
          round(col("orthogonal_distance"), 6).as("orthogonal_distance"))
        .orderBy(col("vec_id"))
    }),

    // A9: ontology mass — M-M saturation of per-language corpus stats
    // (ontology_scorer.py:44-77).
    "q45_mass" -> ((s, dir) => {
      val stats = Tables.documents(s, dir)
        .groupBy(col("lang").as("ontology"))
        .agg(
          count(lit(1)).as("n_concepts"),
          countDistinct(col("source")).as("n_sources"),
          floor(sum(col("n_chars")) / lit(100.0)).cast("long").as("n_internal_rels"))
      Scoring.ontologyMass(stats)
        .select(col("ontology"), col("n_concepts"), col("n_sources"),
          col("n_internal_rels"), col("mass"))
        .orderBy(col("ontology"))
    }),
    // Catalog projection (catalog_facade.py:98-420): the ontology→
    // document→concept browse tree with per-node child counts, derived
    // through the real Catalog.projectNodes plan over a KG-shaped view of
    // the star schema — region=ontology, nation=document (one synthetic
    // source per nation), customer=concept. Scale shape: three filtered
    // views of one edge scan, two equi-joins, distinct, one
    // partial-aggregated count — no collects, no windows.
    "q91_catalog" -> ((s, dir) => {
      val region = Tables.region(s, dir)
      val nation = Tables.nation(s, dir)
      val customer = Tables.customer(s, dir)
      val ontologies = region.select(
        concat(lit("o"), col("r_regionkey")).as("ontology_id"),
        col("r_name").as("name"))
      val documents = nation.select(
        concat(lit("d"), col("n_nationkey")).as("document_id"),
        col("n_name").as("name"))
      val concepts = customer.select(
        concat(lit("c"), col("c_custkey")).as("concept_id"),
        col("c_name").as("label"))
      val edges = nation.select(
          concat(lit("s"), col("n_nationkey")).as("src"),
          concat(lit("o"), col("n_regionkey")).as("dst"),
          lit("SCOPED_BY").as("rel_type"))
        .unionByName(nation.select(
          concat(lit("d"), col("n_nationkey")).as("src"),
          concat(lit("s"), col("n_nationkey")).as("dst"),
          lit("HAS_SOURCE").as("rel_type")))
        .unionByName(customer.select(
          concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("s"), col("c_nationkey")).as("dst"),
          lit("APPEARS").as("rel_type")))
      graft.core.Catalog.projectNodes(ontologies, documents, concepts, edges,
          epoch = 1L)
        .orderBy(col("kind"), col("node_id"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q91_catalog" ->
      """WITH onodes AS (
        |  SELECT 'ontology' AS kind, 'o' || r_regionkey AS node_id,
        |    r_name AS name,
        |    (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
        |      AS child_count
        |  FROM region),
        |dnodes AS (
        |  SELECT 'document' AS kind, 'd' || n_nationkey AS node_id,
        |    n_name AS name,
        |    (SELECT count(DISTINCT c_custkey) FROM customer
        |     WHERE c_nationkey = n_nationkey) AS child_count
        |  FROM nation),
        |cnodes AS (
        |  SELECT 'concept' AS kind, 'c' || c_custkey AS node_id,
        |    c_name AS name, 0 AS child_count
        |  FROM customer)
        |SELECT kind, node_id, name, lower(name) AS name_lower,
        |  CAST(child_count AS BIGINT) AS child_count,
        |  CAST(1 AS BIGINT) AS graph_epoch
        |FROM (SELECT * FROM onodes UNION ALL
        |      SELECT * FROM dnodes UNION ALL
        |      SELECT * FROM cnodes) t
        |ORDER BY kind, node_id""".stripMargin,

    "q43_affinity" ->
      """WITH membership AS (
        |  SELECT DISTINCT p_brand AS ontology, 's' || l_suppkey AS concept_id
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |shared AS (
        |  SELECT a.ontology AS ont_a, b.ontology AS ont_b,
        |    count(DISTINCT a.concept_id) AS shared_concepts
        |  FROM membership a JOIN membership b ON a.concept_id = b.concept_id
        |  WHERE a.ontology != b.ontology
        |  GROUP BY 1, 2),
        |totals AS (
        |  SELECT ontology AS ont_b, count(DISTINCT concept_id) AS target_total
        |  FROM membership GROUP BY 1)
        |SELECT ont_a, ont_b, shared_concepts, target_total,
        |  round(shared_concepts / CAST(target_total AS DOUBLE), 6) AS affinity
        |FROM shared JOIN totals USING (ont_b)
        |ORDER BY shared_concepts / CAST(target_total AS DOUBLE) DESC,
        |  ont_a ASC, ont_b ASC
        |LIMIT 30""".stripMargin,

    "q44_polarity" ->
      """WITH cpos AS (
        |  SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |    unnest(generate_series(1, len(embedding))) AS p
        |  FROM embeddings WHERE label IN (0, 1)),
        |cent AS (
        |  SELECT label, list(av ORDER BY p) AS c FROM (
        |    SELECT label, p, avg(v) AS av FROM cpos GROUP BY label, p) t
        |  GROUP BY label),
        |params AS (
        |  SELECT
        |    (SELECT c FROM cent WHERE label = 0) AS c0,
        |    (SELECT c FROM cent WHERE label = 1) AS c1),
        |axis AS (
        |  SELECT
        |    list_transform(generate_series(1, 64), i -> (c0[i] - c1[i])) AS araw,
        |    list_transform(generate_series(1, 64), i -> ((c0[i] + c1[i]) / 2.0)) AS mid
        |  FROM params),
        |naxis AS (
        |  SELECT mid,
        |    sqrt(list_sum(list_transform(araw, x -> x * x))) AS nrm,
        |    list_transform(araw, x -> x / sqrt(list_sum(list_transform(araw, y -> y * y)))) AS ax
        |  FROM axis),
        |proj AS (
        |  SELECT e.vec_id,
        |    list_transform(generate_series(1, 64), i -> (e.embedding[i]::DOUBLE - n.mid[i])) AS cv,
        |    n.ax, n.nrm / 2.0 AS half_len
        |  FROM embeddings e, naxis n),
        |scored AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(generate_series(1, 64), i -> cv[i] * ax[i])) / half_len AS position,
        |    list_sum(list_transform(cv, x -> x * x)) AS cc,
        |    list_sum(list_transform(generate_series(1, 64), i -> cv[i] * ax[i])) AS ca
        |  FROM proj)
        |SELECT vec_id, round(position, 6) AS position,
        |  CASE WHEN position > 0.3 THEN 'toward_a'
        |       WHEN position < -0.3 THEN 'toward_b'
        |       ELSE 'neutral' END AS direction,
        |  round(sqrt(greatest(cc - ca * ca, 0.0)), 6) AS orthogonal_distance
        |FROM scored ORDER BY vec_id""".stripMargin,

    "q45_mass" ->
      """WITH stats AS (
        |  SELECT lang AS ontology, count(*) AS n_concepts,
        |    count(DISTINCT source) AS n_sources,
        |    CAST(floor(sum(n_chars) / 100.0) AS BIGINT) AS n_internal_rels
        |  FROM documents GROUP BY lang)
        |SELECT ontology, n_concepts, n_sources, n_internal_rels,
        |  round((n_concepts / 50.0 + n_sources / 20.0 + n_internal_rels / 50.0)
        |    / (n_concepts / 50.0 + n_sources / 20.0 + n_internal_rels / 50.0 + 2.0), 6) AS mass
        |FROM stats ORDER BY ontology""".stripMargin,
  )
}
