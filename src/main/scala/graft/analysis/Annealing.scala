package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Curves
import graft.graph.GraphOps

/** The ontology annealing cycle — the reference's ADR-200 policy loop
  * (api/app/workers/annealing_worker.py, services/annealing_manager.py:
  * 70-455, lib/ontology_scorer.py:44-225, kg_api.annealing_proposals,
  * schema/00_baseline.sql:1875-1927): score all ontologies, find
  * demotion candidates (protection below threshold) and promotion
  * candidates (high-degree concepts), derive the ecological pressure
  * from the Bezier aggressiveness curve, emit a capped proposal batch,
  * and apply approved proposals as snapshot rewrites + epoch-log events.
  *
  * Scoring is fully distributed (joins + partial aggregations over the
  * membership/edge tables); only the ≤`maxProposals` proposal batch — a
  * policy decision, bounded by construction — ever reaches the driver.
  *
  * Table shapes (FIXTURES.md §A): ontologies(ontology_id, name,
  * lifecycle_state, creation_epoch); membership(ontology, concept_id)
  * where `ontology` references ontology_id; sources(ontology, source_id);
  * concepts(concept_id, label, embedding); edges(src, dst, …) semantic.
  */
object Annealing {

  /** Cycle tuneables — the annealing_worker job parameters with the
    * reference's defaults (annealing_worker.py:44-53). */
  final case class Config(
      demotionThreshold: Double = 0.15,
      promotionMinDegree: Long = 10L,
      maxProposals: Int = 5,
      minOntologyAgeEpochs: Long = 3L,
      minOntologyConceptCount: Long = 5L)

  /** Per-ontology mass / coherence / exposure / protection — the
    * OntologyScorer composite (ontology_scorer.py:44-225), one row per
    * ontology, all-distributed:
    *  - mass: M-M saturation of concept/source/internal-rel counts
    *  - coherence: mean pairwise cosine over ≤100 members (deterministic
    *    ascending-id sample; < 2 embedded members → 0.0)
    *  - exposure: age/(age+50), weighted by the top-5 affinity neighbors'
    *    activity ×0.3, capped at 1
    *  - protection: sigmoid(4·mass·coherence − 2) − 0.6·weighted_exposure,
    *    4dp (can go negative for severely failed ontologies) */
  def scoreAll(ontologies: DataFrame, membership: DataFrame,
      sources: DataFrame, concepts: DataFrame, edges: DataFrame,
      currentEpoch: Long): DataFrame = {
    val m = membership.dropDuplicates().localCheckpoint(true)
    val nConcepts = m.groupBy(col("ontology"))
      .agg(count(lit(1)).as("n_concepts"))
    val nSources = sources.dropDuplicates().groupBy(col("ontology"))
      .agg(count(lit(1)).as("n_sources"))
    // internal rels: both endpoints members of the same ontology
    val nInternal = edges.select(col("src"), col("dst"))
      .join(m.select(col("ontology"), col("concept_id").as("src")), Seq("src"))
      .join(m.select(col("ontology"), col("concept_id").as("dst")),
        Seq("ontology", "dst"), "left_semi")
      .groupBy(col("ontology")).agg(count(lit(1)).as("n_internal_rels"))

    // coherence over the reference's ≤100-member sample (scorer limit=100),
    // deterministic by ascending concept id; the per-ontology window is a
    // shuffle on ontology with output bounded at 100 rows per group
    val sampleW = Window.partitionBy(col("ontology")).orderBy(col("concept_id"))
    val members = m
      .join(concepts.where(col("embedding").isNotNull)
        .select(col("concept_id"),
          col("embedding").cast("array<double>").as("emb")), Seq("concept_id"))
      .withColumn("__rn", row_number().over(sampleW))
      .where(col("__rn") <= 100)
      .select(col("ontology"), col("concept_id"), col("emb"))
    val coherence = Scoring.ontologyCoherence(members)
      .select(col("ontology"), col("coherence"))

    // exposure: top-5 affinity neighbors' activity weights the raw age
    // (the unsorted pair table — the per-ont_a window below is the rank)
    val aff = Scoring.ontologyAffinityAll(m)
    val top5 = aff
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("ont_a"))
          .orderBy(col("affinity").desc, col("ont_b").asc)))
      .where(col("__rk") <= 5)
    val ages = ontologies.select(col("ontology_id"),
      greatest(lit(0L),
        lit(currentEpoch) - coalesce(col("creation_epoch"), lit(0L))).as("age"))
    def activity(age: org.apache.spark.sql.Column) =
      when(age > 0, age.cast("double") / (age + lit(50.0))).otherwise(lit(0.0))
    val neighborWeight = top5
      .join(ages.select(col("ontology_id").as("ont_b"), col("age").as("b_age")),
        Seq("ont_b"))
      .groupBy(col("ont_a").as("ontology"))
      .agg(sum(col("affinity") * activity(col("b_age"))).as("w_sum"))

    val stats = ontologies
      .select(col("ontology_id").as("ontology"), col("name"),
        coalesce(col("lifecycle_state"), lit("active")).as("lifecycle_state"),
        coalesce(col("creation_epoch"), lit(0L)).as("creation_epoch"))
      .join(nConcepts, Seq("ontology"), "left")
      .join(nSources, Seq("ontology"), "left")
      .join(nInternal, Seq("ontology"), "left")
      .na.fill(0L, Seq("n_concepts", "n_sources", "n_internal_rels"))
    Scoring.ontologyMass(stats)
      .join(coherence, Seq("ontology"), "left")
      .join(neighborWeight, Seq("ontology"), "left")
      .withColumn("coherence", coalesce(col("coherence"), lit(0.0)))
      .withColumn("age",
        greatest(lit(0L), lit(currentEpoch) - col("creation_epoch")))
      .withColumn("raw_exposure", round(activity(col("age")), 4))
      .withColumn("weighted_exposure", round(least(lit(1.0),
        activity(col("age")) + coalesce(col("w_sum"), lit(0.0)) * 0.3), 4))
      .withColumn("protection_score", round(
        lit(1.0) / (lit(1.0) +
          exp(-(col("mass") * col("coherence") * 4.0 - 2.0))) -
          col("weighted_exposure") * 0.6, 4))
      .select("ontology", "name", "lifecycle_state", "creation_epoch", "age",
        "n_concepts", "n_sources", "n_internal_rels", "mass", "coherence",
        "raw_exposure", "weighted_exposure", "protection_score")
  }

  /** Demotion candidates (annealing_manager.py:328-388): protection below
    * threshold, not pinned/frozen, past the age and concept-count floors,
    * worst first. */
  def demotionCandidates(scores: DataFrame, cfg: Config): DataFrame =
    scores
      .where(col("protection_score") < cfg.demotionThreshold)
      .where(col("n_concepts") >= cfg.minOntologyConceptCount)
      .where(!col("lifecycle_state").isin("pinned", "frozen"))
      .where(if (cfg.minOntologyAgeEpochs <= 0L) lit(true)
        else col("age") >= cfg.minOntologyAgeEpochs)
      .orderBy(col("protection_score").asc, col("ontology").asc)

  /** Promotion candidates (annealing_manager.py:389-455): each eligible
    * ontology's top-10 concepts by degree, kept when degree clears the
    * floor, the concept doesn't already anchor an ontology, and its label
    * doesn't collide with an existing ontology name; strongest first. */
  def promotionCandidates(scores: DataFrame, membership: DataFrame,
      concepts: DataFrame, edges: DataFrame,
      anchoredConceptIds: Seq[String], cfg: Config): DataFrame = {
    val eligible = scores
      .where(col("n_concepts") >= cfg.minOntologyConceptCount)
      .where(if (cfg.minOntologyAgeEpochs <= 0L) lit(true)
        else col("age") >= cfg.minOntologyAgeEpochs)
      .select(col("ontology"))
    val ranked = membership.dropDuplicates()
      .join(eligible, Seq("ontology"), "left_semi")
      .join(GraphOps.degrees(edges).select(col("node").as("concept_id"),
        col("total_degree").as("degree")), Seq("concept_id"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("ontology"))
          .orderBy(col("degree").desc, col("concept_id").asc)))
      .where(col("__rk") <= 10) // get_concept_degree_ranking limit
      .where(col("degree") >= cfg.promotionMinDegree)
      .where(if (anchoredConceptIds.nonEmpty)
        !col("concept_id").isin(anchoredConceptIds: _*) else lit(true))
      .join(concepts.select(col("concept_id"), col("label")), Seq("concept_id"))
    // label must not collide with an existing ontology name (case-fold)
    ranked
      .join(scores.select(lower(col("name")).as("__lname")).distinct(),
        lower(col("label")) === col("__lname"), "left_anti")
      .select(col("concept_id"), col("label"), col("degree"), col("ontology"))
      .orderBy(col("degree").desc, col("concept_id").asc)
  }

  // Ecological pressure constants + curve (annealing_manager.py:41-44):
  // comfort band 10-80 concepts/ontology, emergency at 150, scored on the
  // "aggressive" cubic Bezier (0.1, 0, 0.9, 1).
  val PressureComfortMin = 10.0
  val PressureComfortMax = 80.0
  val PressureEmergency = 150.0

  /** (pressure score in [0,1], zone) from the mean concepts-per-ontology
    * ratio — _ecological_pressure (annealing_manager.py:1076-1117):
    * pressure rises on the Bezier curve as the ratio drifts out of the
    * comfort band in either direction. */
  def ecologicalPressure(avgConceptsPerOntology: Double): (Double, String) = {
    def curve(x: Double): Double =
      Curves.bezierYForX(math.max(0.0, math.min(1.0, x)), 0.1, 0.0, 0.9, 1.0)
    if (avgConceptsPerOntology <= 0) (0.0, "comfort")
    else if (avgConceptsPerOntology >= PressureComfortMin &&
      avgConceptsPerOntology <= PressureComfortMax) (0.0, "comfort")
    else if (avgConceptsPerOntology < PressureComfortMin) {
      val s = curve((PressureComfortMin - avgConceptsPerOntology) / PressureComfortMin)
      (s, if (s < 0.5) "tight" else "over")
    } else if (avgConceptsPerOntology >= PressureEmergency) (1.0, "emergency")
    else {
      val s = curve((avgConceptsPerOntology - PressureComfortMax) /
        (PressureEmergency - PressureComfortMax))
      val zone =
        if (s < 0.3) "watch"
        else if (s < 0.7) "tight"
        else if (s < 0.9) "over"
        else "emergency"
      (s, zone)
    }
  }

  /** One cycle's outputs: the full score table (distributed), the capped
    * proposal batch, and the ecological pressure snapshot. */
  final case class CycleResult(scores: DataFrame, proposals: DataFrame,
      pressureScore: Double, pressureZone: String)

  /** Run one annealing cycle (run_annealing_cycle minus the LLM judge —
    * score-based decisions, the reference's no-provider fallback):
    * score → candidates → open-proposal idempotency guard → cap →
    * 'approved' proposals (autonomous mode). Only the ≤maxProposals
    * batch is ever collected. */
  def annealCycle(ontologies: DataFrame, membership: DataFrame,
      sources: DataFrame, concepts: DataFrame, edges: DataFrame,
      anchoredConceptIds: Seq[String] = Seq.empty,
      openDemotions: Set[String] = Set.empty,
      openPromotions: Set[String] = Set.empty,
      currentEpoch: Long, cfg: Config = Config()): CycleResult = {
    val spark = ontologies.sparkSession
    import spark.implicits._
    val scores = scoreAll(ontologies, membership, sources, concepts, edges,
      currentEpoch).localCheckpoint(true)

    // idempotency guard (annealing_manager.py:188-205): skip targets with
    // an open (non-terminal) proposal so the graph-driven cycle doesn't
    // re-propose queued work
    val demotions = demotionCandidates(scores, cfg)
      .where(if (openDemotions.nonEmpty)
        !col("ontology").isin(openDemotions.toSeq: _*) else lit(true))
      .select(col("ontology").as("target_id"), lit(null).cast("string").as("label"),
        col("protection_score").cast("double").as("score"))
      .limit(cfg.maxProposals)
      .collect()
      .map(r => ("DEMOTE_ONTOLOGY", r.getString(0), r.getString(1), r.getDouble(2)))
    val promotions = promotionCandidates(scores, membership, concepts, edges,
        anchoredConceptIds, cfg)
      .where(if (openPromotions.nonEmpty)
        !col("concept_id").isin(openPromotions.toSeq: _*) else lit(true))
      .limit(cfg.maxProposals)
      .collect()
      .map(r => ("PROMOTE_CONCEPT", r.getString(0), r.getString(1),
        r.getLong(2).toDouble))

    val batch = (demotions ++ promotions).take(cfg.maxProposals).zipWithIndex
      .map { case ((action, target, label, score), i) =>
        (s"prop_${currentEpoch}_$i", action, target, label, score,
          "approved", currentEpoch)
      }.toSeq
    val proposals = batch.toDF("proposal_id", "action", "target_id",
      "target_label", "score", "status", "cycle_epoch")
    val avgConcepts = scores.agg(avg(col("n_concepts"))).head().getDouble(0)
    val (p, zone) = ecologicalPressure(avgConcepts)
    CycleResult(scores, proposals, p, zone)
  }

  /** Post-apply state: rewritten ontology/membership snapshots plus the
    * epoch-log events recording each executed proposal. */
  final case class ApplyResult(ontologies: DataFrame, membership: DataFrame,
      epochLog: DataFrame)

  /** Execute approved proposals as snapshot rewrites (the
    * proposal_execution_worker analog): a demotion dissolves the ontology
    * (lifecycle → 'dissolved', membership rows dropped — M6); a promotion
    * creates a new active ontology anchored at the concept (the concept's
    * id becomes `ont_<concept_id>`, membership seeded with the anchor).
    * Every executed proposal appends one 'annealing' epoch event, ids
    * from `nextEventId`. */
  def applyProposals(proposals: DataFrame, ontologies: DataFrame,
      membership: DataFrame, currentEpoch: Long,
      nextEventId: Long): ApplyResult = {
    val spark = proposals.sparkSession
    import spark.implicits._
    val batch = proposals.where(col("status") === "approved")
      .select("action", "target_id", "target_label")
      .collect() // bounded: ≤ maxProposals rows by construction
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val demoted = batch.collect { case ("DEMOTE_ONTOLOGY", id, _) => id }.toSet
    val promoted = batch.collect { case ("PROMOTE_CONCEPT", id, l) => (id, l) }

    val ontologies2 = ontologies
      .withColumn("lifecycle_state",
        when(col("ontology_id").isin(demoted.toSeq: _*), "dissolved")
          .otherwise(coalesce(col("lifecycle_state"), lit("active"))))
      .unionByName(promoted.toSeq
        .map { case (cid, label) =>
          (s"ont_$cid", label, "active", currentEpoch)
        }.toDF("ontology_id", "name", "lifecycle_state", "creation_epoch"),
        allowMissingColumns = true)
    val membership2 = membership
      .where(if (demoted.nonEmpty)
        !col("ontology").isin(demoted.toSeq: _*) else lit(true))
      .unionByName(promoted.toSeq.map { case (cid, _) => (s"ont_$cid", cid) }
        .toDF("ontology", "concept_id"))
    val epochLog = batch.zipWithIndex.map { case ((action, target, _), i) =>
      (nextEventId + i, "annealing", s"$action:$target")
    }.toSeq.toDF("event_id", "kind", "actor")
    ApplyResult(ontologies2, membership2, epochLog)
  }
}
