package graft

import graft.analysis.Annealing
import graft.analysis.Annealing.Config
import org.apache.spark.sql.functions._

/** The annealing policy loop (reference ADR-200: annealing_worker +
  * AnnealingManager + OntologyScorer): protection scoring, the two
  * candidate finders with their cadence floors, the Bezier pressure
  * zones, the open-proposal idempotency guard, and the full
  * propose → apply → epoch-record round-trip. */
class AnnealingSpec extends SparkSpec {
  import spark.implicits._

  def v(x: Double, y: Double): Seq[Float] =
    Seq(x.toFloat, y.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)

  // Three ontologies at epoch 60:
  //  - BigCoherent: 10 tightly-aligned concepts, young-ish (epoch 55,
  //    age 5 ≥ floor 3) → protected; holds the degree-10 hub "Hub Theory"
  //  - WeakOld: 5 orthogonal concepts (coherence 0), born at epoch 0
  //    (age 60 → heavy exposure) → protection < 0.15 → demotion candidate
  //  - TinyYoung: 2 concepts, born at epoch 59 (age 1 < floor) → skipped
  //    by the cadence floors despite a terrible score
  val ontologies = Seq(
    ("BigCoherent", "big coherent", "active", 55L),
    ("WeakOld", "weak old", "active", 0L),
    ("TinyYoung", "tiny young", "active", 59L)
  ).toDF("ontology_id", "name", "lifecycle_state", "creation_epoch")

  val bigIds = (1 to 10).map(i => f"big$i%02d")
  val weakIds = (1 to 5).map(i => s"weak$i")
  val membership = (
    bigIds.map(("BigCoherent", _)) ++
      weakIds.map(("WeakOld", _)) ++
      Seq(("TinyYoung", "tiny1"), ("TinyYoung", "tiny2"))
    ).toDF("ontology", "concept_id")

  val sources = Seq(("BigCoherent", "srcA"), ("BigCoherent", "srcB"),
    ("WeakOld", "srcC")).toDF("ontology", "source_id")

  val concepts = (
    bigIds.zipWithIndex.map { case (id, i) =>
      val label = if (id == "big01") "Hub Theory" else s"big concept $i"
      (id, label, v(1.0, 0.02 * i))
    } ++
      // orthogonal-ish pairs → near-zero mean pairwise cosine
      weakIds.zipWithIndex.map { case (id, i) =>
        (id, s"weak concept $i", if (i % 2 == 0) v(1, 0) else v(-1, 0.001))
      } ++
      Seq(("tiny1", "tiny one", v(0, 1)), ("tiny2", "tiny two", v(0, -1)))
    ).toDF("concept_id", "label", "embedding")

  // star around big01: total degree 9 + 2 = 11 ≥ the floor of 10
  val edges = (
    bigIds.drop(1).map(o => ("big01", o, "SUPPORTS")) ++
      Seq(("big02", "big01", "SUPPORTS"), ("big03", "big01", "SUPPORTS"),
        ("weak1", "weak2", "SUPPORTS"))
    ).toDF("src", "dst", "rel_type")

  lazy val scores = Annealing.scoreAll(ontologies, membership, sources,
    concepts, edges, currentEpoch = 60L)

  test("protection scoring: coherent+young protected, scattered+old eroded") {
    val byOnt = scores.collect().map(r => r.getAs[String]("ontology") -> r).toMap
    assert(byOnt.size == 3)
    val weak = byOnt("WeakOld")
    val big = byOnt("BigCoherent")
    assert(big.getAs[Double]("coherence") > 0.9)  // tight cluster
    assert(math.abs(weak.getAs[Double]("coherence")) < 0.3) // orthogonal pairs
    assert(weak.getAs[Double]("raw_exposure") > 0.5) // age 60 → 60/110
    assert(weak.getAs[Double]("protection_score") < 0.15)
    assert(big.getAs[Double]("protection_score") >
      weak.getAs[Double]("protection_score"))
    assert(byOnt("TinyYoung").getAs[Long]("n_concepts") == 2L)
  }

  test("cadence floors gate candidates; pinned ontologies are immune") {
    val d = Annealing.demotionCandidates(scores, Config())
      .select("ontology").as[String].collect().toSeq
    assert(d == Seq("WeakOld")) // TinyYoung fails both floors
    // pinned lifecycle exempts even a failing ontology
    val pinned = Annealing.demotionCandidates(
      scores.withColumn("lifecycle_state", lit("pinned")), Config())
    assert(pinned.isEmpty)
  }

  test("promotion finds the high-degree hub, skips anchors and name collisions") {
    val p = Annealing.promotionCandidates(scores, membership, concepts, edges,
        anchoredConceptIds = Seq.empty, Config())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p.map(_._1).toSeq == Seq("big01"))
    assert(p.head._2 == "Hub Theory" && p.head._3 == 11L)
    // already-anchored concepts are not re-proposed
    assert(Annealing.promotionCandidates(scores, membership, concepts, edges,
      anchoredConceptIds = Seq("big01"), Config()).isEmpty)
    // a label colliding with an existing ontology name is skipped
    val colliding = concepts.withColumn("label",
      when(col("concept_id") === "big01", "Weak Old").otherwise(col("label")))
    assert(Annealing.promotionCandidates(scores, membership, colliding, edges,
      anchoredConceptIds = Seq.empty, Config()).isEmpty)
  }

  test("ecological pressure follows the Bezier curve with zone bands") {
    assert(Annealing.ecologicalPressure(40.0) == ((0.0, "comfort")))
    assert(Annealing.ecologicalPressure(0.0) == ((0.0, "comfort")))
    assert(Annealing.ecologicalPressure(200.0) == ((1.0, "emergency")))
    // midpoint of the over-band: aggressive Bezier is symmetric → 0.5
    val (mid, midZone) = Annealing.ecologicalPressure(115.0)
    assert(math.abs(mid - 0.5) < 1e-6 && midZone == "tight")
    // under-fragmentation also pressures, with its own zone split
    val (under, underZone) = Annealing.ecologicalPressure(5.0)
    assert(math.abs(under - 0.5) < 1e-6 && underZone == "over")
    // monotone on the rising flank
    assert(Annealing.ecologicalPressure(90.0)._1 <
      Annealing.ecologicalPressure(140.0)._1)
  }

  test("cycle → apply → epoch-record round-trip with idempotency guard") {
    val cycle = Annealing.annealCycle(ontologies, membership, sources,
      concepts, edges, currentEpoch = 60L)
    val props = cycle.proposals.collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(5))).toSet
    assert(props == Set(
      ("DEMOTE_ONTOLOGY", "WeakOld", "approved"),
      ("PROMOTE_CONCEPT", "big01", "approved")))
    // avg concepts/ontology = (10+5+2)/3 ≈ 5.67 < comfort min 10 → the
    // under-fragmentation flank at position 0.433 → curve ≈ 0.43 → "tight"
    assert(cycle.pressureZone == "tight")
    assert(cycle.pressureScore > 0.0 && cycle.pressureScore < 0.5)

    // a second cycle with these proposals open proposes nothing new
    val guarded = Annealing.annealCycle(ontologies, membership, sources,
      concepts, edges,
      openDemotions = Set("WeakOld"), openPromotions = Set("big01"),
      currentEpoch = 61L)
    assert(guarded.proposals.isEmpty)

    // apply: demotion dissolves, promotion creates the anchored ontology,
    // every executed proposal is epoch-recorded
    val applied = Annealing.applyProposals(cycle.proposals, ontologies,
      membership, currentEpoch = 60L, nextEventId = 100L)
    val states = applied.ontologies
      .select("ontology_id", "lifecycle_state")
      .as[(String, String)].collect().toMap
    assert(states("WeakOld") == "dissolved")
    assert(states("ont_big01") == "active")
    assert(applied.ontologies.where(col("ontology_id") === "ont_big01")
      .select("name").head().getString(0) == "Hub Theory")
    val m2 = applied.membership.as[(String, String)].collect().toSet
    assert(!m2.exists(_._1 == "WeakOld"))
    assert(m2.contains(("ont_big01", "big01")))
    val log = applied.epochLog.orderBy("event_id")
      .as[(Long, String, String)].collect()
    assert(log.length == 2)
    assert(log.forall(_._2 == "annealing"))
    assert(log.map(_._1).toSeq == Seq(100L, 101L))
  }
}
