package graft

import graft.analysis.Consolidation
import graft.analysis.Consolidation.Config
import org.apache.spark.sql.functions._

/** The automated vocabulary-consolidation loop (reference ADR-603/610:
  * SynonymDetector + VocabularyManager + the consolidation worker):
  * detect → gate → preserve-decision → greedy batch → merge-apply →
  * epoch record, looped to quiescence.
  *
  * The vocab fixture plants:
  *  - CAUSES ≈ RESULTS_IN (cosine ≈ 0.998, strong) — the canonical merge;
  *    CAUSES has more edges so it must be preserved
  *  - VERIFIED ≈ VERIFIED_BY (near-identical embeddings) — inverse pair,
  *    must be SKIPPED despite the similarity
  *  - SUPPORTS ≈ REFUTES_MAYBE — blocked: WELL_GROUNDED vs CONTRADICTED
  *  - NEW_TYPE (INSUFFICIENT_DATA) near SUPPORTS — blocked outright
  *  - ENABLES ⊥ CAUSES (orthogonal) — never a candidate
  */
class ConsolidationSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double, y: Double, z: Double): Seq[Float] =
    Seq(x.toFloat, y.toFloat, z.toFloat, 0f)

  private val vocab = Seq(
    ("CAUSES",        "causal",  30L, true, Seq.empty[String], v(1, 0.02, 0), "WELL_GROUNDED"),
    ("RESULTS_IN",    "causal",  10L, true, Seq.empty[String], v(1, 0.00, 0), "PARTIALLY_GROUNDED"),
    ("VERIFIED",      "logical",  5L, true, Seq.empty[String], v(0, 1, 0.01), "WELL_GROUNDED"),
    ("VERIFIED_BY",   "logical",  4L, true, Seq.empty[String], v(0, 1, 0.00), "WELL_GROUNDED"),
    ("SUPPORTS",      "logical",  8L, true, Seq.empty[String], v(0.7, 0.7, 0), "WELL_GROUNDED"),
    ("REFUTES_MAYBE", "logical",  6L, true, Seq.empty[String], v(0.7, 0.71, 0), "CONTRADICTED"),
    ("NEW_TYPE",      "logical",  0L, true, Seq.empty[String], v(0.7, 0.69, 0), "INSUFFICIENT_DATA"),
    ("ENABLES",       "causal",  12L, true, Seq.empty[String], v(0, 0, 1), "WELL_GROUNDED")
  ).toDF("relationship_type", "category", "usage_count", "is_active",
    "synonyms", "embedding", "epistemic_status")

  private val edges = (
    (1 to 12).map(i => (s"a$i", s"b$i", "CAUSES", 0.9)) ++
      (1 to 4).map(i => (s"c$i", s"d$i", "RESULTS_IN", 0.8)) ++
      (1 to 3).map(i => (s"e$i", s"f$i", "SUPPORTS", 0.7)) ++
      (1 to 2).map(i => (s"g$i", s"h$i", "ENABLES", 0.95))
    ).toDF("src", "dst", "rel_type", "confidence")

  test("candidates: bands, and orthogonal types never pair") {
    val c = Consolidation.synonymCandidates(vocab).collect()
    val byPair = c.map(r => (r.getString(0), r.getString(1)) -> r.getString(3)).toMap
    assert(byPair(("CAUSES", "RESULTS_IN")) == "strong")
    assert(byPair.contains(("VERIFIED", "VERIFIED_BY"))) // detected, gated later
    assert(!byPair.keys.exists { case (a, b) => a == "ENABLES" || b == "ENABLES" })
  }

  test("gates: inverse pair, epistemic conflict, insufficient data all blocked") {
    val recs = Consolidation.mergeRecommendations(
      Consolidation.synonymCandidates(vocab), vocab,
      graft.analysis.Scoring.vocabularyValueScores(edges)).collect()
    val pairs = recs.map(r => (r.getString(1), r.getString(0))).toSet // (dep, pres)
    assert(!pairs.exists { case (d, p) => Set(d, p) == Set("VERIFIED", "VERIFIED_BY") },
      "inverse _BY pair must be skipped")
    assert(!pairs.exists { case (d, p) => d == "REFUTES_MAYBE" || p == "REFUTES_MAYBE" },
      "WELL_GROUNDED vs CONTRADICTED must be blocked")
    assert(!pairs.exists { case (d, p) => d == "NEW_TYPE" || p == "NEW_TYPE" },
      "INSUFFICIENT_DATA must be blocked")
    assert(pairs.contains(("RESULTS_IN", "CAUSES")),
      "higher value score (more edges) side must be preserved")
  }

  test("preserve decision falls through: value score, then edges, then name") {
    // identical value scores (no edges at all) → alphabetical tiebreak
    val tieVocab = Seq(
      ("AAA_TYPE", "c", 0L, true, Seq.empty[String], v(1, 0, 0), "WELL_GROUNDED"),
      ("BBB_TYPE", "c", 0L, true, Seq.empty[String], v(1, 0.001, 0), "WELL_GROUNDED")
    ).toDF("relationship_type", "category", "usage_count", "is_active",
      "synonyms", "embedding", "epistemic_status")
    val noEdges = Seq.empty[(String, String, String, Double)]
      .toDF("src", "dst", "rel_type", "confidence")
    val recs = Consolidation.mergeRecommendations(
      Consolidation.synonymCandidates(tieVocab), tieVocab,
      graft.analysis.Scoring.vocabularyValueScores(noEdges)).collect()
    assert(recs.length == 1)
    assert(recs.head.getString(0) == "AAA_TYPE") // preserve
    assert(recs.head.getString(1) == "BBB_TYPE") // deprecate
  }

  test("cycle is a dry run: proposals capped + conflict-free, state untouched") {
    val res = Consolidation.consolidationCycle(vocab, edges, currentEpoch = 7L)
    val props = res.proposals.collect()
    assert(props.nonEmpty && props.length <= Config().maxMerges)
    // no type claimed twice within the batch
    val types = props.flatMap(r => Seq(r.getString(2), r.getString(3)))
    assert(types.distinct.length == types.length)
    assert(props.forall(_.getString(7) == "approved"))
    assert(props.forall(_.getLong(8) == 7L))
    // dry run: nothing rewritten
    assert(vocab.where(!col("is_active")).count() == 0)
  }

  test("apply: edges rewritten, deprecated inactive, usage absorbed, synonym recorded, epoch logged") {
    val res = Consolidation.consolidationCycle(vocab, edges, currentEpoch = 7L)
    val applied = Consolidation.applyMerges(res.proposals, vocab, edges,
      nextEventId = 100L)
    // RESULTS_IN edges now ride CAUSES
    assert(applied.edges.where(col("rel_type") === "RESULTS_IN").count() == 0)
    assert(applied.edges.where(col("rel_type") === "CAUSES").count() == 16)
    assert(applied.edges.count() == edges.count(), "merge must not drop edges")
    val causes = applied.vocab.where(col("relationship_type") === "CAUSES").head()
    assert(causes.getAs[Boolean]("is_active"))
    assert(causes.getAs[Long]("usage_count") == 40L) // 30 + absorbed 10
    assert(causes.getSeq[String](causes.fieldIndex("synonyms")).contains("RESULTS_IN"))
    val dep = applied.vocab.where(col("relationship_type") === "RESULTS_IN").head()
    assert(!dep.getAs[Boolean]("is_active"))
    val log = applied.epochLog.orderBy("event_id").collect()
    assert(log.head.getLong(0) == 100L)
    assert(log.exists(r => r.getString(1) == "consolidation" &&
      r.getString(2) == "MERGE_EDGE_TYPE:RESULTS_IN->CAUSES"))
  }

  test("loop: runs to quiescence, is idempotent, detector no longer fires") {
    val result = Consolidation.consolidateLoop(vocab, edges,
      startEpoch = 7L, nextEventId = 100L)
    assert(result.cycles >= 1)
    // quiescent: a fresh cycle on the merged state proposes nothing
    val again = Consolidation.consolidationCycle(result.vocab, result.edges,
      currentEpoch = 99L)
    assert(again.proposals.count() == 0)
    // the merged pair is one active type; every event id unique
    val active = result.vocab.where(col("is_active")).select("relationship_type")
      .as[String].collect().toSet
    assert(active.contains("CAUSES") && !active.contains("RESULTS_IN"))
    val ids = result.epochLog.select("event_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
  }

  test("open-merge idempotency guard skips in-flight targets") {
    val res = Consolidation.consolidationCycle(vocab, edges,
      openMerges = Set("CAUSES"), currentEpoch = 7L)
    val types = res.proposals.collect()
      .flatMap(r => Seq(r.getString(2), r.getString(3)))
    assert(!types.contains("CAUSES"))
  }
}
