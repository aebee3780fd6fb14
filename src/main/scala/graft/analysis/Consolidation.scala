package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The automated vocabulary-consolidation loop — the reference's ADR-603
  * synonym pipeline closed end-to-end (lib/synonym_detector.py:1-728,
  * services/vocabulary_manager.py:287-760,1052-1090,
  * launchers/vocab_consolidation.py): detect synonym edge types by
  * embedding cosine, decide which of each pair to preserve (value score,
  * then edge count, then alphabetical — synonym_detector.py:396-446),
  * gate the batch (inverse-pair and epistemic guards,
  * vocabulary_manager.py:587-697), cap it, and apply approved merges as
  * snapshot rewrites + epoch-log events — the same propose→apply→record
  * shape as [[Annealing]].
  *
  * Everything distributed is a join or aggregation over the vocab and
  * edge tables; the vocabulary itself is a dimension table (hundreds of
  * types against a 100 TB edge table), so the pairwise cosine self-join
  * is O(|vocab|²) on a broadcast-sized input while the only edge-table
  * work is one partial-aggregated groupBy (value scores) and one
  * column rewrite (the merge). Only the ≤`maxMerges` proposal batch —
  * a policy decision, bounded by construction — reaches the driver.
  *
  * Vocab shape (FIXTURES.md §A): relationship_type, category,
  * usage_count, is_active, synonyms, embedding, epistemic_status.
  */
object Consolidation {

  /** Loop tuneables — the reference's ADR-603 thresholds
    * (synonym_detector.py:110-117, vocabulary_manager.py:587-600). */
  final case class Config(
      strongThreshold: Double = 0.90,   // auto-merge candidate
      moderateThreshold: Double = 0.70, // review band (reported, not applied)
      minSimilarity: Double = 0.80,     // prioritize floor for the batch
      maxEdgeCount: Long = 20L,         // low-frequency-first pass
      maxMerges: Int = 5)

  /** Synonym candidate pairs over the ACTIVE embedded vocabulary:
    * (type_a, type_b, similarity, strength) with type_a < type_b,
    * strength ∈ strong (≥0.90) / moderate (≥0.70) — the detector's band
    * ladder (synonym_detector.py:40-45,110-117). The self-join runs on
    * the broadcast-sized vocab dimension. */
  def synonymCandidates(vocab: DataFrame, cfg: Config = Config()): DataFrame = {
    val v = vocab
      .where(coalesce(col("is_active"), lit(true)) && col("embedding").isNotNull)
      .select(col("relationship_type"),
        col("embedding").cast("array<double>").as("emb"))
    val a = v.toDF("type_a", "a_emb")
    val b = v.toDF("type_b", "b_emb")
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("similarity", VectorOps.cosine(col("a_emb"), col("b_emb")))
      .where(col("similarity") >= cfg.moderateThreshold)
      .withColumn("strength",
        when(col("similarity") >= cfg.strongThreshold, "strong")
          .otherwise("moderate"))
      .select("type_a", "type_b", "similarity", "strength")
  }

  // Inverse-relationship heuristic: TYPE vs TYPE_BY / TYPE_TO share a base
  // after suffix strip → likely a directional pair, never a merge
  // (vocabulary_manager.py:628-634).
  private def stripInverse(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(c, "_BY", ""), "_TO", "")

  // Divergent epistemic states must not merge (ADR-610,
  // vocabulary_manager.py:643-697, mapped onto this engine's taxonomy,
  // epistemic_status_service.py bands): INSUFFICIENT_DATA blocks outright;
  // a grounded-positive type never merges with a contradicted one.
  private val positive = Seq("WELL_GROUNDED", "PARTIALLY_GROUNDED")
  private val negative = Seq("CONTRADICTED", "WEAKLY_CONTRADICTED")
  private def epistemicGate(sa: org.apache.spark.sql.Column,
      sb: org.apache.spark.sql.Column) =
    !coalesce(sa, lit("")).isin("INSUFFICIENT_DATA") &&
      !coalesce(sb, lit("")).isin("INSUFFICIENT_DATA") &&
      !(sa.isin(positive: _*) && sb.isin(negative: _*)) &&
      !(sb.isin(positive: _*) && sa.isin(negative: _*))

  /** Gate + decide + prioritize each candidate pair: drop inverse pairs
    * and epistemic conflicts, skip pairs whose rarer side is still
    * high-frequency (low-disruption-first, vocabulary_manager.py:681-686),
    * pick preserve/deprecate by value score → edge count → alphabetical
    * (synonym_detector.py:400-446), and rank by
    * `similarity·2 − min_edge_count/100` (vocabulary_manager.py:688-691).
    *
    * `valueScores` is [[Scoring.vocabularyValueScores]] over the semantic
    * edge table — the one edge-scan of the cycle, partial-aggregated. */
  def mergeRecommendations(candidates: DataFrame, vocab: DataFrame,
      valueScores: DataFrame, cfg: Config = Config()): DataFrame = {
    val scored = vocab.select(col("relationship_type"), col("epistemic_status"))
      .join(valueScores.select(col("rel_type").as("relationship_type"),
        col("edge_count"), col("value_score")), Seq("relationship_type"), "left")
      .na.fill(0L, Seq("edge_count")).na.fill(0.0, Seq("value_score"))
    def side(s: String) = scored.select(
      col("relationship_type").as(s"type_$s"),
      col("epistemic_status").as(s"status_$s"),
      col("edge_count").as(s"edges_$s"),
      col("value_score").as(s"value_$s"))
    val keepA = col("value_a") > col("value_b") ||
      (col("value_a") === col("value_b") && col("edges_a") > col("edges_b")) ||
      (col("value_a") === col("value_b") && col("edges_a") === col("edges_b"))
    // type_a < type_b by construction, so the final clause IS the
    // alphabetical tiebreak of synonym_detector.py:436-446.
    candidates
      .where(col("similarity") >= cfg.minSimilarity)
      .where(stripInverse(col("type_a")) =!= stripInverse(col("type_b")))
      .join(broadcast(side("a")), Seq("type_a"))
      .join(broadcast(side("b")), Seq("type_b"))
      .where(epistemicGate(col("status_a"), col("status_b")))
      .where(least(col("edges_a"), col("edges_b")) <= cfg.maxEdgeCount)
      .select(
        when(keepA, col("type_a")).otherwise(col("type_b")).as("preserve_type"),
        when(keepA, col("type_b")).otherwise(col("type_a")).as("deprecate_type"),
        col("similarity"),
        (col("edges_a") + col("edges_b")).as("affected_edges"),
        round(col("similarity") * 2.0 -
          least(col("edges_a"), col("edges_b")) / 100.0, 6).as("priority"))
  }

  /** One cycle's outputs: the full candidate table (distributed) and the
    * capped, conflict-free proposal batch (≤ maxMerges rows, collected). */
  final case class CycleResult(candidates: DataFrame, proposals: DataFrame)

  /** One consolidation cycle (the consolidation worker's dry-run face —
    * launchers/vocab_consolidation.py): detect → gate/decide → order by
    * priority → greedily claim so no type appears twice in one batch (a
    * chain A≈B≈C merges one link per cycle; the loop converges across
    * cycles, the reference's repeated-worker design) → cap. `openMerges`
    * is the idempotency guard: types with an in-flight proposal are
    * skipped, as in [[Annealing.annealCycle]]. */
  def consolidationCycle(vocab: DataFrame, edges: DataFrame,
      openMerges: Set[String] = Set.empty,
      currentEpoch: Long, cfg: Config = Config()): CycleResult = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val candidates = synonymCandidates(vocab, cfg)
    val recs = mergeRecommendations(candidates, vocab,
      Scoring.vocabularyValueScores(edges), cfg)
      .where(if (openMerges.nonEmpty)
        !col("preserve_type").isin(openMerges.toSeq: _*) &&
          !col("deprecate_type").isin(openMerges.toSeq: _*) else lit(true))
      .orderBy(col("priority").desc, col("deprecate_type").asc)
      // bounded: vocab is a dimension table, and the greedy claim below
      // needs sequential order — 2·maxMerges rows suffice because each
      // skipped pair burns at most two claimed types
      .limit(cfg.maxMerges * 2 + 1)
      .collect()
    val claimed = scala.collection.mutable.Set.empty[String]
    val batch = recs.iterator.flatMap { r =>
      val (p, d) = (r.getString(0), r.getString(1))
      if (claimed(p) || claimed(d)) None
      else { claimed += p; claimed += d
        Some((p, d, r.getDouble(2), r.getLong(3), r.getDouble(4))) }
    }.take(cfg.maxMerges).toSeq
    val proposals = batch.zipWithIndex.map { case ((p, d, sim, aff, pri), i) =>
      (s"merge_${currentEpoch}_$i", "MERGE_EDGE_TYPE", d, p, sim, aff, pri,
        "approved", currentEpoch)
    }.toDF("proposal_id", "action", "deprecate_type", "preserve_type",
      "similarity", "affected_edges", "priority", "status", "cycle_epoch")
    CycleResult(candidates, proposals)
  }

  /** Post-apply state: rewritten vocab/edge snapshots plus the epoch-log
    * events recording each executed merge. */
  final case class ApplyResult(vocab: DataFrame, edges: DataFrame,
      epochLog: DataFrame)

  /** Execute approved merges as snapshot rewrites (_execute_merge,
    * vocabulary_manager.py:1052-1090): every edge of a deprecated type is
    * rewritten to its preserved type (M5, [[graft.KnowledgeGraph
    * .mergeEdgeTypes]] semantics, applied as one bulk column map); the
    * deprecated vocab row goes inactive; the preserved row absorbs the
    * deprecated usage_count and gains the deprecated name as a synonym.
    * One 'consolidation' epoch event per merge, ids from `nextEventId`. */
  def applyMerges(proposals: DataFrame, vocab: DataFrame, edges: DataFrame,
      nextEventId: Long): ApplyResult = {
    val spark = proposals.sparkSession
    import spark.implicits._
    val batch = proposals.where(col("status") === "approved")
      .select("deprecate_type", "preserve_type")
      .collect() // bounded: ≤ maxMerges rows by construction
      .map(r => (r.getString(0), r.getString(1)))
    val mapping = batch.toMap
    if (mapping.isEmpty)
      return ApplyResult(vocab, edges,
        Seq.empty[(Long, String, String)].toDF("event_id", "kind", "actor"))
    val remap = mapping.foldLeft(col("rel_type")) { case (acc, (d, p)) =>
      when(col("rel_type") === d, p).otherwise(acc)
    }
    val edges2 = edges.withColumn("rel_type", remap)
    val usageOf = broadcast(vocab.select(col("relationship_type").as("__dep"),
      col("usage_count").as("__dep_usage")))
    val depUsage = mapping.keys.toSeq.toDF("__dep")
      .join(usageOf, Seq("__dep"))
      .withColumn("relationship_type",
        element_at(map(mapping.flatMap { case (d, p) =>
          Seq(lit(d), lit(p)) }.toSeq: _*), col("__dep")))
      .groupBy(col("relationship_type"))
      .agg(sum(col("__dep_usage")).as("__absorbed"),
        collect_list(col("__dep")).as("__new_syn"))
    val vocab2 = vocab
      .join(broadcast(depUsage), Seq("relationship_type"), "left")
      .withColumn("is_active",
        when(col("relationship_type").isin(mapping.keys.toSeq: _*), lit(false))
          .otherwise(coalesce(col("is_active"), lit(true))))
      .withColumn("usage_count",
        (coalesce(col("usage_count"), lit(0L)) +
          coalesce(col("__absorbed"), lit(0L))).cast("long"))
      .withColumn("synonyms",
        when(col("__new_syn").isNotNull,
          array_union(coalesce(col("synonyms"), array()),
            col("__new_syn").cast("array<string>")))
          .otherwise(col("synonyms")))
      .drop("__absorbed", "__new_syn")
    val epochLog = batch.zipWithIndex.map { case ((d, p), i) =>
      (nextEventId + i, "consolidation", s"MERGE_EDGE_TYPE:$d->$p")
    }.toSeq.toDF("event_id", "kind", "actor")
    ApplyResult(vocab2, edges2, epochLog)
  }

  /** Converged loop state after `cycles` iterations. */
  final case class LoopResult(vocab: DataFrame, edges: DataFrame,
      epochLog: DataFrame, cycles: Int)

  /** Run cycles until quiescent (no proposal survives the gates) or
    * `maxCycles` — the consolidation worker's steady-state loop. Each
    * iteration localCheckpoints the rewritten snapshots so lineage never
    * chains across cycles. */
  def consolidateLoop(vocab: DataFrame, edges: DataFrame,
      startEpoch: Long, nextEventId: Long, maxCycles: Int = 10,
      cfg: Config = Config()): LoopResult = {
    val spark = vocab.sparkSession
    import spark.implicits._
    var (v, e) = (vocab.localCheckpoint(true), edges.localCheckpoint(true))
    var log = Seq.empty[(Long, String, String)].toDF("event_id", "kind", "actor")
    var eventId = nextEventId
    var cycle = 0
    var quiescent = false
    while (cycle < maxCycles && !quiescent) {
      val res = consolidationCycle(v, e, Set.empty, startEpoch + cycle, cfg)
      val n = res.proposals.count()
      if (n == 0) quiescent = true
      else {
        val applied = applyMerges(res.proposals, v, e, eventId)
        v = applied.vocab.localCheckpoint(true)
        e = applied.edges.localCheckpoint(true)
        log = log.unionByName(applied.epochLog)
        eventId += n
        cycle += 1
      }
    }
    LoopResult(v, e, log, cycle)
  }
}
