package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Freshness, SnapshotStore}
import graft.ingest.IngestPipeline

/** The reference's full write→read lifecycle as one integration flow
  * (§3's bonus lifecycle: ingest → match-or-create → epoch bump →
  * invalidation → fresh reads), wired through the round-2 pieces:
  * IngestPipeline (chunk/extract/match), SnapshotStore (versioned commit,
  * pinned readers), Freshness (epoch-keyed derivations), KnowledgeGraph
  * (query surface over the committed snapshot). */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  // Must match the production epoch-log schema ingestBatch appends to —
  // allowMissingColumns would silently mask a bogus fixture shape here.
  private def emptyTables: (DataFrame, DataFrame, DataFrame, DataFrame) = (
    Seq.empty[(String, String, Seq[Float])].toDF("concept_id", "label", "embedding"),
    Seq.empty[(String, String, String)].toDF("instance_id", "concept_id", "quote"),
    Seq.empty[(String, String, String, Double)].toDF("src", "dst", "rel_type", "confidence"),
    Seq.empty[(Long, String, String)].toDF("event_id", "kind", "actor"))

  test("ingest → snapshot commit → freshness-gated reads across two batches") {
    val store = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft-lifecycle").toString)
    val (c0, i0, e0, l0) = emptyTables

    // batch 1: two documents
    val r1 = IngestPipeline.ingestBatch(spark,
      Seq(("d1", "alpha beta gamma. beta gamma delta."),
          ("d2", "alpha beta gamma epsilon.")).toDF("doc_id", "text"),
      c0, i0, e0, l0, batchEpoch = 1L)
    store.commit("concepts", r1.concepts)
    store.commit("edges", r1.edges)
    val v1 = store.commit("epoch_log", r1.epochLog)
    assert(r1.createdCount > 0)

    // freshness clock = committed epoch_log version; derivation = degrees
    val fresh = new Freshness(() => store.latestVersion("epoch_log").getOrElse(0L))
    var computes = 0
    fresh.register("degrees") {
      computes += 1
      graph.GraphOps.degrees(store.read("edges"))
    }
    val degAtV1 = fresh.get("degrees").count()
    fresh.get("degrees")
    assert(computes == 1) // cached within the epoch

    // a reader pinned BEFORE batch 2 must not see batch 2
    val pinnedConcepts = store.read("concepts")
    val conceptsAtV1 = pinnedConcepts.count()

    // batch 2: overlapping + new content, built on the committed snapshot
    val r2 = IngestPipeline.ingestBatch(spark,
      Seq(("d3", "alpha beta gamma. zeta eta theta.")).toDF("doc_id", "text"),
      store.read("concepts"), r1.instances, store.read("edges"),
      store.read("epoch_log"), batchEpoch = 2L)
    assert(r2.matchedCount > 0) // overlap resolved against batch-1 concepts
    store.commit("concepts", r2.concepts)
    store.commit("edges", r2.edges)
    store.commit("epoch_log", r2.epochLog)

    assert(pinnedConcepts.count() == conceptsAtV1) // snapshot isolation
    assert(store.read("concepts").count() > conceptsAtV1)
    assert(store.latestVersion("epoch_log").contains(v1 + 1))

    // the clock advanced → the derivation recomputes over the new edges
    val degAtV2 = fresh.get("degrees").count()
    assert(computes == 2)
    assert(degAtV2 >= degAtV1)

    // the query surface runs over the committed snapshot
    val kg = KnowledgeGraph(spark,
      concepts = store.read("concepts"),
      edges = store.read("edges"),
      evidence = r2.instances.select(col("concept_id"),
        concat(lit("s"), col("concept_id")).as("source_id")),
      instances = r2.instances,
      vocab = r2.edges.select(col("rel_type").as("relationship_type")).distinct()
        .withColumn("embedding", expr("array(1.0d, 0.0d)")))
    assert(kg.degrees(topN = 5).count() > 0)
    assert(kg.stats().head().getLong(0) == store.read("concepts").count())
  }

  test("annealing cycle runs against committed snapshots and advances the clock") {
    import graft.analysis.Annealing
    val store = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft-anneal").toString)
    // committed fixture state at epoch 60: one failing old ontology, one
    // healthy one holding a promotable hub
    store.commit("ontologies", Seq(
      ("Healthy", "healthy", "active", 55L),
      ("Failing", "failing", "active", 0L)
    ).toDF("ontology_id", "name", "lifecycle_state", "creation_epoch"))
    val bigIds = (1 to 10).map(i => f"h$i%02d")
    store.commit("membership",
      (bigIds.map(("Healthy", _)) ++ (1 to 5).map(i => ("Failing", s"f$i")))
        .toDF("ontology", "concept_id"))
    store.commit("concepts", (
      bigIds.map(id => (id, if (id == "h01") "Hub Concept" else s"c $id",
        Seq(1f, 0.01f))) ++
        (1 to 5).map(i => (s"f$i", s"fc $i",
          if (i % 2 == 0) Seq(1f, 0f) else Seq(-1f, 0.001f)))
      ).toDF("concept_id", "label", "embedding"))
    store.commit("edges",
      (bigIds.drop(1).map(o => ("h01", o, "SUPPORTS")) ++
        Seq(("h02", "h01", "SUPPORTS"), ("h03", "h01", "SUPPORTS")))
        .toDF("src", "dst", "rel_type"))
    store.commit("epoch_log",
      Seq((60L, "ingestion", "setup")).toDF("event_id", "kind", "actor"))

    def clock: Long = store.read("epoch_log")
      .agg(org.apache.spark.sql.functions.max("event_id")).head().getLong(0)
    assert(clock == 60L)

    // cycle over the COMMITTED snapshots (pinned reads)
    // three sources keep Healthy's mass high enough that aging from epoch
    // 60 to 62 (plus the affinity pull of the newly-promoted neighbor)
    // doesn't erode its protection below the demotion threshold — the
    // erosion itself is verified in AnnealingSpec
    val sources = Seq(("Healthy", "sA"), ("Healthy", "sB"), ("Healthy", "sC"),
      ("Failing", "sD")).toDF("ontology", "source_id")
    val cycle = Annealing.annealCycle(
      store.read("ontologies"), store.read("membership"), sources,
      store.read("concepts"), store.read("edges"), currentEpoch = clock)
    val actions = cycle.proposals.select("action", "target_id")
      .as[(String, String)].collect().toSet
    assert(actions == Set(("DEMOTE_ONTOLOGY", "Failing"),
      ("PROMOTE_CONCEPT", "h01")))

    // apply as snapshot rewrites + epoch append — the M5-M7 discipline
    val applied = Annealing.applyProposals(cycle.proposals,
      store.read("ontologies"), store.read("membership"),
      currentEpoch = clock, nextEventId = clock + 1)
    store.commit("ontologies", applied.ontologies)
    store.commit("membership", applied.membership)
    store.append("epoch_log", applied.epochLog)
    assert(clock == 62L) // two executed proposals advanced the clock

    // the committed state reflects the cycle; a re-run proposes nothing
    // (the failing ontology is dissolved, the hub now anchors an ontology)
    val rerun = Annealing.annealCycle(
      store.read("ontologies"), store.read("membership"), sources,
      store.read("concepts"), store.read("edges"),
      anchoredConceptIds = Seq("h01"), currentEpoch = clock)
    assert(rerun.proposals.isEmpty)
  }
}
