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
}
