package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.TextQueries

/** The standard corpus-curation chain as one facade call — the
  * composition CurationPipelineSpec proves, packaged the way a
  * training-data team would run it (the reference curates at ingest
  * time per document, api/app/lib/ingestion.py:390-507; this is the
  * set-oriented corpus-scale form):
  *
  *   quality filter (Gopher rules, q93) →
  *   exact dedup (min-id representative, q34) →
  *   near-dup clustering (MinHash-LSH → components, q36/q61) →
  *   decontamination vs an eval slice (8-gram overlap, q62) →
  *   shard + reproducible order (portable-hash, q64/q94)
  *
  * Every stage is a lazy DataFrame transform over the previous one; the
  * whole chain is one Catalyst plan per stage boundary with the same
  * shuffle shapes the individual oracle queries pin. At 100 TB each
  * stage's output would checkpoint to a table (or SnapshotStore version)
  * rather than chain lineage — callers own that choice, which is why the
  * result exposes every intermediate.
  */
object Curation {

  /** @param docs       (idCol, textCol) corpus
    * @param isEval     predicate marking held-out eval rows (they are
    *                   used for decontamination and EXCLUDED from the
    *                   curated output)
    * @param minJaccard near-dup clustering threshold
    * @param shards     output shard count
    * @param seed       training-order seed (same seed ⇒ same order)
    * @param lshMaxBucketSize skew guard forwarded to the LSH pair join */
  final case class Config(
      minJaccard: Double = 0.8,
      decontaminateNgram: Int = 8,
      shards: Int = 16,
      seed: String = "seed42",
      lshMaxBucketSize: Option[Int] = None)

  /** Per-stage outputs; `ordered` is the final curated corpus with
    * (shard, position) — deterministic for a fixed (input, config). */
  final case class Result(
      quality: DataFrame,   // idCol, signals…, passes
      afterQuality: DataFrame,
      afterExactDedup: DataFrame,
      nearDupClusters: DataFrame, // doc_id, canonical_id, cluster_size, is_canonical
      afterNearDedup: DataFrame,
      contaminationHits: DataFrame, // doc_id, n_hits, first_eval_id
      curated: DataFrame,
      ordered: DataFrame)   // idCol, shard, position

  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      isEval: org.apache.spark.sql.Column = lit(false),
      config: Config = Config()): Result = {
    val quality = TextQueries.gopherRules(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
    val kept1 = docs.join(
      quality.where(col("passes") === 1)
        .select(col("doc_id").as(idCol)), idCol)
    val kept2 = kept1.join(
      Dedup.exactDedup(kept1, idCol, textCol).select(col("rep_id").as(idCol)),
      idCol)
    val clusters = Dedup.dedupClusters(
      Dedup.minhashNearDups(kept2, idCol, textCol,
        minJaccard = config.minJaccard,
        maxBucketSize = config.lshMaxBucketSize))
    val kept3 = kept2.join(
      clusters.where(col("is_canonical") === 0)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
    // The eval n-gram side is built from the ORIGINAL corpus, not kept3:
    // quality filtering and both dedup stages can silently drop an eval
    // row (e.g. a training doc duplicates an eval doc and wins the min-id
    // tie-break), and a dropped eval row must still decontaminate — else
    // the surviving duplicate training doc is exactly the test-set leak
    // this stage exists to catch. The training side stays kept3 (only
    // surviving training docs need flagging).
    val evalSide = docs.where(isEval)
      .select(col(idCol), col(textCol), lit(true).as("__eval"))
    val trainSide = kept3.where(!isEval)
      .select(col(idCol), col(textCol), lit(false).as("__eval"))
    val hits = Dedup.decontaminationHits(
      trainSide.unionByName(evalSide), idCol, textCol, col("__eval"),
      config.decontaminateNgram)
    val curated = kept3.where(!isEval)
      .join(hits.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
    val ordered = curated.select(
        col(idCol),
        (Dedup.portableHash60(col(idCol).cast("string")) % config.shards)
          .as("shard"),
        Dedup.portableHash60(
          concat(lit(config.seed + ":"), col(idCol).cast("string")))
          .as("__ok"))
      .withColumn("position", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__ok"), col(idCol)))
        .cast("long"))
      .drop("__ok")
    Result(quality, kept1, kept2, clusters, kept3, hits, curated, ordered)
  }
}
