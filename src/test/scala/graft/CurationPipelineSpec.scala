package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.TextQueries
import graft.sources.Tables

/** End-to-end corpus curation over real testdata: the full training-data
  * chain — quality filter → exact dedup → near-dup clustering →
  * decontamination → shard + order assignment — composed exactly as a
  * user of the library would write it, with conservation invariants at
  * every stage. Each stage is individually oracle-checked (q93, q34,
  * q36/q61, q62, q64/q94); this spec proves they COMPOSE: monotone
  * shrinkage, no phantom rows, a dense deterministic final ordering. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("filter -> dedup -> cluster -> decontaminate -> shard composes soundly") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .localCheckpoint(true)
    val all = ids(docs)

    // 1. Gopher quality filter
    val kept1 = docs.join(
      TextQueries.gopherRules(docs).where($"passes" === 1).select("doc_id"),
      "doc_id")
    val s1 = ids(kept1)
    assert(s1.subsetOf(all) && s1.nonEmpty)

    // 2. Exact dedup: keep each fingerprint's min-id representative
    val reps = Dedup.exactDedup(kept1, "doc_id", "text")
      .select($"rep_id".as("doc_id"))
    val kept2 = kept1.join(reps, "doc_id")
    val s2 = ids(kept2)
    assert(s2.subsetOf(s1) && s2.nonEmpty)

    // 3. Near-dup clustering: drop non-canonical cluster members
    val clusters = Dedup.dedupClusters(
      Dedup.minhashNearDups(kept2, "doc_id", "text", minJaccard = 0.35))
    val dropNearDups = clusters.where($"is_canonical" === 0)
      .select($"doc_id")
    val kept3 = kept2.join(dropNearDups, Seq("doc_id"), "left_anti")
    val s3 = ids(kept3)
    assert(s3.subsetOf(s2) && s3.nonEmpty)
    // every clustered doc came from the live set, and each cluster kept
    // exactly its canonical member
    assert(ids(clusters.select("doc_id")).subsetOf(s2))
    assert(ids(clusters.where($"is_canonical" === 1).select("doc_id"))
      .subsetOf(s3))

    // 4. Decontamination: drop training docs sharing 8-grams with the
    // pseudo-eval slice (every 97th doc)
    // Eval n-grams come from the ORIGINAL corpus (an eval row dropped by
    // quality/dedup must still decontaminate); training side is kept3.
    val isEval = $"doc_id" % 97 === 0
    val evalSide = docs.where(isEval)
      .select($"doc_id", $"text", lit(true).as("eval"))
    val trainSide = kept3.where(!isEval)
      .select($"doc_id", $"text", lit(false).as("eval"))
    val hits = Dedup.decontaminationHits(
      trainSide.unionByName(evalSide), "doc_id", "text", $"eval", n = 8)
    val kept4 = kept3.where(!isEval)
      .join(hits.select("doc_id"), Seq("doc_id"), "left_anti")
    val s4 = ids(kept4)
    assert(s4.subsetOf(s3))
    assert(s4.forall(_ % 97 != 0)) // eval rows are not training data

    // 5. Shard + reproducible order: a PARTITION of the survivors —
    // every doc exactly one (shard, position), positions dense per shard
    val ordered = kept4.select(
        $"doc_id",
        (Dedup.portableHash60($"doc_id".cast("string")) % 4).as("shard"),
        Dedup.portableHash60(concat(lit("seed42:"), $"doc_id".cast("string")))
          .as("ok"))
      .withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"shard")
          .orderBy($"ok", $"doc_id")))
      .localCheckpoint(true)
    assert(ordered.count() == s4.size)
    assert(ids(ordered.select("doc_id")) == s4)
    val dense = ordered.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"position").as("maxp"))
      .where($"n" =!= $"maxp").count()
    assert(dense == 0L, "positions are dense 1..n within every shard")

    // 6. Determinism: the whole chain reruns to the identical final set
    val rerun = kept3.where(!isEval)
      .join(hits.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(ids(rerun) == s4)

    // 7. The Curation facade runs the same chain to the same result
    val r = graft.pipeline.Curation.curate(docs,
      isEval = isEval,
      config = graft.pipeline.Curation.Config(
        minJaccard = 0.35, shards = 4, seed = "seed42"))
    assert(ids(r.afterQuality) == s1)
    assert(ids(r.afterExactDedup) == s2)
    assert(ids(r.afterNearDedup) == s3)
    assert(ids(r.curated) == s4)
    val facadeOrder = r.ordered
      .select($"doc_id", $"shard", $"position")
      .as[(Long, Long, Long)].collect().toSet
    val manualOrder = ordered
      .select($"doc_id", $"shard", $"position".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(facadeOrder == manualOrder)
  }

  test("decontamination survives an eval row deduplicated away by a training twin") {
    // A training doc that exactly duplicates an eval doc WINS the min-id
    // dedup tie-break, deleting the eval row before the decontamination
    // stage. Its n-grams must still count as eval content — otherwise the
    // surviving duplicate ships into the curated corpus: the precise
    // test-set leak the stage exists to prevent.
    def passing(tag: String): String = // clears every Gopher rule
      "the and " + (0 until 60).map(i => // letters only: the tokenizer
        s"tok$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}") // drops digits
        .mkString(" ")
    val shared = passing("dup")
    val docs = Seq(
      1L  -> shared,          // training twin (min id ⇒ dedup keeps it)
      97L -> shared,          // eval row (97 % 97 == 0), dropped by dedup
      2L  -> passing("clean") // uncontaminated training doc
    ).toDF("doc_id", "text")
    val r = graft.pipeline.Curation.curate(docs, isEval = $"doc_id" % 97 === 0)
    assert(ids(r.afterExactDedup) == Set(1L, 2L)) // eval row is gone pre-hits
    assert(ids(r.contaminationHits.select("doc_id")) == Set(1L))
    assert(ids(r.curated) == Set(2L))
  }
}
