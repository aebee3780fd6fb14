package graft

import org.apache.spark.sql.functions._
import graft.analysis.{ChunkSearch, Scoring}

/** V2 chunk search: best-chunk-per-source window, top-k, scope filter,
  * concept enrichment; plus the authenticated-diversity gate (A6). */
class ChunkSearchSpec extends SparkSpec {
  import spark.implicits._

  def v(x: Double, y: Double): Seq[Double] = Seq(x, y, 0.0, 0.0)

  val chunks = Seq(
    ("s1", 0, "s1 chunk0", v(1.0, 0.0)),
    ("s1", 1, "s1 chunk1", v(0.9, 0.1)),
    ("s2", 0, "s2 chunk0", v(0.0, 1.0)),
    ("s2", 1, "s2 chunk1", v(0.7, 0.7)),
    ("s3", 0, "s3 chunk0", v(-1.0, 0.0))
  ).toDF("source_id", "chunk_index", "chunk_text", "embedding")

  val query = Seq(1.0, 0.0, 0.0, 0.0)

  test("returns the best chunk per source, ranked by similarity (W3 + K1)") {
    val out = ChunkSearch.search(chunks, query, topK = 10, minSimilarity = 0.0)
      .select("source_id", "best_chunk_index", "similarity")
      .as[(String, Int, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("s1", "s2")) // s3 below threshold
    assert(out.head == (("s1", 0, 1.0))) // exact match wins over 0.9-sim sibling
    val s2 = out(1)
    assert(s2._2 == 1) // s2's diagonal chunk beats its orthogonal chunk0
  }

  test("source scope restricts the scan (the reference's source_ids param)") {
    val out = ChunkSearch.search(chunks, query, topK = 10,
        sourceScope = Some(Seq("s2", "s3")))
      .select("source_id").as[String].collect().toSeq
    assert(out == Seq("s2"))
  }

  test("concept enrichment groups concepts per source (J4)") {
    val cbs = Seq(
      ("s1", "c1", "alpha"), ("s1", "c2", "beta"), ("s2", "c3", "gamma"))
      .toDF("source_id", "concept_id", "label")
    val out = ChunkSearch.enrichWithConcepts(
      ChunkSearch.search(chunks, query, topK = 10), cbs)
    val m = out.select("source_id", "concepts.concept_id")
      .as[(String, Seq[String])].collect().toMap
    assert(m("s1") == Seq("c1", "c2"))
    assert(m("s2") == Seq("c3"))
  }

  test("authenticated diversity gates by grounding magnitude (A6)") {
    val df = Seq(
      (0.9, 0.8),   // well grounded → keeps most diversity
      (0.1, 0.8),   // weakly grounded → gated down
      (-0.9, 0.8)). // contradicted → negative
      toDF("g", "d")
    val out = df.select(round(Scoring.authenticatedDiversity($"g", $"d"), 4))
      .as[Double].collect()
    assert(math.abs(out(0) - 0.6) < 1e-9)     // 0.9/1.2 × 0.8
    assert(math.abs(out(1) - 0.2) < 1e-9)     // 0.1/0.4 × 0.8
    assert(math.abs(out(2) + 0.6) < 1e-9)     // sign follows grounding
  }
}
