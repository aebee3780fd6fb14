package graft.analysis

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** V2 source-chunk search (reference api/app/routes/queries.py:350-462,
  * 863-1017): score chunk embeddings against the query vector, keep the
  * best chunk per source (W3 window), top-k by that best similarity, then
  * enrich each source with its concepts grouped into one array (J4 —
  * the reference's N+1-killer batch, graph_facade.py:890-924).
  *
  * chunks: (source_id, chunk_index, chunk_text, embedding);
  * conceptsBySource: (source_id, concept_id, label).
  */
object ChunkSearch {

  def search(
      chunks: DataFrame,
      queryVec: Seq[Double],
      topK: Int = 10,
      minSimilarity: Double = 0.0,
      sourceScope: Option[Seq[String]] = None): DataFrame = {
    val q = VectorOps.vecLit(queryVec)
    val scoped = sourceScope match {
      case Some(ids) => chunks.where(col("source_id").isin(ids: _*))
      case None      => chunks
    }
    val w = Window.partitionBy(col("source_id"))
      .orderBy(col("similarity").desc, col("chunk_index").asc)
    scoped
      .withColumn("similarity", VectorOps.cosine(col("embedding"), q))
      .where(col("similarity") >= minSimilarity)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1) // W3: best chunk per source
      .orderBy(col("similarity").desc, col("source_id").asc)
      .limit(topK)
      .select(col("source_id"), col("chunk_index").as("best_chunk_index"),
        col("chunk_text").as("best_chunk_text"),
        round(col("similarity"), 6).as("similarity"))
  }

  /** J4 enrichment: one row per source with its concepts as a sorted array
    * of (concept_id, label) structs. */
  def enrichWithConcepts(bestChunks: DataFrame,
      conceptsBySource: DataFrame): DataFrame =
    bestChunks.join(conceptsBySource, Seq("source_id"), "left")
      .groupBy(bestChunks.columns.map(col).toIndexedSeq: _*)
      .agg(array_sort(collect_list(
        struct(col("concept_id"), col("label")))).as("concepts"))
}
