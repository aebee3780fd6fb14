package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's registered queries; each key
  * has (where SQL-expressible) a DuckDB oracle in `oracleSql`. Query modules:
  *  - [[RelationalQueries]] — scans/filters/joins/aggs/windows/topk/setops
  *  - [[GraphQueries]]      — BFS/shortest-path/degree/subgraph on an edge view
  *  - [[VectorQueries]]     — cosine top-k, kNN join, centroids, polarity
  *  - [[TextQueries]]       — tokens, quality, lang-id, fingerprint, TF-IDF
  *  - [[DedupQueries]]      — exact/minhash/simhash/jaccard near-dup
  *  - [[PipelineQueries]]   — sessionization, multimodal plumbing, chunking
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (GraphQueries.queries, GraphQueries.oracles),
      (VectorQueries.queries, VectorQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (ScoringQueries.queries, ScoringQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Composes the reference's §3.1+§3.2 flow shape: scored scan → top-k →
    * join-enrich → grouped confidence aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val q = VectorQueries.queryVector(spark, dir)
    emb
      .withColumn("sim", graft.functions.VectorOps.cosine(col("embedding"), q))
      .where(col("sim").isNotNull)
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("sim")), 6).as("avg_sim"))
      .orderBy(col("label"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
