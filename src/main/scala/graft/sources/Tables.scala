package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog over the driver-provided testdata
  * (TESTDATA.md). Mirrors the reference's store layer: node/edge tables in
  * Parquet instead of Postgres heap + AGE agtype
  * (reference: schema/00_baseline.sql:26-33, api/app/lib/age_client/base.py:291-316).
  *
  * Every loader is a plain parquet scan so Catalyst gets predicate pushdown,
  * column pruning and partition pruning for free — at 100 TB the scan IS the
  * query cost, so nothing here materializes or collects.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog cache: resolving a parquet relation reads footers/schema; with
  // 49 registered queries each re-opening its inputs, caching the resolved
  // DataFrame per (session, path) removes that repeated setup cost. The
  // testdata is immutable (read-only), so no invalidation is needed.
  private val relationCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default; read it as long nanos and truncate to microsecond
    * TimestampType (integer division — a double round-trip would lose
    * precision above 2^53 ns). Matches DuckDB's `ts::TIMESTAMP` cast. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
