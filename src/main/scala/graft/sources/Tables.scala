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

  /** `events.ts` arrives in whatever physical type the writer chose —
    * parquet TIMESTAMP(NANOS) (read as long nanos under the legacy flag),
    * TIMESTAMP_NTZ (Spark 4.x infers `isAdjustedToUTC=false` `timestamp[us]`
    * as NTZ), or plain TIMESTAMP. Normalize all three to microsecond
    * TimestampType at the loader so downstream `unix_micros`/window calls
    * never see a foreign temporal type. The session timezone is pinned UTC
    * in every main/spec, so the NTZ→TIMESTAMP cast is an exact
    * reinterpretation. Long nanos truncate by integer division (a double
    * round-trip would lose precision above 2^53 ns); matches DuckDB's
    * `ts::TIMESTAMP`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
