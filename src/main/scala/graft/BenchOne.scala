package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 is deprecated and carries no parquet stats; micros keeps
      // snapshot-store writes zone-map-prunable (FileStats) and smaller.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench's AQE shuffled-hash rewrite so single-query timings
      // measure the same session the bench runs
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Mirror Bench's per-run litter sweep so persisted/cached blocks never
    // carry between timed runs — each timing computes from the parquet.
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache() // see Bench.sweep
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    args.foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[benchone] $q first  ${(System.nanoTime()-t0)/1e9}%.2f s")
      sweep()
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[benchone] $q second ${(System.nanoTime()-t1)/1e9}%.2f s")
      sweep()
    }
    spark.stop()
  }
}
