package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    // Same single-sourced session as Bench/Verify (GraftSession) — BenchOne
    // previously lacked the extensions, so its timings missed the band-
    // pruning and optimizer-rule surface the bench runs.
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
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
