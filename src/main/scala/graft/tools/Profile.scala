package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query profiler: times two runs and prints the ADAPTIVE final plan
  * (explain after an action, so AQE re-plans are visible). Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 runMain graft.tools.Profile q26_knn_pairs
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      df.count()
      println(f"[profile] $q first  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // Same per-run litter control as Bench: without it a checkpoint-heavy
      // query poisons every later measurement in this JVM.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val df2 = graft.SparkEntry.queries(q)(spark, dir)
      val t1 = System.nanoTime()
      df2.count()
      println(f"[profile] $q second ${(System.nanoTime() - t1) / 1e9}%.2f s")
      println(df2.queryExecution.executedPlan.toString.take(12000))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
