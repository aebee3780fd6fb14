package graft.tools

/** Final-adaptive-plan inspector: EXECUTES the named queries in the same
  * session Bench runs (GraftSession) and prints the post-AQE executed plan
  * — join strategies, AQEShuffleRead coalescing and runtime broadcast
  * conversions are only visible here, never in Explain's pre-execution
  * plan. Usage: runMain graft.tools.PlanDump [sfDir] [query ...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      println(p)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
