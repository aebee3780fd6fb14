package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalWindow

/** GlobalWindow.rankedRunningSum — the scalable stand-in for a
  * single-partition `Window.orderBy`: must agree with the naive global
  * window exactly, while keeping the data-bearing window partitioned. */
class GlobalWindowSpec extends SparkSpec {
  import spark.implicits._

  test("rankedRunningSum matches the single-partition global window exactly") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(500)((s"k${rnd.nextInt(10000)}", rnd.nextInt(100).toLong))
      .toDF("key", "n")
      .dropDuplicates("key") // total order needs a unique sort key
      .repartition(8)        // arbitrary placement going in
    val fast = GlobalWindow.rankedRunningSum(
        df, Seq(col("n").desc, col("key").asc), col("n"),
        "rank", "cum", "total")
      .select("key", "n", "rank", "cum", "total")
      .as[(String, Long, Long, Long, Long)].collect().toSet

    val w = Window.orderBy(col("n").desc, col("key").asc)
    val naive = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select("key", "n", "rank", "cum", "total")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(fast == naive)
  }

  test("the data-bearing window is partitioned; only the stats window is global") {
    val df = spark.range(1000)
      .select(col("id").as("key"), (col("id") % 7).as("n"))
    val plan = GlobalWindow.rankedRunningSum(
        df, Seq(col("key").asc), col("n"), "rank", "cum", "total")
      .queryExecution.executedPlan.toString
    // Two Window nodes: the per-partition ranked pass (partitionBy __pid)
    // and the offsets window over per-partition stats (~numPartitions
    // rows). The ranked pass must carry the partition spec.
    assert(plan.contains("windowspecdefinition(__pid#"),
      "ranked pass must window within __pid partitions:\n" + plan)
  }
}
