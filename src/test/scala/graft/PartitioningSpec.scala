package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-mechanics evidence: salted aggregation/join correctness, bucketed
  * co-located joins planning without a shuffle exchange, and AQE presence
  * in the bench session config. */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals plain sum under heavy key skew") {
    val df = (Seq.fill(5000)(("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("s"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(df, "k", "v", saltBuckets = 16)
      .as[(String, Double)].collect().toMap
    assert(salted == plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val fact = (Seq.fill(2000)("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "rowid")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = fact.join(dim, "k").select("rowid", "attr")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", saltBuckets = 8)
      .select("rowid", "attr").as[(Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // stale dirs survive across JVMs (DROP only knows this session's catalog)
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lines").foreach { t =>
      val d = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    graft.sources.Tables.orders(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    graft.sources.Tables.lineitem(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lines")
    // force the sort-merge path (tiny test tables would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lines")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      assert(joined.count() ==
        graft.sources.Tables.lineitem(spark, sf0001).count())
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: SortMergeJoin with NO shuffle exchange on either side
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("broadcast threshold switches the frontier join automatically") {
    // the BFS frontier join uses an explicit broadcast hint; verify the
    // planner honors it (BroadcastHashJoin in the hop plan)
    val edges = (1 to 200).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val frontier = Seq("n1").toDF("f")
    val hop = edges.join(broadcast(frontier), $"src" === $"f")
    assert(hop.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("bucketId normalizes signed zeros like Spark's hash partitioning") {
    // Reviewed-and-refuted hazard, pinned durably: a -0.0 join key must
    // land in (and runtime-prune to) the SAME bucket as +0.0, or a
    // bucketed float/double key would silently lose rows under DPP.
    // Spark's Murmur3HashFunction normalizes the zero (SPARK-32110), so
    // writer repartition, the V2 bucket function, and runtime bucket
    // pruning all agree by construction — this pin fails if a Spark
    // upgrade ever changes that.
    import org.apache.spark.sql.graftbridge.GraftBucketFunction
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    (2 to 64).foreach { n =>
      assert(GraftBucketFunction.bucketId(-0.0d, DoubleType, n) ==
        GraftBucketFunction.bucketId(0.0d, DoubleType, n))
      assert(GraftBucketFunction.bucketId(-0.0f, FloatType, n) ==
        GraftBucketFunction.bucketId(0.0f, FloatType, n))
    }
  }
}
