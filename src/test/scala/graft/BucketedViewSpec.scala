package graft

import org.apache.spark.sql.functions._
import graft.core.SnapshotStore
import graft.graph.BucketedView

/** The GENERIC incrementally-maintained bucketed view (r19):
  * [[AdjacencyStoreSpec]] pins the adjacency instance end to end; this
  * spec pins the generalization on the OTHER graph-twin shape — q115's
  * dst-bucketed edge projection — so "by the same mechanics" is a
  * tested property of the machinery, not a doc claim. */
class BucketedViewSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(q: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(all)
    }
    q.collect()
    all(q.queryExecution.executedPlan).count(_.isInstanceOf[Exchange])
  }

  test("dst-bucketed edge view (q115's shape) maintains incrementally; dst aggregation stays zero-exchange and exact") {
    val r = java.nio.file.Files.createTempDirectory("graft-bview").toString
    val store = new SnapshotStore(spark, r)
    store.commit("edges", Seq(("a", "x", 0.9), ("b", "x", 0.8), ("a", "y", 0.7))
      .toDF("src", "dst", "confidence"))
    // the q115 projection: per-row (distributes over union), dst-bucketed
    val project = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("src"), col("dst"))
    val v1 = BucketedView.refresh(store, "edges", "edges_by_dst",
      project, Seq("dst"), Seq(4))
    assert(store.bucketLayoutOf("edges_by_dst", v1)
      .contains((Seq("dst"), Seq(4))))
    assert(store.resolvedProps("edges_by_dst", v1)(BucketedView.HorizonProp)
      .toLong == store.latestVersion("edges").get)

    // two incremental batches, one no-op refresh in between
    store.append("edges", Seq(("c", "y", 0.6), ("d", "z", 0.5))
      .toDF("src", "dst", "confidence"))
    val v2 = BucketedView.refresh(store, "edges", "edges_by_dst",
      project, Seq("dst"), Seq(4))
    assert(v2 != v1)
    assert(BucketedView.refresh(store, "edges", "edges_by_dst",
      project, Seq("dst"), Seq(4)) == v2, "fresh view refresh is a no-op")
    store.append("edges", Seq(("e", "x", 0.4)).toDF("src", "dst", "confidence"))
    BucketedView.refresh(store, "edges", "edges_by_dst",
      project, Seq("dst"), Seq(4))

    // the degree-by-dst aggregation (q115's first pipeline stage) over
    // the maintained view: no shuffle, values match the recompute
    spark.conf.set("spark.sql.catalog.bview",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bview.root", r)
    withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = spark.table("bview.edges_by_dst")
        .groupBy(col("dst")).agg(count(lit(1)).as("deg"))
      assert(exchanges(q) == 0,
        "dst-degree over the maintained dst-bucketed view must not shuffle")
      assert(q.collect().toSeq.sortBy(_.getString(0))
        == project(store.read("edges")).groupBy(col("dst"))
          .agg(count(lit(1)).as("deg")).collect().toSeq.sortBy(_.getString(0)),
        "maintained view aggregation matches the recompute")
    }

    // a source DELETE is metadata-detected: rebuild, still exact
    store.delete("edges", col("dst") === "x")
    BucketedView.refresh(store, "edges", "edges_by_dst",
      project, Seq("dst"), Seq(4))
    assert(store.read("edges_by_dst").count() == store.read("edges").count(),
      "a non-append source mutation rebuilds the projection exactly")
  }
}
