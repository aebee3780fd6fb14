package graft

import org.apache.spark.sql.functions._
import graft.analysis.Projection

/** PCA + grid-DBSCAN (the V8 substitution): projection shape, variance
  * ordering, and DBSCAN cluster/noise semantics on planted geometry. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("PCA projects to k components") {
    val df = graft.sources.Tables.embeddings(spark, sf0001).limit(100)
    val p = Projection.pca(df, "vec_id", "embedding", k = 3)
    assert(p.columns.toSeq == Seq("id", "p0", "p1", "p2"))
    assert(p.count() == 100)
    // components are ordered by explained variance
    val vars = p.agg(variance($"p0"), variance($"p1"), variance($"p2"))
      .head().toSeq.map(_.asInstanceOf[Double])
    assert(vars(0) >= vars(1) && vars(1) >= vars(2))
  }

  test("DBSCAN separates two dense blobs and flags isolated noise") {
    // blob A around (0,0), blob B around (10,10), one noise point far away
    val pts =
      (1 to 20).map(i => (s"a$i", i % 5 * 0.1, i / 5 * 0.1)) ++
        (1 to 20).map(i => (s"b$i", 10.0 + i % 5 * 0.1, 10.0 + i / 5 * 0.1)) :+
        (("noise1", 50.0, 50.0))
    val df = pts.toDF("id", "x", "y")
    val out = Projection.dbscan(df, "id", Seq("x", "y"), eps = 0.5, minPts = 4)
      .as[(String, String)].collect().toMap
    val aClusters = (1 to 20).map(i => out(s"a$i")).toSet
    val bClusters = (1 to 20).map(i => out(s"b$i")).toSet
    assert(aClusters.size == 1 && bClusters.size == 1)
    assert(aClusters != bClusters)
    assert(out("noise1") == "-1")
  }

  test("DBSCAN border points join a core's cluster") {
    // dense line of cores plus one border point within eps of the edge core
    val pts = (1 to 10).map(i => (s"c$i", i * 0.3, 0.0)) :+ (("border", 3.4, 0.0))
    val out = Projection.dbscan(pts.toDF("id", "x", "y"), "id", Seq("x", "y"),
        eps = 0.5, minPts = 3)
      .as[(String, String)].collect().toMap
    assert(out("border") != "-1")
    assert(out("border") == out("c10"))
  }
}
