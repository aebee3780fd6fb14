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

  test("perplexity clamp matches the reference formula") {
    // embedding_projection_service.py:702-709
    assert(Projection.effectivePerplexity(30, 200) == 30)
    assert(Projection.effectivePerplexity(30, 40) == 13)   // (40-1)//3
    assert(Projection.effectivePerplexity(30, 10) == 3)    // (10-1)//3 = 3 < 5, max(2,3)
    assert(Projection.effectivePerplexity(30, 4) == 2)     // (4-1)//3 = 1 -> max(2,1)=2
    assert(Projection.effectivePerplexity(30, 3) == 2)     // capped at n-1 irrelevant, floor 2
  }

  test("t-SNE keeps planted clusters separated and is deterministic") {
    // two well-separated 16-D gaussian blobs; a faithful embedding keeps
    // intra-cluster distances well under inter-cluster distances
    val rnd = new scala.util.Random(7)
    def blob(tag: String, center: Double, n: Int) =
      (1 to n).map(i => (f"$tag$i%02d",
        Seq.tabulate(16)(_ => center + rnd.nextGaussian() * 0.05)))
    val df = (blob("a", 0.0, 30) ++ blob("b", 5.0, 30)).toDF("id", "v")
    val run1 = Projection.tsne(df, "id", "v", dims = 2, perplexity = 10,
      iterations = 350, seed = 42L)
    val coords = run1.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(coords.size == 60)
    assert(coords.values.forall { case (a, b) => !a.isNaN && !b.isNaN })
    def dist(p: (Double, Double), q: (Double, Double)) =
      math.sqrt(math.pow(p._1 - q._1, 2) + math.pow(p._2 - q._2, 2))
    val as = coords.filter(_._1.startsWith("a")).values.toSeq
    val bs = coords.filter(_._1.startsWith("b")).values.toSeq
    def meanIntra(s: Seq[(Double, Double)]) =
      (for (i <- s.indices; j <- i + 1 until s.size) yield dist(s(i), s(j)))
        .sum / (s.size * (s.size - 1) / 2)
    val inter = (for (p <- as; q <- bs) yield dist(p, q)).sum / (as.size * bs.size)
    assert(meanIntra(as) < inter / 2, s"intra=${meanIntra(as)} inter=$inter")
    assert(meanIntra(bs) < inter / 2, s"intra=${meanIntra(bs)} inter=$inter")
    // deterministic: same seed, same coordinates
    val run2 = Projection.tsne(df, "id", "v", dims = 2, perplexity = 10,
      iterations = 350, seed = 42L)
    assert(run2.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).sameElements(
        run1.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1)))
  }

  test("UMAP keeps planted clusters separated and is deterministic") {
    // same planted geometry as the t-SNE test: two well-separated 16-D
    // blobs must stay separated in the embedding, and a fixed seed must
    // reproduce coordinates exactly
    val rnd = new scala.util.Random(9)
    def blob(tag: String, center: Double, n: Int) =
      (1 to n).map(i => (f"$tag$i%02d",
        Seq.tabulate(16)(_ => center + rnd.nextGaussian() * 0.05)))
    val df = (blob("a", 0.0, 30) ++ blob("b", 5.0, 30)).toDF("id", "v")
    val run1 = Projection.umap(df, "id", "v", dims = 2, nNeighbors = 10,
      epochs = 150, seed = 42L)
    val coords = run1.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(coords.size == 60)
    assert(coords.values.forall { case (a, b) => !a.isNaN && !b.isNaN })
    def dist(p: (Double, Double), q: (Double, Double)) =
      math.sqrt(math.pow(p._1 - q._1, 2) + math.pow(p._2 - q._2, 2))
    val as = coords.filter(_._1.startsWith("a")).values.toSeq
    val bs = coords.filter(_._1.startsWith("b")).values.toSeq
    def meanIntra(s: Seq[(Double, Double)]) =
      (for (i <- s.indices; j <- i + 1 until s.size) yield dist(s(i), s(j)))
        .sum / (s.size * (s.size - 1) / 2)
    val inter = (for (p <- as; q <- bs) yield dist(p, q)).sum / (as.size * bs.size)
    assert(meanIntra(as) < inter / 2, s"intra=${meanIntra(as)} inter=$inter")
    assert(meanIntra(bs) < inter / 2, s"intra=${meanIntra(bs)} inter=$inter")
    val run2 = Projection.umap(df, "id", "v", dims = 2, nNeighbors = 10,
      epochs = 150, seed = 42L)
    assert(run2.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).sameElements(
        run1.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1)))
  }

  test("UMAP curve fit reproduces the published (a, b) for the defaults") {
    // umap-learn's find_ab_params(1.0, 0.1) ≈ (1.577, 0.8951)
    val (a, b) = graft.analysis.UmapKernel.fitCurve(minDist = 0.1, spread = 1.0)
    assert(math.abs(a - 1.577) < 0.05, s"a=$a")
    assert(math.abs(b - 0.8951) < 0.02, s"b=$b")
  }

  test("facade projectConcepts umap path: coords + cluster for every concept") {
    def v(x: Double, y: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    val concepts = ((1 to 5).map(i => (s"a$i", s"alpha $i", v(1.0 + i * 0.01, 0))) ++
      (1 to 5).map(i => (s"b$i", s"beta $i", v(0, 1.0 + i * 0.01))))
      .toDF("concept_id", "label", "embedding")
    val edges = Seq(("a1", "b1", "SUPPORTS", Some(1.0)))
      .toDF("src", "dst", "rel_type", "confidence")
    val kg = KnowledgeGraph(spark, concepts, edges,
      evidence = Seq.empty[(String, String)].toDF("concept_id", "source_id"),
      instances = Seq.empty[(String, String, String)]
        .toDF("instance_id", "concept_id", "quote"),
      vocab = Seq(("SUPPORTS", v(1, 0))).toDF("relationship_type", "embedding"))
    val out = kg.projectConcepts(eps = 0.0, minPts = 2, algorithm = "umap")
    assert(out.columns.toSet == Set("id", "p0", "p1", "p2", "cluster"))
    assert(out.where(col("p0").isNaN).count() == 0)
    assert(out.count() == 10)
  }

  test("suggestEps: 40th-percentile k-NN distance with the 1%-range floor") {
    // uniform 1-D line, k=3 INCLUDING self (sklearn kneighbors semantics):
    // interior points' kth distance is 1.0, endpoints' is 2.0; the sorted
    // kth array is eight 1.0s then two 2.0s, so the 40th percentile is 1.0
    val line = (1 to 10).map(i => (s"p$i", i * 1.0, 0.0)).toDF("id", "x", "y")
    val eps = Projection.suggestEps(line, Seq("x", "y"), minPts = 3)
    assert(math.abs(eps - 1.0) < 1e-9, s"eps=$eps")
    // degenerate: all points identical -> floor 1e-6
    val same = (1 to 6).map(i => (s"s$i", 1.0, 1.0)).toDF("id", "x", "y")
    assert(Projection.suggestEps(same, Seq("x", "y"), minPts = 3) == 1e-6)
  }

  test("facade projectConcepts tsne path: coords + cluster for every concept") {
    def v(x: Double, y: Double): Seq[Float] =
      Seq(x.toFloat, y.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    val concepts = ((1 to 5).map(i => (s"a$i", s"alpha $i", v(1.0 + i * 0.01, 0))) ++
      (1 to 5).map(i => (s"b$i", s"beta $i", v(0, 1.0 + i * 0.01))))
      .toDF("concept_id", "label", "embedding")
    val edges = Seq(("a1", "b1", "SUPPORTS", Some(1.0)))
      .toDF("src", "dst", "rel_type", "confidence")
    val kg = KnowledgeGraph(spark, concepts, edges,
      evidence = Seq.empty[(String, String)].toDF("concept_id", "source_id"),
      instances = Seq.empty[(String, String, String)]
        .toDF("instance_id", "concept_id", "quote"),
      vocab = Seq(("SUPPORTS", v(1, 0))).toDF("relationship_type", "embedding"))
    val out = kg.projectConcepts(eps = 0.0, minPts = 2, algorithm = "tsne")
    assert(out.columns.toSet == Set("id", "p0", "p1", "p2", "cluster"))
    assert(out.where(col("p0").isNaN).count() == 0)
    assert(out.count() == 10)
  }
}
