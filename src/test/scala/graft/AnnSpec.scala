package graft

import org.apache.spark.sql.functions._
import graft.similarity.Ann
import graft.sources.Tables

/** ANN tiers: brute-force exactness, IVF recall under probing, LSH
  * candidate soundness, batched top-k join. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)
    .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    .cache()
  lazy val query: Seq[Double] = emb.where($"vec_id" === 0)
    .select("emb").as[Seq[Double]].head()

  test("brute force top-k is exact and deterministically ordered") {
    val top = Ann.bruteForceTopK(emb.where($"vec_id" > 0), "vec_id", "emb", query, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(top.map(-_._2).toSeq == top.map(-_._2).sorted.toSeq) // desc by sim
    // exactness vs a driver-side scan
    val all = emb.where($"vec_id" > 0).select("vec_id", "emb")
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = all.map { case (id, v) => (id, cos(v, query)) }
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    assert(top.map(_._1).toSet == expected)
  }

  test("IVF with all cells probed equals brute force; fewer probes trade recall") {
    val centroids = emb.where($"vec_id" < 8).orderBy("vec_id")
      .select("emb").as[Seq[Double]].collect().toSeq
    val cells = Ann.assignCells(emb.where($"vec_id" > 0), "emb", centroids).cache()
    val exact = Ann.bruteForceTopK(emb.where($"vec_id" > 0), "vec_id", "emb", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val full = Ann.ivfTopK(cells, "vec_id", "emb", centroids, query, 10, nprobe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact) // all probes = exhaustive
    val partial = Ann.ivfTopK(cells, "vec_id", "emb", centroids, query, 10, nprobe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(partial.intersect(exact).size >= 3) // meaningful recall at 3/8 cells
    assert(partial.size == 10)
  }

  test("LSH near-neighbor candidates are verified (no false positives)") {
    val pairs = Ann.lshNearNeighbors(emb.limit(200), "vec_id", "emb",
        dim = 64, bits = 8, minCosine = 0.2)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect()
    assert(pairs.forall(_._3 >= 0.2)) // exact verify step holds
    assert(pairs.forall(p => p._1 < p._2))
  }

  // Planted-cluster corpus for the trained-IVF recall contract: kc
  // well-separated directions in `dim` dims, 80 points each with small
  // deterministic jitter (no RNG — reruns are bit-identical).
  private val pDim = 12
  private val pK = 6
  private def planted() = {
    val rows = for { a <- 0 until pK; j <- 0 until 80 } yield {
      val id = a * 80 + j
      val v = Seq.tabulate(pDim) { i =>
        (if (i == 2 * a || i == 2 * a + 1) 1.0 else 0.0) +
          0.05 * (((id * 31 + i * 7) % 11) - 5) / 5.0
      }
      (id.toLong, v)
    }
    rows.toDF("vid", "v")
  }

  test("trainCentroids is seeded-deterministic and separates planted clusters") {
    val corpus = planted()
    val c1 = Ann.trainCentroids(corpus, "v", k = pK, iters = 4, seed = 7L)
    val c2 = Ann.trainCentroids(corpus, "v", k = pK, iters = 4, seed = 7L)
    assert(c1 === c2, "same seed + corpus must reproduce centroids exactly")
    assert(c1.size === pK && c1.forall(_.size === pDim))
    // Trained cells must be balanced: every planted cluster captured by
    // some centroid, so each cell holds roughly one cluster's 80 points.
    val sizes = Ann.assignCells(corpus, "v", c1)
      .groupBy("cell").count().select("count").as[Long].collect()
    assert(sizes.length === pK, "no trained cell may come up empty")
    assert(sizes.forall(n => n >= 40 && n <= 160),
      s"trained cells should be near-balanced, got ${sizes.toSeq.sorted}")
  }

  test("trained IVF recall@10 >= 0.9 at nprobe=2 on the planted corpus") {
    val corpus = planted().cache()
    val cents = Ann.trainCentroids(corpus, "v", k = pK, iters = 4, seed = 7L)
    val cells = Ann.assignCells(corpus, "v", cents).cache()
    // One query per planted cluster, jittered off every corpus point.
    val recalls = (0 until pK).map { a =>
      val q = Seq.tabulate(pDim) { i =>
        (if (i == 2 * a || i == 2 * a + 1) 1.0 else 0.0) +
          0.03 * (((a * 13 + i * 5) % 7) - 3) / 3.0
      }
      val exact = Ann.bruteForceTopK(corpus, "vid", "v", q, 10)
        .select("vid").as[Long].collect().toSet
      val approx = Ann.ivfTopK(cells, "vid", "v", cents, q, 10, nprobe = 2)
        .select("vid").as[Long].collect().toSet
      approx.intersect(exact).size / 10.0
    }
    val mean = recalls.sum / pK
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 (per-query: $recalls)")
  }

  test("batched top-k join returns k rows per query, ranked") {
    val queries = emb.where($"vec_id" < 3).select(
      $"vec_id".as("qid"), $"emb".as("qv"))
    val out = Ann.topKJoin(emb.where($"vec_id" >= 3), "vec_id", "emb",
        queries, "qid", "qv", k = 5)
      .select("query_id", "rn").as[(Long, Int)].collect()
    assert(out.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map(0L -> 5, 1L -> 5, 2L -> 5))
  }
}
