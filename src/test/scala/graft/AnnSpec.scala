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
