package graft

import graft.graph.{GraphOps, GraphXOps}

/** GraphX backends, differentially tested against the DataFrame BFS (the
  * reference's own strongest test idea — two implementations of the same
  * operator compared, SURVEY §5). */
class GraphXOpsSpec extends SparkSpec {
  import spark.implicits._

  val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), // component 1: a-b-c-d
    ("x", "y"),                         // component 2: x-y
    ("solo1", "solo1")                  // self-loop component
  ).toDF("src", "dst")

  test("connected components find the three components with min-name ids") {
    val cc = GraphXOps.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(cc("a") == "a" && cc("b") == "a" && cc("c") == "a" && cc("d") == "a")
    assert(cc("x") == "x" && cc("y") == "x")
    assert(cc("solo1") == "solo1")
  }

  test("oriented-wedge triangle counts agree with GraphX TriangleCount") {
    val rnd = new scala.util.Random(29)
    val es = Seq.fill(120)((s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
      .toDF("src", "dst") // dups + self-loops included: both must be ignored
    val df = GraphOps.triangleCounts(es)
      .as[(String, Long)].collect().toMap
    val gx = GraphXOps.triangleCount(es)
      .as[(String, Long)].collect().toMap
    assert(df == gx)
    assert(df.nonEmpty, "fixture must actually contain triangles")
  }

  test("union-find accelerator agrees with GraphX components (differential)") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(40)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
      .toDF("src", "dst")
    val viaGraphX = GraphXOps.connectedComponents(es)
      .as[(String, String)].collect().toMap
    val viaUnionFind = GraphXOps.connectedComponentsAuto(es)
      .as[(String, String)].collect().toMap
    assert(viaGraphX == viaUnionFind)
  }

  test("deterministic PageRank agrees with GraphX message passing") {
    val rnd = new scala.util.Random(13)
    val es = Seq.fill(60)((s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    val df = GraphOps.pageRank(es, iterations = 5)
      .as[(String, Double)].collect().toMap
    val gx = GraphXOps.pageRank(es, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(df.keySet == gx.keySet)
    // GraphX's static PageRank rescales final ranks to sum to n
    // (SPARK-18847 sink correction); the iteration itself is identical, so
    // the two agree after applying the same normalization.
    val scale = df.size / df.values.sum
    df.foreach { case (n, r) =>
      assert(math.abs(r * scale - gx(n)) < 1e-8,
        s"node $n: df=$r (scaled ${r * scale}) gx=${gx(n)}")
    }
    // deterministic loop is exactly reproducible run-to-run
    val again = GraphOps.pageRank(es, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(df == again)
  }

  test("driver-accel PageRank is BIT-IDENTICAL to the DataFrame loop") {
    // the accel replays the decimal-staged arithmetic exactly — strict ==,
    // no tolerance, across random multigraph shapes incl. dangling nodes
    for (seed <- Seq(3, 29, 57)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(80)((s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
        .toDF("src", "dst") // duplicates + self-loops allowed on purpose
      val dist = GraphOps.pageRank(es, iterations = 4)
        .as[(String, Double)].collect().toMap
      val accel = GraphOps.pageRankAuto(es, iterations = 4)
        .as[(String, Double)].collect().toMap
      assert(dist == accel, s"seed $seed")
    }
  }

  test("PageRank dispatch paths agree on null-endpoint edges and id types") {
    // a null endpoint must be dropped by BOTH paths (the accel skips it at
    // load; the distributed loop filters explicitly), and numeric ids must
    // come back as the same (string) node type from both
    val es = Seq((null.asInstanceOf[String], "a"), ("a", "b"), ("b", null))
      .toDF("src", "dst")
    val dist = GraphOps.pageRank(
        es.select($"src".cast("string"), $"dst".cast("string")), iterations = 2)
      .as[(String, Double)].collect().toMap
    val accel = GraphOps.pageRankAuto(es, iterations = 2)
      .as[(String, Double)].collect().toMap
    assert(dist == accel)
    assert(accel.keySet == Set("a", "b")) // no phantom null node
    val numeric = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val viaAccel = GraphOps.pageRankAuto(numeric, iterations = 1)
    assert(viaAccel.schema("node").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(viaAccel.as[(String, Double)].collect().toMap.keySet ==
      Set("1", "2", "3"))
  }

  test("PageRank hand check: star graph center accumulates leaf mass") {
    // leaves l1..l4 -> center; one iteration: center = 0.15 + 0.85*4*(1/1)
    val star = (1 to 4).map(i => (s"l$i", "center")).toDF("src", "dst")
    val r1 = GraphOps.pageRank(star, iterations = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r1("center") - (0.15 + 0.85 * 4.0)) < 1e-12)
    assert(math.abs(r1("l1") - 0.15) < 1e-12) // no incoming
  }

  test("Pregel hop distances agree with the DataFrame BFS (differential)") {
    val fromPregel = GraphXOps.pregelHops(edges, "a", maxDepth = 5)
      .as[(String, Int)].collect().toMap
    val fromBfs = GraphOps.bfs(edges, Seq("a"), 5, GraphOps.Both)
      .select("node", "distance").as[(String, Int)].collect().toMap
    assert(fromPregel == fromBfs)
  }

  test("Pregel depth cap truncates like BFS maxDepth") {
    val capped = GraphXOps.pregelHops(edges, "a", maxDepth = 1)
      .as[(String, Int)].collect().toMap
    assert(capped == Map("a" -> 0, "b" -> 1))
  }
}
