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
