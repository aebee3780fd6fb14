package graft

import org.apache.spark.sql.DataFrame
import graft.graph.GraphOps
import graft.graph.GraphOps._

/** BFS/path/degree invariants on the reference Rust core's test topologies
  * (graph-accel/core/src/traversal.rs:630-705): chain, star, cycle,
  * self-loop, parallel edges, disconnected component — plus the
  * confidence-filter NULL-passes sentinel and min-distance semantics. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  def edges(es: (String, String)*): DataFrame =
    es.toDF("src", "dst")

  def edgesC(es: (String, String, String, java.lang.Double)*): DataFrame =
    es.toDF("src", "dst", "rel_type", "confidence")

  def distances(df: DataFrame): Map[String, Int] =
    df.select("node", "distance").as[(String, Int)].collect().toMap

  test("chain: distances increase linearly, capped by maxDepth") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val d = distances(GraphOps.bfs(e, Seq("a"), 3, Outgoing))
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
  }

  test("star: all leaves at distance 1; incoming direction reverses") {
    val e = edges("hub" -> "l1", "hub" -> "l2", "hub" -> "l3")
    val out = distances(GraphOps.bfs(e, Seq("hub"), 2, Outgoing))
    assert(out == Map("hub" -> 0, "l1" -> 1, "l2" -> 1, "l3" -> 1))
    val in = distances(GraphOps.bfs(e, Seq("hub"), 2, Incoming))
    assert(in == Map("hub" -> 0))
    val leafIn = distances(GraphOps.bfs(e, Seq("l1"), 2, Incoming))
    assert(leafIn == Map("l1" -> 0, "hub" -> 1))
  }

  test("cycle terminates with min distances (no infinite loop)") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "a")
    val d = distances(GraphOps.bfs(e, Seq("a"), 10, Outgoing))
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("self-loop and parallel edges don't inflate distances or degrees") {
    val e = edges("a" -> "a", "a" -> "b", "a" -> "b")
    val d = distances(GraphOps.bfs(e, Seq("a"), 3, Outgoing))
    assert(d == Map("a" -> 0, "b" -> 1))
    val deg = GraphOps.degrees(e).where($"node" === "a")
      .select("out_degree").as[Long].head()
    assert(deg == 3) // parallel edges each count (reference counts rows)
  }

  test("disconnected component unreachable; missing start yields only start") {
    val e = edges("a" -> "b", "x" -> "y")
    val d = distances(GraphOps.bfs(e, Seq("a"), 5, Both))
    assert(d == Map("a" -> 0, "b" -> 1))
    assert(GraphOps.shortestPath(e, "a", "y", 5).isEmpty)
    val ghost = distances(GraphOps.bfs(e, Seq("zzz"), 3, Both))
    assert(ghost == Map("zzz" -> 0))
  }

  test("NULL confidence passes the filter; low confidence pruned (F5)") {
    val e = edgesC(
      ("a", "b", "SUPPORTS", null),
      ("a", "c", "SUPPORTS", 0.4),
      ("a", "d", "SUPPORTS", 0.9))
    val d = distances(GraphOps.bfs(e, Seq("a"), 1, Outgoing, minConfidence = Some(0.5)))
    assert(d == Map("a" -> 0, "b" -> 1, "d" -> 1))
  }

  test("rel-type filter pre-join (F4/F6)") {
    val e = edgesC(
      ("a", "b", "SUPPORTS", 1.0),
      ("a", "c", "CONTRADICTS", 1.0))
    val d = distances(GraphOps.bfs(e, Seq("a"), 1, Outgoing,
      relTypes = Some(Seq("SUPPORTS"))))
    assert(d == Map("a" -> 0, "b" -> 1))
  }

  test("min-distance dedup across multiple paths (W2)") {
    // a->b->c and a->c: c must be at distance 1, not 2
    val e = edges("a" -> "b", "b" -> "c", "a" -> "c")
    val d = distances(GraphOps.bfs(e, Seq("a"), 3, Outgoing))
    assert(d("c") == 1)
  }

  test("shortest path reconstructs the node sequence") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "x", "x" -> "d")
    val Some((hops, path)) = GraphOps.shortestPath(e, "a", "d", 5, Outgoing)
    assert(hops == 2)
    assert(path == Seq("a", "x", "d"))
  }

  test("k shortest paths excludes prior edges (T3 fallback contract)") {
    val e = edges("a" -> "b", "b" -> "d", "a" -> "c", "c" -> "d")
    val paths = GraphOps.kShortestPaths(e, "a", "d", maxHops = 4, maxPaths = 3, Outgoing)
    assert(paths.size == 2)
    assert(paths.forall(_._1 == 2))
    assert(paths.map(_._2).distinct.size == 2)
  }

  test("induced subgraph keeps only edges with both endpoints reachable (J8)") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "far", "far" -> "beyond")
    val sub = GraphOps.inducedSubgraph(e, "a", 2, Outgoing)
      .as[(String, String)].collect().toSet
    assert(sub == Set("a" -> "b", "b" -> "c"))
  }

  test("degree centrality matches the reference out/in/total contract (T4)") {
    val e = edges("a" -> "b", "a" -> "c", "b" -> "a")
    val m = GraphOps.degrees(e)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("a") == ((2L, 1L, 3L)))
    assert(m("b") == ((1L, 1L, 2L)))
    assert(m("c") == ((0L, 1L, 1L)))
  }

  test("bfsFrom (DataFrame seeds) matches bfs (Seq seeds), dedupes, takes col 1") {
    val e = edges("a" -> "b", "b" -> "c", "x" -> "y", "q" -> "r")
    val viaSeq = distances(GraphOps.bfs(e, Seq("a", "x"), 3, Outgoing))
    // duplicate seed + arbitrary column name: bfsFrom dedupes and reads
    // the first column
    val seeds = Seq("a", "x", "a").toDF("node_id")
    val viaDf = distances(GraphOps.bfsFrom(e, seeds, 3, Outgoing))
    assert(viaDf == viaSeq)
    assert(viaDf == Map("a" -> 0, "x" -> 0, "b" -> 1, "y" -> 1, "c" -> 2))
    // empty seed set → empty traversal, schema intact
    val none = GraphOps.bfsFrom(e, Seq.empty[String].toDF("node"), 3, Outgoing)
    assert(none.columns.toSeq == Seq("node", "distance", "parent"))
    assert(none.isEmpty)
  }

  test("shuffle-path BFS (frontierBroadcastLimit = 1) matches the broadcast path") {
    // With the limit at 1, every hop past the single seed runs the guarded
    // broadcastFrontier = false branch (plain shuffle join) — the path that
    // never executes under the default 10M limit at test scale. Results
    // must be row-identical (node, distance, AND the deterministic
    // min-parent pointer) to the default broadcast run.
    val rnd = new scala.util.Random(5)
    val es = Seq.fill(400)((s"n${rnd.nextInt(80)}", s"n${rnd.nextInt(80)}"))
      .filter(e => e._1 != e._2).distinct
    val e = es.toDF("src", "dst")
    def run(limit: Long): Set[(String, Int, Option[String])] =
      GraphOps.bfs(e, Seq("n0"), 4, Both, frontierBroadcastLimit = limit)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2))))
        .toSet
    val viaBroadcast = run(GraphOps.DefaultFrontierBroadcastLimit)
    val viaShuffle = run(1L)
    assert(viaShuffle == viaBroadcast)
    // sanity: the traversal actually grew past the seed, so hops 2+ really
    // exercised the shuffle branch
    assert(viaBroadcast.count(_._2 > 0) > 1)
  }

  test("over-threshold weighted-path dispatch never collects rows to the driver") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val es = Seq.tabulate(50)(i => (s"n$i", s"n${(i + 1) % 50}", 1.0))
      .toDF("src", "dst", "w")
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // drain any in-flight events from earlier queries before observing
      Thread.sleep(100); actions.clear()
      val dist = GraphOps.weightedShortestPathsAuto(es, "n0", maxHops = 2,
        accelThreshold = 1L)
      // listener delivery is async — wait for the probe's count to land
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!actions.contains("count") && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(actions.contains("count"), s"probe count observed (got $actions)")
      assert(!actions.contains("collect"),
        s"over-threshold dispatch must not collect the edge view (got $actions)")
      // and the returned result is the distributed relaxation plan, not a
      // driver-materialized local relation
      assert(dist.queryExecution.analyzed.toString.contains("Join"))
    } finally { spark.listenerManager.unregister(listener); () }
  }

  test("weighted shortest paths: a longer-hop cheaper route wins") {
    // a->z direct costs 10; a->b->c->z costs 1+1+1 = 3
    val e = Seq(("a", "z", 10.0), ("a", "b", 1.0), ("b", "c", 1.0),
      ("c", "z", 1.0)).toDF("src", "dst", "w")
    val d = GraphOps.weightedShortestPaths(e, "a", maxHops = 4)
      .as[(String, Double)].collect().toMap
    assert(d == Map("a" -> 0.0, "b" -> 1.0, "c" -> 2.0, "z" -> 3.0))
    // with only 1 relaxation round, the direct edge is the best known
    val d1 = GraphOps.weightedShortestPaths(e, "a", maxHops = 1)
      .as[(String, Double)].collect().toMap
    assert(d1("z") == 10.0)
  }

  test("weighted shortest paths agree with a driver Dijkstra (differential)") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(120)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}",
      (1 + rnd.nextInt(9)).toDouble)).filter(e => e._1 != e._2).distinct
    val hops = 6
    val fast = GraphOps.weightedShortestPaths(es.toDF("src", "dst", "w"),
        "n0", maxHops = hops)
      .as[(String, Double)].collect().toMap
    // driver Bellman-Ford with the same hop bound (Dijkstra would relax
    // past the bound; the bounded contract is "best distance using at most
    // maxHops edges")
    var dist = Map("n0" -> 0.0)
    for (_ <- 1 to hops) {
      val relaxed = es.flatMap { case (s, d, w) =>
        dist.get(s).map(sd => d -> (sd + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    assert(fast == dist)
    // the auto dispatcher's driver path is bit-identical to both
    val auto = GraphOps.weightedShortestPathsAuto(es.toDF("src", "dst", "w"),
        "n0", maxHops = hops)
      .as[(String, Double)].collect().toMap
    assert(auto == fast)
    // and above the threshold it falls back to the distributed loop
    val forced = GraphOps.weightedShortestPathsAuto(es.toDF("src", "dst", "w"),
        "n0", maxHops = hops, accelThreshold = 1L)
      .as[(String, Double)].collect().toMap
    assert(forced == fast)
  }

  test("null-weight edges drop identically on both weighted dispatch paths") {
    // A null weight must mean "no edge" on BOTH sides of the accel
    // threshold: the DataFrame path drops it via null propagation, and
    // the accel path must not read it as weight 0.0 (Row.getDouble
    // unboxes null to 0.0). The a→c direct edge is null-weighted, so the
    // only route to c is a→b→c = 3.0 — a 0.0-misread would answer 0.0.
    val es = Seq(("a", "b", Some(1.0)), ("b", "c", Some(2.0)),
      ("a", "c", None: Option[Double])).toDF("src", "dst", "w")
    val accel = GraphOps.weightedShortestPathsAuto(es, "a", maxHops = 3)
      .as[(String, Double)].collect().toMap
    val distributed = GraphOps.weightedShortestPathsAuto(es, "a", maxHops = 3,
        accelThreshold = 1L)
      .as[(String, Double)].collect().toMap
    assert(accel == Map("a" -> 0.0, "b" -> 1.0, "c" -> 3.0))
    assert(distributed == accel)
  }

  test("weighted accel cache keys on the weight expression, not just the edges") {
    // Same (src, dst) edge set, two different weight columns: the cache is
    // keyed on the canonicalized (src, dst, w) plan, so the second call
    // must NOT reuse the first call's loaded graph.
    val base = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val w1 = base.withColumn("w", org.apache.spark.sql.functions.lit(1.0))
    val w5 = base.withColumn("w", org.apache.spark.sql.functions.lit(5.0))
    val d1 = GraphOps.weightedShortestPathsAuto(w1, "a", maxHops = 3)
      .as[(String, Double)].collect().toMap
    val d5 = GraphOps.weightedShortestPathsAuto(w5, "a", maxHops = 3)
      .as[(String, Double)].collect().toMap
    assert(d1 == Map("a" -> 0.0, "b" -> 1.0, "c" -> 1.0))
    assert(d5 == Map("a" -> 0.0, "b" -> 5.0, "c" -> 5.0))
    // and a REPEATED call with the first weights still answers from the
    // (refreshed) cache correctly
    val d1again = GraphOps.weightedShortestPathsAuto(w1, "a", maxHops = 3)
      .as[(String, Double)].collect().toMap
    assert(d1again == d1)
  }
}
