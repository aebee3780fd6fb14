package graft

import org.apache.spark.sql.DataFrame
import graft.algebra.GraphAlgebra
import graft.algebra.GraphAlgebra._

/** Set-algebra laws of the GraphProgram operators (reference
  * tests/unit/test_program_operators.py semantics): W-wins union, cascade
  * difference, intersect, optional/assert, dangling-link invariant. */
class AlgebraSpec extends SparkSpec {
  import spark.implicits._

  def g(nodes: Seq[String], links: Seq[(String, String, String)]): WorkingGraph =
    WorkingGraph(nodes.toDF("node_id"), links.toDF("from_id", "rel_type", "to_id"))

  def nodeSet(g: WorkingGraph): Set[String] =
    g.nodes.select("node_id").as[String].collect().toSet
  def linkSet(g: WorkingGraph): Set[(String, String, String)] =
    g.links.select("from_id", "rel_type", "to_id")
      .as[(String, String, String)].collect().toSet

  val w = g(Seq("a", "b", "c"), Seq(("a", "R", "b"), ("b", "R", "c")))

  test("P1 union dedups nodes by id and links by (from,type,to)") {
    val r = g(Seq("c", "d"), Seq(("b", "R", "c"), ("c", "R", "d")))
    val u = union(w, r)
    assert(nodeSet(u) == Set("a", "b", "c", "d"))
    assert(linkSet(u) == Set(("a", "R", "b"), ("b", "R", "c"), ("c", "R", "d")))
  }

  test("P1 union W-wins: colliding node keeps W's attribute payload") {
    val wAttr = WorkingGraph(
      Seq(("a", "from_w"), ("b", "from_w")).toDF("node_id", "payload"),
      Seq.empty[(String, String, String)].toDF("from_id", "rel_type", "to_id"))
    val rAttr = WorkingGraph(
      Seq(("b", "from_r"), ("c", "from_r")).toDF("node_id", "payload"),
      Seq.empty[(String, String, String)].toDF("from_id", "rel_type", "to_id"))
    val u = union(wAttr, rAttr)
    val payloads = u.nodes.select("node_id", "payload")
      .as[(String, String)].collect().toMap
    assert(payloads == Map("a" -> "from_w", "b" -> "from_w", "c" -> "from_r"))
  }

  test("links-only R is non-empty: ?/! merge its links into W") {
    // R has no new nodes, only an edge between nodes already in W
    // (reference _is_nonempty: len(r.nodes) > 0 OR len(r.links) > 0).
    val r = g(Seq.empty, Seq(("a", "X", "c")))
    assert(!r.isEmpty)
    val viaOptional = optional(w, r)
    assert(linkSet(viaOptional).contains(("a", "X", "c")))
    val viaAssert = assertNonEmpty(w, r)
    assert(linkSet(viaAssert).contains(("a", "X", "c")))
  }

  test("P2 difference removes nodes and cascades dangling links") {
    val r = g(Seq("b"), Seq.empty)
    val d = difference(w, r)
    assert(nodeSet(d) == Set("a", "c"))
    assert(linkSet(d).isEmpty) // both links touched b
  }

  test("P3 intersect keeps only common nodes + their internal links") {
    val r = g(Seq("b", "c", "z"), Seq.empty)
    val i = intersect(w, r)
    assert(nodeSet(i) == Set("b", "c"))
    assert(linkSet(i) == Set(("b", "R", "c")))
  }

  test("P4 optional is a no-op on empty R, union otherwise") {
    assert(nodeSet(optional(w, empty(spark))) == nodeSet(w))
    val r = g(Seq("d"), Seq.empty)
    assert(nodeSet(optional(w, r)) == Set("a", "b", "c", "d"))
  }

  test("P5 assert aborts on empty R") {
    intercept[ProgramAbort] { assertNonEmpty(w, empty(spark)) }
  }

  test("P6 dangling invariant holds after every operator") {
    val r = g(Seq("x"), Seq(("x", "R", "ghost")))
    val u = union(w, r)
    assert(linkSet(u).forall { case (f, _, t) =>
      nodeSet(u).contains(f) && nodeSet(u).contains(t) })
  }

  test("P7/P8 program executes sequentially with abort semantics") {
    val stmts = Seq(
      Statement(Plus, _ => g(Seq("a", "b"), Seq(("a", "R", "b")))),
      Statement(Minus, _ => g(Seq("b"), Seq.empty)),
      Statement(Assert, _ => empty(spark)), // aborts here
      Statement(Plus, _ => g(Seq("z"), Seq.empty)))
    val (result, log, aborted) = GraphAlgebra.execute(spark, stmts)
    assert(aborted)
    assert(log.size == 3) // 4th statement never ran
    assert(nodeSet(result) == Set("a")) // partial W preserved
  }

  test("global timeout aborts with partial W (60s contract, scaled down)") {
    val stmts = Seq(
      Statement(Plus, _ => g(Seq("a"), Seq.empty)),
      Statement(Plus, _ => { Thread.sleep(150); g(Seq("b"), Seq.empty) }),
      Statement(Plus, _ => g(Seq("c"), Seq.empty)))
    val (result, log, aborted) = GraphAlgebra.execute(spark, stmts, timeoutMs = 100)
    assert(aborted)
    assert(log.size < 3)
    assert(nodeSet(result).contains("a"))
  }

  test("seed-then-expand: statement can read current working set ($W_IDS)") {
    val edges = Seq(("a", "E", "b"), ("b", "E", "c")).toDF("from_id", "rel_type", "to_id")
    val stmts = Seq(
      Statement(Plus, _ => g(Seq("a"), Seq.empty)),
      Statement(Plus, cur => {
        val expanded = edges.join(cur.nodes.withColumnRenamed("node_id", "from_id"),
          Seq("from_id"), "left_semi")
        WorkingGraph(
          expanded.select($"to_id".as("node_id"))
            .union(cur.nodes), expanded)
      }))
    val (result, _, aborted) = GraphAlgebra.execute(spark, stmts)
    assert(!aborted)
    assert(nodeSet(result) == Set("a", "b"))
  }
}
