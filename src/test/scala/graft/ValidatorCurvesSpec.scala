package graft

import graft.algebra.ProgramValidator
import graft.functions.Curves

/** Front-end validation (F7/F8) and scalar policy curves (§2.8). */
class ValidatorCurvesSpec extends SparkSpec {

  test("write keywords rejected, reads allowed (V010)") {
    assert(ProgramValidator.validateStatement(
      "MATCH (c:Concept) RETURN c.label").isEmpty)
    assert(ProgramValidator.validateStatement(
      "CREATE (c:Concept {id: 'x'})").exists(_.code == "V010"))
    assert(ProgramValidator.validateStatement(
      "MATCH (c) DETACH DELETE c").count(_.code == "V010") == 2)
    // keyword inside a longer identifier is NOT a violation
    assert(ProgramValidator.validateStatement(
      "MATCH (c) WHERE c.created_at > 0 RETURN c").isEmpty)
  }

  test("unbounded variable-length paths rejected (V030)") {
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[*]->(b) RETURN b").exists(_.code == "V030"))
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[*1..]->(b) RETURN b").exists(_.code == "V030"))
    // typed/named unbounded forms (stricter than the reference's own
    // regex, which only catches the anonymous `[*` spelling)
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[r:RELATES_TO*]->(b) RETURN b").exists(_.code == "V030"))
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[r*]->(b) RETURN b").exists(_.code == "V030"))
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[:SUPPORTS|IMPLIES *2..]->(b) RETURN b").exists(_.code == "V030"))
    // bounded forms stay admitted
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[r:SUPPORTS*1..3]->(b) RETURN b").isEmpty)
    assert(ProgramValidator.validateStatement(
      "MATCH (a)-[r:SUPPORTS]->(b) RETURN b").isEmpty)
  }

  test("lexical guards for rel types and concept ids (F8)") {
    assert(ProgramValidator.isValidRelType("SUPPORTS"))
    assert(ProgramValidator.isValidRelType("CO_OCCURS_2"))
    assert(!ProgramValidator.isValidRelType("supports"))
    assert(!ProgramValidator.isValidRelType("1BAD"))
    assert(ProgramValidator.isValidConceptId("doc1_chunk1:a-b_c"))
    assert(!ProgramValidator.isValidConceptId("bad id"))
  }

  test("bezier curve endpoints, monotonicity, identity diagonal") {
    assert(Curves.bezierYForX(0.0, 0.25, 0.1, 0.75, 0.9) == 0.0)
    assert(math.abs(Curves.bezierYForX(1.0, 0.25, 0.1, 0.75, 0.9) - 1.0) < 1e-6)
    // identity when control points sit on the diagonal
    assert(math.abs(Curves.bezierYForX(0.37, 1.0 / 3, 1.0 / 3, 2.0 / 3, 2.0 / 3) - 0.37) < 1e-6)
    // ease-in-out: below diagonal early, above late
    assert(Curves.bezierYForX(0.25, 0.42, 0.0, 0.58, 1.0) < 0.25)
    assert(Curves.bezierYForX(0.75, 0.42, 0.0, 0.58, 1.0) > 0.75)
    // monotone non-decreasing on a sample grid
    val ys = (0 to 20).map(i => Curves.bezierYForX(i / 20.0, 0.3, 0.1, 0.7, 0.9))
    assert(ys.sliding(2).forall { case Seq(a, b) => b >= a - 1e-9 })
  }

  test("mm saturation hits the reference constants") {
    assert(Curves.mm(2.0, 2.0) == 0.5)
    assert(Curves.mm(0.0, 2.0) == 0.0)
    assert(Curves.mm(1e9, 2.0) > 0.999)
  }
}
