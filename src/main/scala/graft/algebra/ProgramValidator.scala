package graft.algebra

/** Query-front-end validation (reference F7/F8): the cypher guard rejects
  * write keywords and unbounded variable-length paths in user statements
  * (api/app/services/cypher_guard.py:31-46, program_validator.py,
  * V010-V016/V030), and regex guards constrain rel-type and concept-id
  * lexicons (graph_facade.py:87-105). The engine analog validates
  * statement text before it is compiled to DataFrame operators.
  */
object ProgramValidator {

  final case class Violation(code: String, message: String)

  private val writeKeywords = Seq(
    "CREATE", "MERGE", "DELETE", "DETACH", "SET", "REMOVE", "DROP",
    "LOAD CSV", "FOREACH", "CALL")

  private val relTypePattern = "^[A-Z][A-Z0-9_]*$".r
  private val conceptIdPattern = "^[a-zA-Z0-9:_-]+$".r

  /** Validate a read-only statement: no write keywords (V010-V016), no
    * unbounded `[*]` variable-length paths (V030 — the construct whose AGE
    * plans collapse, BASELINE.md). */
  def validateStatement(text: String): Seq[Violation] = {
    val upper = text.toUpperCase
    val writes = writeKeywords.filter { kw =>
      ("""(?<![A-Z])""" + java.util.regex.Pattern.quote(kw) + """(?![A-Z])""").r
        .findFirstIn(upper).isDefined
    }.map(kw => Violation("V010", s"write operation not allowed: $kw"))
    // Optional relationship binding/type before the star (`[r:TYPE*]`,
    // `[r*]`, `[:T|U *]`) — the reference's own regex misses these
    // (program_validator.py:510-518 only matches an anonymous `[*`); a
    // typed unbounded path plans exactly as pathologically as a bare one,
    // so the guard here is deliberately stricter. Bounded forms
    // (`[*1..5]`, `[*3]`) stay admitted, as in the reference.
    val binding = """(?:[A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*[A-Za-z_][A-Za-z0-9_|]*)?\s*"""
    val unbounded =
      if (("""\[\s*""" + binding + """\*\s*(\.\.\s*)?\]""").r.findFirstIn(text).isDefined ||
        ("""\[\s*""" + binding + """\*\d*\s*\.\.\s*\]""").r.findFirstIn(text).isDefined)
        Seq(Violation("V030", "unbounded variable-length path not allowed"))
      else Seq.empty
    writes ++ unbounded
  }

  def isValidRelType(t: String): Boolean = relTypePattern.matches(t)
  def isValidConceptId(id: String): Boolean = conceptIdPattern.matches(id)
}
