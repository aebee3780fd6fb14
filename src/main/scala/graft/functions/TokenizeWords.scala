package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The canonical word tokenizer — `regexp_extract_all(lower(c), '[a-z]+')`
  * — as a native codegen expression. The regex form is the scan kernel of
  * ~20 text operators (token counts, LM logprobs, BM25, n-gram windows,
  * Gopher rules …) and pays a `java.util.regex` Matcher + per-match boxing
  * on every row; this expression scans the UTF8 bytes once.
  *
  * EXACT-parity contract (the DuckDB oracles interpolate the same
  * pattern, so tokens must be bit-identical to the regex form):
  *
  *  - pure-ASCII input (every byte < 0x80 — the overwhelming scan case)
  *    takes the fast path: runs of [A-Za-z] are emitted lowercased
  *    byte-wise, exactly what Spark's own all-ASCII `lower` fast path
  *    followed by `[a-z]+` produces;
  *  - ANY non-ASCII byte falls back to literally `lower` + regex (the
  *    same UTF8String.toLowerCase and `[a-z]+` Pattern Spark would run),
  *    so exotic case mappings that produce ASCII letters (U+0130 → i +
  *    combining dot, U+212A Kelvin → k) and locale-sensitive JDK
  *    lowercasing behave identically to the built-in composition by
  *    construction.
  *
  * TokenizeSpec pins fast ≡ regex on random ASCII and the fallback cases.
  */
case class TokenizeWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tokenize_words requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tokenize_words"

  override def nullSafeEval(input: Any): Any =
    TokenizeWords.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeWords.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

object TokenizeWords {

  private val WordPattern = java.util.regex.Pattern.compile("[a-z]+")

  /** Single-pass tokenize; called from both eval and generated code. */
  def scan(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    // Fast path applies only to pure-ASCII strings: scan for any byte with
    // the high bit set (getByte returns signed → negative).
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (!ascii) return fallback(s)

    val out = new java.util.ArrayList[AnyRef]()
    i = 0
    while (i < n) {
      // skip separators
      var b = s.getByte(i)
      while (i < n && !isLetter(b)) {
        i += 1
        if (i < n) b = s.getByte(i)
      }
      if (i < n) {
        val start = i
        while (i < n && isLetter(s.getByte(i))) i += 1
        val len = i - start
        val tok = new Array[Byte](len)
        var j = 0
        while (j < len) {
          val c = s.getByte(start + j)
          tok(j) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
          j += 1
        }
        out.add(UTF8String.fromBytes(tok))
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Literal replication of `regexp_extract_all(lower(s), '[a-z]+')`:
    * UTF8String.toLowerCase (Spark's own lower), then the Java regex. */
  private def fallback(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase.toString
    val m = WordPattern.matcher(lowered)
    val out = new java.util.ArrayList[AnyRef]()
    while (m.find()) out.add(UTF8String.fromString(m.group()))
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def apply(c: Column): Column =
    Bridge.column(TokenizeWords(Bridge.expression(c.cast("string"))))
}
