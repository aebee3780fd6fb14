package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Decode a packed little-endian float16 or float32 binary column into
  * `array<float>` — the reference stores chunk embeddings as `bytea` in
  * both widths and sniffs the format from the byte length
  * (kg_api.source_embeddings, schema/00_baseline.sql:3148-3170; decode:
  * api/app/services/embedding_projection_service.py:296-307).
  *
  * Storing f16 at rest halves embedding bytes — at 100 TB that's the
  * difference between one scan and two — and this expression keeps the
  * decode inside whole-stage codegen rather than a row-at-a-time UDF.
  */
case class DecodeFloatArray(child: Expression, bitsPerValue: Int)
    extends UnaryExpression {

  require(bitsPerValue == 16 || bitsPerValue == 32,
    s"bitsPerValue must be 16 or 32, got $bitsPerValue")
  private val bytesPerValue = bitsPerValue / 8

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"decode_float${bitsPerValue}_array"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length % bytesPerValue != 0) return null
    val n = bytes.length / bytesPerValue
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (bitsPerValue == 32) DecodeFloatArray.readF32LE(bytes, i * 4)
        else DecodeFloatArray.halfToFloat(
          ((bytes(i * 2 + 1) & 0xff) << 8) | (bytes(i * 2) & 0xff))
      i += 1
    }
    new GenericArrayData(out.map(Float.box))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DecodeFloatArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val body =
        if (bitsPerValue == 32)
          s"$arr[$i] = $cls.readF32LE($b, $i * 4);"
        else
          s"$arr[$i] = $cls.halfToFloat((($b[$i * 2 + 1] & 0xff) << 8) | ($b[$i * 2] & 0xff));"
      s"""
         |if ($b.length % $bytesPerValue != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $b.length / $bytesPerValue;
         |  final float[] $arr = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) { $body }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($arr);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeFloatArray {

  /** IEEE 754 half → float (Java 17 lacks Float.float16ToFloat). */
  def halfToFloat(h: Int): Float = {
    val sign = (h >>> 15) & 1
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign << 31 // ±0
        else { // subnormal: normalize
          var e = -1; var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          (sign << 31) | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) {
        (sign << 31) | 0x7f800000 | (mant << 13) // inf / NaN
      } else {
        (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 13)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  def readF32LE(b: Array[Byte], off: Int): Float =
    java.lang.Float.intBitsToFloat(
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24))

  /** Column API: decode f16-packed binary. */
  def f16(c: Column): Column =
    Bridge.column(DecodeFloatArray(Bridge.expression(c), 16))

  /** Column API: decode f32-packed binary. */
  def f32(c: Column): Column =
    Bridge.column(DecodeFloatArray(Bridge.expression(c), 32))

  /** Format-sniffing decode given the known embedding dimension — the
    * reference's rule: byte length 2·dim → f16, 4·dim → f32. */
  def auto(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.functions._
    when(length(c) === dim * 2, f16(c))
      .when(length(c) === dim * 4, f32(c))
      .otherwise(lit(null))
  }
}
