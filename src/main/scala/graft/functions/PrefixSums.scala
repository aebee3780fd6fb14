package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exclusive prefix sums of an `array<long>`: for input of n elements the
  * output has n+1 — `out[0] = 0`, `out[i] = cnt[0] + … + cnt[i-1]`,
  * `out[n] = total`. One linear pass inside whole-stage codegen.
  *
  * This is [[LowerBound]]'s companion in
  * [[graft.operators.RangeJoin.intervalAggregate]]: once the per-bucket
  * point array is deduplicated to (sorted distinct values, per-value
  * counts), the number of points inside `[lo, hi]` is
  * `prefix[lower_bound(vals, hi+1)] - prefix[lower_bound(vals, lo)]` —
  * the duplicate multiplicity rides the counts, not the array length, so
  * a degenerate million-duplicate bucket costs one entry instead of a
  * million. A `functions.aggregate` fold could build the same array but
  * concatenates per element (O(n²) copies) and falls out of codegen
  * (HigherOrderFunction is CodegenFallback); this stays in the fused loop.
  *
  * Null array → null; null ELEMENTS are the producer's bug (counts come
  * from `count(*)`, never null) and read as 0 via `getLong`.
  */
case class PrefixSums(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"prefix_sums requires array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "prefix_sums"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n + 1)
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += arr.getLong(i)
      i += 1
      out(i) = acc
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n + 1];
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i);
         |  $out[$i + 1] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PrefixSums =
    copy(child = newChild)
}

object PrefixSums {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def apply(arr: Column): Column =
    Bridge.column(PrefixSums(Bridge.expression(arr)))
}
