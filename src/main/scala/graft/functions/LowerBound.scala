package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Binary-search lower bound over a SORTED `array<long>` column: the
  * first index i (0-based) with `arr[i] >= key`, or `size(arr)` when no
  * element qualifies — `std::lower_bound` as a whole-stage-codegen
  * expression.
  *
  * This is the kernel of [[graft.operators.RangeJoin.intervalAggregate]]:
  * counting the points of a pre-sorted per-bucket array that fall inside
  * an interval is `lower_bound(arr, hi+1) - lower_bound(arr, lo)` — two
  * O(log n) probes per (interval, bucket) row instead of materializing
  * every (point, interval) pair. A `filter(arr, x -> ...)`-style HOF scan
  * would be O(n) per row AND interpreted (HigherOrderFunction is
  * CodegenFallback); this stays inside the fused loop.
  *
  * The sortedness precondition is the caller's (producers build the array
  * with `sort_array(collect_list(...))`); on an unsorted array the result
  * is just some index, never a crash. Null array or null key → null
  * (null-intolerant, like the arithmetic it feeds).
  */
case class LowerBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lower_bound requires (array<bigint>, bigint), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "lower_bound"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = k.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    nullSafeCodeGen(ctx, ev, (a, k) => {
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getLong($mid) < $k) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBound =
    copy(left = newLeft, right = newRight)
}

object LowerBound {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def apply(arr: Column, key: Column): Column =
    Bridge.column(LowerBound(
      Bridge.expression(arr),
      Bridge.expression(key.cast("long"))))
}
