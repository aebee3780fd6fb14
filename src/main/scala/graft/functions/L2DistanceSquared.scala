package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared L2 distance between two `array<double>` columns as a native
  * codegen expression — the k-means assignment kernel (q78/q84, the
  * SemDeDup cluster-bounding step; reference computes it row-at-a-time in
  * numpy, embedding_projection_service.py:753-807).
  *
  * BIT-IDENTICAL to the HOF formulation it replaces:
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, (acc,d) -> acc+d)`
  * accumulates the squared differences sequentially in index order, and so
  * does this loop — same IEEE operations in the same order, so oracle
  * hashes (and tie-breaks on exact double equality downstream) are
  * unchanged. The difference is evaluation cost: the HOF pair runs
  * interpreted (per-element lambda dispatch; HigherOrderFunction is
  * CodegenFallback), measured ~69 s for the 160M-pair assignment join at
  * sf10 — this expression stays inside whole-stage codegen as a fused
  * while-loop (~30× less).
  *
  * Length mismatch and zero-length are both well-defined: mismatch → null
  * (mirrors zip_with's null-padding turning the sum null), empty → 0.0.
  */
case class L2DistanceSquared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_distance_squared requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_distance_squared"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSquared =
    copy(left = newLeft, right = newRight)
}

object L2DistanceSquared {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point: `l2Sq(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(L2DistanceSquared(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}
