package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a long key: `true` iff the
  * key is non-null and `filter.mightContainLong(key)`.
  *
  * This is [[graft.operators.RuntimeFilter.bloomPrunedJoin]]'s probe. The
  * prior cut used a Scala UDF, which (a) breaks the fact side's
  * whole-stage-codegen span in half — the scan→filter→exchange-input
  * pipeline de-fuses exactly at the hottest operator of the whole join —
  * and (b) boxes every key to `java.lang.Long` on a path that runs once
  * per fact row (100 TB = trillions of probes). As an Expression the probe
  * compiles into the fused loop: the driver-built filter travels in the
  * codegen references array (serialized once per stage with the task
  * binary — same distribution cost as the broadcast the UDF closed over),
  * and the probe is a primitive-long call with no boxing.
  *
  * Catalyst's injected runtime filters (`BloomFilterMightContain`) use this
  * exact design; this expression is the explicit-API twin for filters
  * built by caller code rather than the optimizer. NULL keys return FALSE
  * (not null): a null key matches no dim row in the inner equi-join this
  * probe fronts, so pruning it is semantics-preserving — and it keeps the
  * expression non-nullable, which lets the planner treat the filter as a
  * plain boolean predicate.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires bigint, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} =
          !${childGen.isNull} && $bf.mightContainLong(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point; integral keys are cast to long to match the
    * filter's `putLong` domain. */
  def apply(key: Column, filter: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key.cast("long")), filter))
}
