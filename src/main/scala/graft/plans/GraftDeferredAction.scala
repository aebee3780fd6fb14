package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A side-effecting TVF body deferred to EXECUTION time.
  *
  * The maintenance TVFs (`graft_vacuum`, `graft_compact`,
  * `graft_adopt_field_ids`, …) used to run their store call inside the
  * table-function BUILDER — i.e. at analysis — so `EXPLAIN SELECT * FROM
  * graft_vacuum(…)`, or any dry-run resolution of a query referencing
  * one, actually reclaimed versions. Vacuum is irreversible, so that
  * pattern (inherited from the read-only/refresh TVFs, where it is
  * merely eager) was a footgun. This leaf plan carries the action as a
  * thunk; the builder only VALIDATES arguments (bad arity/types still
  * fail at analysis, where SQL users expect them), and the thunk runs
  * exactly once per query execution, inside [[GraftDeferredActionExec]] —
  * EXPLAIN/analysis never fires it.
  *
  * Output rows are whatever the action returns (external Scala values,
  * converted per the declared attribute types), so the SELECT surface of
  * each TVF is unchanged. */
final case class GraftDeferredAction(
    label: String,
    output: Seq[Attribute],
    run: () => Seq[Seq[Any]]) extends LeafNode {
  // one output row in practice; never the interesting side of a join
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64L)
  override def simpleString(maxFields: Int): String =
    s"GraftDeferredAction $label"
}

/** Plans [[GraftDeferredAction]] onto its exec node — registered with the
  * other graft strategies (GraftExtensions.apply / register). */
object GraftDeferredActionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d: GraftDeferredAction =>
      GraftDeferredActionExec(d.label, d.output, d.run) :: Nil
    case _ => Nil
  }
}

/** Runs the deferred action ONCE per execution (lazy val — a plan
  * executed through both executeCollect and doExecute, or re-collected
  * from the same DataFrame, does not double-apply), then serves the
  * result rows like a local scan. */
final case class GraftDeferredActionExec(
    label: String,
    output: Seq[Attribute],
    run: () => Seq[Seq[Any]]) extends LeafExecNode {

  private lazy val unsafeRows: Array[org.apache.spark.sql.catalyst.expressions.UnsafeRow] = {
    val converters = output.map(a =>
      CatalystTypeConverters.createToCatalystConverter(a.dataType))
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    run().map { r =>
      require(r.length == output.length,
        s"deferred action $label returned ${r.length} values for " +
          s"${output.length} columns")
      proj(InternalRow.fromSeq(
        r.lazyZip(converters).map((v, c) => c(v)))).copy()
    }.toArray
  }

  override def executeCollect(): Array[InternalRow] =
    unsafeRows.map(identity[InternalRow])

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(unsafeRows.toSeq, 1)

  override def simpleString(maxFields: Int): String =
    s"GraftDeferredActionExec $label"
}
