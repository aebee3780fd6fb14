package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions

/** ANSI `UPDATE <cat>.<table> SET col = expr, … [WHERE …]` over the
  * snapshot store (the SQL face of `SnapshotStore.update`, completing the
  * mutation surface the reference exposes through REST CRUD —
  * api/app/lib/age_client/query.py:277-483 and vocabulary.py:701-841's
  * merge_edge_types rewrite).
  *
  * Spark parses UPDATE into the [[UpdateTable]] logical command but only
  * executes it for DSv2 tables implementing SupportsRowLevelOperations —
  * a scan-plus-writeback protocol whose generality (group-based rewrites
  * planned by the engine) the store does not need: `SnapshotStore.update`
  * IS the row-level operation, with its own matched-file discovery,
  * deletion-vector policy, CAS commit, and change-feed images. This
  * strategy (registered via `SparkSessionExtensions.injectPlannerStrategy`,
  * the §2.13 extension surface) plans UpdateTable over a graft relation
  * directly onto the store call.
  *
  * The RESOLVED assignment/condition expressions are carried back to the
  * store as SQL text (`Expression.sql`) and re-resolved against the
  * mutation's own snapshot scan: the store's update runs on the CURRENT
  * head under its CAS protocol, so attribute ids from the command's
  * analysis-time relation would be stale anyway — names, not ids, are the
  * stable coordinates here. Expressions whose SQL form cannot round-trip
  * (exotic subqueries) fail loudly at re-resolution rather than silently
  * mis-assigning. Type safety is the store's: a lossy assignment coercion
  * is refused up front (Cast.canUpCast), never silently NULLed. */
object GraftUpdateStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u: UpdateTable =>
      // The relation arrives raw from analysis or already pushed down by
      // the optimizer (V2ScanRelationPushDown rewrites it into a scan
      // relation before planning) — accept both shapes.
      val graftRel = u.table.collectFirst {
        case r: DataSourceV2Relation
            if r.table.isInstanceOf[graft.sources.GraftTable] =>
          r.table.asInstanceOf[graft.sources.GraftTable]
        case s: DataSourceV2ScanRelation
            if s.relation.table.isInstanceOf[graft.sources.GraftTable] =>
          s.relation.table.asInstanceOf[graft.sources.GraftTable]
      }
      graftRel match {
        case Some(gt) =>
          require(!gt.versionPinned,
            s"graft table '${gt.tableName}' is pinned to historical version " +
              s"${gt.snapshotVersion} — UPDATE mutates the current head; " +
              "resolve the table without a version to update")
          val root = gt.storeRoot.getOrElse(throw new UnsupportedOperationException(
            s"graft table '${gt.tableName}' was resolved without a store root"))
          // Attribute SQL arrives qualified with the command's alias
          // (`cat.t.col`), meaningless to the store's own snapshot scan —
          // strip qualifiers so the text re-resolves by bare column name.
          def unqualifiedSql(e: Expression): String =
            e.transform {
              case a: AttributeReference => a.withQualifier(Seq.empty)
            }.sql
          val assigns = u.assignments.map { case Assignment(key, value) =>
            val name = key match {
              case a: Attribute => a.name
              case other => throw new UnsupportedOperationException(
                s"UPDATE of nested field ${other.sql} is not supported — " +
                  "assign the whole top-level column")
            }
            name -> unqualifiedSql(value)
          }
          GraftUpdateExec(root, gt.tableName, assigns,
            u.condition.map(unqualifiedSql)) :: Nil
        case None => Nil // not ours: leave for Spark's row-level machinery
      }
    case _ => Nil
  }
}

/** The command exec node: one store-level update per (eager) command
  * execution. No rows out — like Spark's own V2 command execs. */
final case class GraftUpdateExec(storeRoot: String, tableName: String,
    assignSql: Seq[(String, String)], condSql: Option[String])
  extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  // Commands are executed eagerly exactly once by QueryExecution
  // (UpdateTable is a Command); the lazy val keeps a re-executed plan
  // from double-applying the mutation.
  private lazy val applied: Unit = {
    val spark = SparkSession.active
    new graft.core.SnapshotStore(spark, storeRoot).update(
      tableName,
      condSql.map(functions.expr).getOrElse(functions.lit(true)),
      assignSql.map { case (k, v) => k -> functions.expr(v) }.toMap)
    ()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    applied
    sparkContext.emptyRDD[InternalRow]
  }
}

/** ANSI `MERGE INTO <cat>.<t> USING <source> ON <cond> WHEN …` over the
  * snapshot store — planned onto [[graft.core.SnapshotStore.merge]] (the
  * reference's two-tier match-or-create ingestion as one atomic SQL
  * command). Supported shape, refused-by-fallthrough otherwise (Spark
  * then raises its standard unsupported-operation error):
  *
  *   - at most ONE unconditional matched action: `UPDATE SET …`,
  *     `UPDATE SET *`, or `DELETE`;
  *   - at most ONE unconditional not-matched action: `INSERT *`
  *     (by-name projection, the store's insert contract);
  *   - no not-matched-by-source actions, no schema evolution.
  *
  * Expressions are carried as side-qualified SQL text (`target.`/`source.`
  * per the owning relation's output set) and re-resolved against the
  * store's own aliased scans — same binding rationale as
  * [[GraftUpdateStrategy]]. */
object GraftMergeStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
    InsertAction, InsertStarAction, MergeIntoTable, UpdateAction, UpdateStarAction}
  import org.apache.spark.sql.catalyst.expressions.AttributeSet

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable =>
      val graftRel = m.targetTable.collectFirst {
        case r: DataSourceV2Relation
            if r.table.isInstanceOf[graft.sources.GraftTable] =>
          r.table.asInstanceOf[graft.sources.GraftTable]
        case s: DataSourceV2ScanRelation
            if s.relation.table.isInstanceOf[graft.sources.GraftTable] =>
          s.relation.table.asInstanceOf[graft.sources.GraftTable]
      }
      graftRel match {
        case Some(gt) if translatable(m) =>
          require(!gt.versionPinned,
            s"graft table '${gt.tableName}' is pinned to a historical " +
              "version — MERGE mutates the current head")
          val root = gt.storeRoot.getOrElse(throw new UnsupportedOperationException(
            s"graft table '${gt.tableName}' was resolved without a store root"))
          val tgtSet = AttributeSet(m.targetTable.output)
          val srcSet = AttributeSet(m.sourceTable.output)
          def sideSql(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
            e.transform {
              case a: AttributeReference if tgtSet.contains(a) =>
                a.withQualifier(Seq("target"))
              case a: AttributeReference if srcSet.contains(a) =>
                a.withQualifier(Seq("source"))
            }.sql
          val srcNames = m.sourceTable.output.map(_.name)
          val (updateSql, delete) = m.matchedActions.headOption match {
            case Some(UpdateAction(None, assigns, _)) =>
              (Some(assigns.map { case Assignment(k, v) =>
                k.asInstanceOf[Attribute].name -> sideSql(v)
              }), false)
            case Some(_: UpdateStarAction) =>
              // SET *: every target column with a same-named source column
              (Some(m.targetTable.output.map(_.name)
                .filter(n => srcNames.exists(_.equalsIgnoreCase(n)))
                .map(n => n -> s"source.$n")), false)
            case Some(_: DeleteAction) => (None, true)
            case None => (None, false)
            case _ => throw new IllegalStateException("unreachable: translatable")
          }
          val insertSql = m.notMatchedActions.headOption.collect {
            case InsertAction(None, assigns) => assigns.map {
              case Assignment(k, v) =>
                k.asInstanceOf[Attribute].name -> sideSql(v)
            }
          }
          GraftMergeExec(root, gt.tableName, m.sourceTable,
            sideSql(m.mergeCondition), updateSql, delete,
            insertNotMatched = m.notMatchedActions.nonEmpty,
            insertSql = insertSql) :: Nil
        case _ => Nil // not ours / untranslatable: Spark's standard error
      }
    case _ => Nil
  }

  /** The supported subset (see object doc). */
  private def translatable(m: MergeIntoTable): Boolean = {
    val matchedOk = m.matchedActions match {
      case Seq() => true
      case Seq(UpdateAction(None, _, _)) => true
      case Seq(UpdateStarAction(None)) => true
      case Seq(DeleteAction(None)) => true
      case _ => false
    }
    val notMatchedOk = m.notMatchedActions match {
      case Seq() => true
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, _)) => true
      case _ => false
    }
    matchedOk && notMatchedOk && m.notMatchedBySourceActions.isEmpty &&
      !m.withSchemaEvolution &&
      (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty)
  }
}

/** The MERGE command exec node: re-plans the captured source and runs one
  * store-level merge, eagerly and exactly once per command execution. */
final case class GraftMergeExec(storeRoot: String, tableName: String,
    sourcePlan: LogicalPlan, condSql: String,
    updateSql: Option[Seq[(String, String)]], matchedDelete: Boolean,
    insertNotMatched: Boolean,
    insertSql: Option[Seq[(String, String)]] = None)
  extends LeafExecNode {

  override def output: Seq[Attribute] = Nil
  // the source plan is driver-side state, not part of the exec tree
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(sourcePlan)

  private lazy val applied: Unit = {
    val spark = SparkSession.active
    val source = org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(
      spark, sourcePlan)
    new graft.core.SnapshotStore(spark, storeRoot).merge(
      tableName, source, functions.expr(condSql),
      matchedUpdate = updateSql.map(_.map { case (k, v) =>
        k -> functions.expr(v) }.toMap),
      matchedDelete = matchedDelete,
      insertNotMatched = insertNotMatched,
      insertAssignments = insertSql.map(_.map { case (k, v) =>
        k -> functions.expr(v) }.toMap))
    ()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    applied
    sparkContext.emptyRDD[InternalRow]
  }
}
