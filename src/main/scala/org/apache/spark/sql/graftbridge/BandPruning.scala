package org.apache.spark.sql.graftbridge

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.types._

/** Runtime FILE pruning for BAND joins — dynamic partition pruning's
  * missing non-equi sibling. Spark's own runtime-filter machinery only
  * ever hands a DSv2 scan IN-list predicates (DPP's broadcast keys,
  * `DataSourceV2Strategy.translateRuntimeFilterV2` matches nothing
  * else), so a Catalyst-planned band join `fact.k BETWEEN dim.lo AND
  * dim.hi` scans every fact file even when the dim side — tiny and
  * ALREADY BROADCAST for the join — proves most of them can't match.
  * At 100 TB that's the difference between reading a time-sliced
  * fact's whole history and the two files overlapping the requested
  * interval; the reference pays the same class of cost through
  * AGE's unindexed interval scans (BASELINE.md).
  *
  * This rule runs as an AQE QUERY-STAGE OPTIMIZER rule, which gives it
  * two properties the obvious designs lack:
  *   - stages only exist while a query is EXECUTING, so EXPLAIN never
  *     pays a side effect (the discipline GraftDeferredAction
  *     established for maintenance TVFs), and
  *   - by the time the stage containing the join is optimized, the
  *     build side is a MATERIALIZED BroadcastQueryStageExec — the
  *     bounds come from rows the join already shipped to the driver,
  *     zero extra Spark jobs, no second read of the build side (the
  *     same reuse argument as DPP's reuseBroadcastOnly default).
  *
  * Mechanics: for each range conjunct `probeCol <cmp> buildExpr` of the
  * join condition (either operand order), evaluate buildExpr over the
  * broadcast rows and take the WEAKEST bound — min over the build side
  * for probe lower bounds, max for upper. The resulting
  * `col >= lo` / `col <= hi` V2 predicates go to the probe side's graft
  * scans through the SAME [[GraftRuntimeFiltering.filter]] entry point
  * Spark uses for DPP; zone maps prove per file, never over-prune, and
  * the pruned scan node is re-created so its cached partition planning
  * is discarded. NULL build values widen nothing (a null bound compares
  * true to no probe row); an all-null or empty build side delivers no
  * bound (AQE's empty-relation propagation owns that case).
  *
  * Soundness gate: pruning drops probe files whose rows provably match
  * NO build row, which is only legal when unmatched probe rows are
  * absent from the output — Inner/Cross always, LeftSemi when the probe
  * streams (build right), and the outer side opposite the probe. A
  * LeftAnti/FullOuter/ExistenceJoin band join is left untouched.
  * Scope: BroadcastNestedLoopJoinExec with IdentityBroadcastMode — the
  * shape Catalyst plans for every pure non-equi join with a small side.
  * Equi+band hybrids plan as hash/merge joins whose probe stage is
  * created concurrently with the build stage, so their bounds can't
  * ride the broadcast; their equi keys already get native DPP.
  */
case class GraftBandJoinPruning(session: SparkSession)
  extends Rule[SparkPlan] with PredicateHelper {

  import GraftBandJoinPruning._

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!session.conf.get(EnabledKey, "true").toBoolean) plan
    else plan.transformUp {
      case j: BroadcastNestedLoopJoinExec if j.condition.isDefined =>
        try prune(j).getOrElse(j)
        catch {
          // strictly best-effort: a pruning failure must never fail the
          // query the pruning was meant to speed up
          case scala.util.control.NonFatal(e) =>
            logWarning(s"graft band pruning skipped: ${e.getMessage}")
            j
        }
    }
  }

  private def prune(j: BroadcastNestedLoopJoinExec): Option[SparkPlan] = {
    val (probe, build) = j.buildSide match {
      case BuildRight => (j.left, j.right)
      case BuildLeft  => (j.right, j.left)
    }
    val pruneSound = (j.joinType, j.buildSide) match {
      case (Inner | Cross, _)        => true
      case (LeftSemi, BuildRight)    => true // probe = left, kept only on match
      case (RightOuter, BuildRight)  => true // unmatched LEFT (probe) rows drop
      case (LeftOuter, BuildLeft)    => true // unmatched RIGHT (probe) rows drop
      case _                         => false
    }
    if (!pruneSound) return None

    val bounds = boundsOf(j.condition.get, probe, build)
    if (bounds.isEmpty) return None
    // a graft scan that carries one of the bounded columns must exist
    // before any driver-side work is spent on the broadcast rows
    val anyTarget = probe.exists {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftRuntimeFiltering] =>
        bounds.exists(bd => b.output.exists(_.exprId == bd.attr.exprId))
      case _ => false
    }
    if (!anyTarget) return None

    val rows = broadcastRows(build).getOrElse(return None)
    if (rows.length > session.conf.get(MaxBuildRowsKey, "4000000").toInt)
      return None

    val buildAttrs: Seq[Attribute] = build.output
    val bexprs = bounds.map(bd =>
      (bd, BindReferences.bindReference(bd.buildExpr, buildAttrs)))

    def mkPred(bd: BandBound, v: Any): Predicate = new Predicate(bd.op,
      Array(Expressions.column(bd.attr.name),
        LiteralValue(v, bd.attr.dataType)))

    // HULL fold: the weakest bound per conjunct across every build row —
    // min over the build side for probe lower bounds, max for upper.
    val hull: Seq[(ExprId, Predicate)] = bexprs.flatMap { case (bd, be) =>
      val ord = TypeUtils.getInterpretedOrdering(bd.attr.dataType)
      var acc: Any = null
      rows.foreach { r =>
        val v = be.eval(r)
        if (v != null &&
            (acc == null || (if (bd.lower) ord.lt(v, acc) else ord.gt(v, acc))))
          acc = v
      }
      if (acc == null) None // empty/all-null build side: nothing provable here
      else Some(bd.attr.exprId -> mkPred(bd, acc))
    }
    if (hull.isEmpty) return None

    // PER-WINDOW bands: when the build side is small, each build row is
    // its own band (the conjunction of every bound at that row's values)
    // and the delivered predicate is their DISJUNCTION — scattered
    // windows then prune to the union of narrow intervals instead of the
    // hull spanning them (the decisive case for time-window joins over a
    // time-clustered 100 TB fact). A row with a NULL bound value joins
    // nothing and contributes no band; identical windows dedupe.
    val orCap = session.conf.get(MaxOrWindowsKey, "64").toInt
    val windows: Option[Seq[Seq[(BandBound, Any)]]] =
      if (rows.length > orCap) None
      else {
        val ws = rows.iterator.flatMap { r =>
          val vals = bexprs.map { case (bd, be) => (bd, be.eval(r)) }
          if (vals.exists(_._2 == null)) None else Some(vals)
        }.toSeq.distinctBy(_.map { case (bd, v) => (bd.op, bd.attr.exprId, v) })
        if (ws.isEmpty) None else Some(ws)
      }

    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Or => VOr}
    /** The strongest deliverable predicate set for ONE scan: per-window
      * OR when every window retains a bound on a column of this scan
      * (an empty band would keep all files and void the union), hull
      * bounds otherwise. */
    def predsFor(b: BatchScanExec): Array[Predicate] = {
      def onScan(bd: BandBound) = b.output.exists(_.exprId == bd.attr.exprId)
      val perWindow = windows.flatMap { ws =>
        val branches = ws.map(_.filter { case (bd, _) => onScan(bd) })
        if (branches.forall(_.nonEmpty))
          Some(Array[Predicate](branches
            .map(_.map { case (bd, v) => mkPred(bd, v) }
              .reduceLeft[Predicate]((a, c) => new VAnd(a, c)))
            .reduceLeft[Predicate]((a, c) => new VOr(a, c))))
        else None
      }
      perWindow.getOrElse(
        hull.collect { case (id, p) if b.output.exists(_.exprId == id) => p }
          .toArray)
    }

    var delivered = false
    val newProbe = probe.transformUp {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftRuntimeFiltering] =>
        val mine = predsFor(b)
        if (mine.isEmpty) b
        else {
          b.scan.asInstanceOf[GraftRuntimeFiltering].filter(mine)
          delivered = true
          logInfo(s"graft band pruning: ${mine.length} runtime predicate(s) " +
            s"(${windows.fold("hull")(w => s"${w.length} window(s)")}) " +
            s"delivered to ${b.scan.getClass.getSimpleName}")
          // fresh node: the old one's lazily-planned partitions (touched
          // during EnsureRequirements / columnar checks) predate the
          // filter; the scan's own partition planning is a def and
          // re-applies runtimeKeeps on the next call
          val nb = b.copy()
          nb.copyTagsFrom(b)
          nb
        }
    }
    if (!delivered) None
    else {
      val nj = j.buildSide match {
        case BuildRight => j.copy(left = newProbe)
        case BuildLeft  => j.copy(right = newProbe)
      }
      nj.copyTagsFrom(j) // keep logicalLink etc. for AQE's bookkeeping
      Some(nj)
    }
  }

  /** Range conjuncts of the join condition normalized to bounds on a
    * BARE probe-side column: (probe attr, build-side expr, V2 op,
    * lower?). A cast around the probe column is skipped (the zone-map
    * compare happens in the column's stored domain); mismatched operand
    * types never reach here because Catalyst equalizes them with casts. */
  private def boundsOf(cond: Expression, probe: SparkPlan,
      build: SparkPlan): Seq[BandBound] = {
    val probeOut = probe.outputSet
    val buildOut = AttributeSet(build.output)
    def buildSide(e: Expression): Boolean =
      e.deterministic && e.references.subsetOf(buildOut) &&
        supportedType(e.dataType) &&
        // a subquery expression has no row-level references but can't be
        // evaluated against the broadcast rows here
        !e.exists(_.isInstanceOf[PlanExpression[_]])
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, b)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, ">=", lower = true))
      case GreaterThan(a: AttributeReference, b)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, ">", lower = true))
      case LessThanOrEqual(a: AttributeReference, b)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, "<=", lower = false))
      case LessThan(a: AttributeReference, b)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, "<", lower = false))
      // literal-on-the-left shapes: `build <= probe` is a probe LOWER bound
      case GreaterThanOrEqual(b, a: AttributeReference)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, "<=", lower = false))
      case GreaterThan(b, a: AttributeReference)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, "<", lower = false))
      case LessThanOrEqual(b, a: AttributeReference)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, ">=", lower = true))
      case LessThan(b, a: AttributeReference)
          if probeOut.contains(a) && buildSide(b) =>
        Some(BandBound(a, b, ">", lower = true))
      case _ => None
    }
  }

  /** The materialized broadcast's driver-side rows — IdentityBroadcastMode
    * only (BNLJ's mode; a HashedRelation's rows aren't addressable as an
    * array). None when the build side isn't a finished broadcast stage. */
  private def broadcastRows(build: SparkPlan): Option[Array[InternalRow]] =
    build match {
      case s: BroadcastQueryStageExec if s.isMaterialized =>
        s.broadcast match {
          case b: BroadcastExchangeExec if b.mode == IdentityBroadcastMode =>
            // already materialized (stage gate above): get() returns the
            // finished future without blocking on anything in flight
            Some(b.relationFuture.get().value.asInstanceOf[Array[InternalRow]])
          case _ => None
        }
      case _ => None
    }

  /** Types the zone-map stat domain covers (DataSkipping.toStatVal) —
    * a bound of any other type would be delivered and ignored. */
  private def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }
}

object GraftBandJoinPruning {
  val EnabledKey = "spark.graft.bandPruning.enabled"
  val MaxBuildRowsKey = "spark.graft.bandPruning.maxBuildRows"
  /** Build-row ceiling for PER-WINDOW (OR-of-bands) delivery; above it
    * the rule folds to the hull interval instead of shipping one band
    * per row. */
  val MaxOrWindowsKey = "spark.graft.bandPruning.maxOrWindows"

  /** One normalized band bound: `attr <op> (agg over buildExpr)`. */
  private case class BandBound(attr: AttributeReference,
      buildExpr: Expression, op: String, lower: Boolean)
}
