package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.CosineSimilarity

/** Session extension registering graft's custom expressions as SQL
  * functions (the TVF/extension surface of §2.13 — the Spark-idiomatic
  * analog of the reference's `graph_accel_*` SQL set-returning functions
  * in graph-accel/ext/src, Rust).
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or  --conf spark.sql.extensions=graft.GraftExtensions
  * then `SELECT cosine_similarity(a.embedding, b.embedding) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      // cosine has a dedicated Expression class; the composed kernels
      // report this registrar so DESCRIBE FUNCTION doesn't mislabel them
      val className =
        if (name == "cosine_similarity") classOf[CosineSimilarity].getName
        else classOf[GraftExtensions].getName
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(className, name),
        builder))
    }
    GraftExtensions.tableBuilders.foreach { case (name, builder) =>
      ext.injectTableFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => CosineArgumentReorder)
    ext.injectOptimizerRule(_ => RelyKeyOptimization)
    ext.injectOptimizerRule(_ => CmsJoinSizing)
    // ANSI UPDATE over graft catalog tables — planned straight onto
    // SnapshotStore.update (graft.plans.GraftUpdateStrategy).
    ext.injectPlannerStrategy(_ => graft.plans.GraftUpdateStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.GraftMergeStrategy)
    // Deferred-side-effect TVFs (maintenance: vacuum/compact/adopt).
    ext.injectPlannerStrategy(_ => graft.plans.GraftDeferredActionStrategy)
    // Band-join runtime file pruning (AQE stage-optimizer rule — the
    // non-equi sibling of DPP; see GraftBandJoinPruning). Extension-only:
    // AQE's rule holders are sealed at session build, so `register` on an
    // already-built session cannot add this one — sessions wanting band
    // pruning must be built with spark.sql.extensions=graft.GraftExtensions
    // (all graft mains and the test harness are).
    ext.injectQueryStageOptimizerRule(s =>
      org.apache.spark.sql.graftbridge.GraftBandJoinPruning(s))
  }
}

/** Join-sizing CORRECTION from count-min sketches — the string-skew
  * analog of the numeric CBO histograms. Catalyst's FilterEstimation has
  * no bin-resolution path for STRING equality (its histogram bins are
  * doubles; `EstimationUtils.toDouble` never handles strings), so a hot
  * categorical filter like `rel_type = 'supports'` over a power-law
  * column estimates at the uniform 1/NDV — off by orders of magnitude in
  * either direction (reference's skew case: `rel_type`, ~120 values,
  * api/app/constants.py:22-87). The store's chain-merged `_cms.json`
  * sketches ([[graft.core.NdvStats]]) answer exactly that point query at
  * ±0.5%·rows, so this rule re-sizes the JOIN decision the mis-estimate
  * corrupts: the broadcast build side.
  *
  * Shape matched: a join side that is a Project/alias chain over a
  * Filter over a graft store relation whose conjuncts are ALL
  * string-equality predicates on
  * CMS-covered columns. The CMS estimate (product of per-conjunct
  * frequencies over rows — the estimator's own independence assumption)
  * then sizes the side, and the rule sets a join-strategy hint ONLY when
  * it provably DISAGREES with the uniform guess AND the gap is decisive:
  *   - naive ≤ threshold but CMS > 4×threshold → NO_BROADCAST_HASH (the
  *     "hot value" case: 1/NDV says tiny, reality is most of the table —
  *     without this the planner broadcasts a near-full fact and the
  *     driver/executors eat it at 100 TB);
  *   - naive > threshold but CMS ≤ threshold/2 → BROADCAST (the "absent
  *     value" case: 1/NDV says too big, reality is ~nothing — without
  *     this a shuffle join materializes both sides for a handful of
  *     rows).
  * User-provided hints are never overridden (orElse); the decisive-gap
  * guards keep the rule dormant near the threshold, so plans only change
  * where the uniform estimate is badly wrong. Fixed-point safe: a set
  * hint blocks re-evaluation. CMS frequencies OVER-count by design
  * (ε-error one-sided), which leans toward NO_BROADCAST — the safe
  * direction for memory. */
object CmsJoinSizing
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.execution.datasources.v2.{
    DataSourceV2Relation, DataSourceV2ScanRelation}
  import org.apache.spark.sql.types.StringType

  /** The graft store coordinates behind a plan node, if it is a store-
    * backed V2 relation (either side of the pushdown boundary). */
  private def graftTableOf(p: LogicalPlan)
      : Option[graft.sources.GraftTable] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.GraftTable if t.storeRoot.isDefined => Some(t)
      case _ => None
    }
    case r: DataSourceV2ScanRelation => r.relation.table match {
      case t: graft.sources.GraftTable if t.storeRoot.isDefined => Some(t)
      case _ => None
    }
    case _ => None
  }

  /** CMS-estimated surviving BYTES of a join side, when every filter
    * conjunct is a string-equality the chain sketches can answer. */
  private def cmsEstimate(side: LogicalPlan): Option[(Long, Long)] = {
    // strip aliases/projections (they don't change row counts)
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case Project(_, c) => strip(c)
      case _ => p
    }
    strip(side) match {
      case f @ Filter(cond, rel) =>
        graftTableOf(strip(rel)).flatMap { t =>
          def conj(e: Expression): Seq[Expression] = e match {
            case And(a, b) => conj(a) ++ conj(b)
            case other => Seq(other)
          }
          val conjuncts = conj(cond)
          val eqs = conjuncts.map {
            case EqualTo(a: AttributeReference, Literal(v, StringType))
                if a.dataType == StringType && v != null =>
              Some((a.name.toLowerCase(java.util.Locale.ROOT),
                v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                  .getBytes))
            case EqualTo(Literal(v, StringType), a: AttributeReference)
                if a.dataType == StringType && v != null =>
              Some((a.name.toLowerCase(java.util.Locale.ROOT),
                v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                  .getBytes))
            case _ => None
          }
          val eqCols = eqs.flatten.map(_._1).toSet
          // IsNotNull conjuncts ride along at selectivity 1: the
          // optimizer infers them from every equality and join key
          // (InferFiltersFromConstraints), they can only SHRINK the row
          // count, and both the CMS and the naive estimate ignore them
          // identically — a consistent upper bound, which errs toward
          // NO_BROADCAST, the memory-safe direction. Any OTHER residual
          // conjunct: stay dormant rather than mis-size.
          val residuals = conjuncts.zip(eqs).collect {
            case (c, None) => c
          }.filterNot(_.isInstanceOf[IsNotNull])
          if (residuals.nonEmpty || eqCols.isEmpty) None
          else {
            val spark = org.apache.spark.sql.SparkSession.active
            val store = new graft.core.SnapshotStore(spark, t.storeRoot.get)
            val cms = store.chainCms(t.tableName, t.snapshotVersion)
            val ndv = store.chainNdv(t.tableName, t.snapshotVersion)
            val terms = eqs.flatten.map { case (c, bytes) =>
              (cms.get(c), ndv.get(c), bytes)
            }
            if (terms.exists(x => x._1.isEmpty || x._2.isEmpty)) None
            else {
              val rows = terms.map(_._1.get.totalCount()).max
              if (rows <= 0L) None
              else {
                val sel = terms.map { case (s, _, bytes) =>
                  s.get.estimateCount(bytes).toDouble / rows
                }.product
                val naiveSel = terms.map(x =>
                  1.0 / math.max(1L, x._2.get)).product
                val rowBytes = (f.output.map(_.dataType.defaultSize).sum + 8)
                  .toLong
                Some(((sel * rows * rowBytes).toLong,
                  (naiveSel * rows * rowBytes).toLong))
              }
            }
          }
        }
      case _ => None
    }
  }

  /** The corrective hint for one side, or None when the CMS agrees with
    * the uniform guess (or nothing is provable). */
  private def sizeHint(side: LogicalPlan): Option[HintInfo] = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return None
    cmsEstimate(side).flatMap { case (cmsBytes, naiveBytes) =>
      if (naiveBytes <= threshold && cmsBytes > 4L * threshold)
        Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
      else if (naiveBytes > threshold && cmsBytes <= threshold / 2L)
        Some(HintInfo(strategy = Some(BROADCAST)))
      else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, hint)
        if hint.leftHint.isEmpty || hint.rightHint.isEmpty =>
      // Strictly best-effort, like every sizing heuristic: the sketch
      // read does filesystem I/O (chain sidecars of a possibly-vacuumed
      // or externally-cleaned snapshot), and a failed HINT must never
      // fail the QUERY at planning time.
      try {
        val lh = hint.leftHint.orElse(sizeHint(left))
        val rh = hint.rightHint.orElse(sizeHint(right))
        if (lh == hint.leftHint && rh == hint.rightHint) j
        else j.copy(hint = JoinHint(lh, rh))
      } catch { case scala.util.control.NonFatal(_) => j }
  }
}

/** Optimizer rule cashing in RELY'd key constraints (the POINT of
  * accepting `PRIMARY KEY … NOT ENFORCED RELY` metadata): when a graft
  * table declares a RELY'd PK/UNIQUE key, a `DISTINCT`/`dropDuplicates`
  * whose keys cover it is an identity — the rows are already unique — and
  * a `COUNT(DISTINCT key…)` is a plain `COUNT`. Both rewrites delete a
  * whole hash-aggregate EXCHANGE from the plan, which at 100 TB is the
  * difference between a metadata decision and re-shuffling the table.
  *
  * Soundness rails:
  *   - Keys resolve through a UNIQUENESS-PRESERVING operator chain only
  *     (Project/Filter/Sort/Limit/SubqueryAlias down to the V2 relation);
  *     any join/explode/union in between drops the claim.
  *   - Distinct/dedup elimination requires a NULL-SAFE key: a RELY'd
  *     PRIMARY KEY (not-null by declaration), or a RELY'd UNIQUE whose
  *     columns are non-nullable in the schema — SQL UNIQUE tolerates
  *     duplicate NULLs, and GROUP BY would merge them where the scan
  *     keeps both rows.
  *   - `COUNT(DISTINCT …)` → `COUNT(…)` needs no null-safety: COUNT
  *     skips any-null argument tuples on both sides, and the non-null
  *     tuples are exactly the ones the key promises distinct.
  *   - RELY is the user's explicit opt-in (Delta's semantic): the store
  *     never validates these keys; without RELY nothing rewrites.
  *
  * JOIN ELIMINATION (the other half of exploiting RELY'd keys — what
  * Oracle/Snowflake do with RELY constraints): when no column of the
  * joined side survives above the join, the join itself can be a
  * metadata decision:
  *   - LEFT OUTER to a covered RELY'd unique key: every left row
  *     survives a left join regardless of matching, and uniqueness
  *     bounds matches at one — so with no right column referenced above,
  *     the join changes nothing. Dropped. Extra non-equi conjuncts only
  *     shrink the match set, so they are allowed; null left keys never
  *     match under EqualTo, so UNIQUE's duplicate-NULL tolerance is
  *     harmless (only EqualTo conjuncts count toward key coverage).
  *   - INNER on a RELY'd FOREIGN KEY to its (whole, unfiltered) parent
  *     whose join keys also cover a RELY'd unique key of the parent:
  *     the FK promises ≥1 match for every non-null key, uniqueness
  *     promises ≤1 — exactly one. The join reduces to the child, plus
  *     an IS NOT NULL filter on any nullable FK column (inner join
  *     drops null-keyed rows; non-nullable FK columns need nothing).
  *     The parent must resolve to the FULL table — a filtered/limited
  *     parent could lose promised matches — both sides must live in the
  *     SAME store at their CURRENT snapshots (VERSION AS OF on either
  *     side breaks cross-table alignment), and the join's condition
  *     must be EXACTLY the FK's column set: a strict subset carries no
  *     promise (MATCH SIMPLE imposes nothing when any FK column is
  *     NULL), and an extra conjunct could fail a row. Semi/anti follow
  *     the same promise without the uniqueness requirement.
  *   At 100 TB either rewrite deletes a dimension scan AND the join
  *   exchange — the difference between touching one table and two.
  *
  * Reference contract analog: the reference's schema declares concept/
  * source PKs the AGE planner exploits implicitly (the schema SQL dump);
  * here the claim is explicit, opt-in, surfaced via Table.constraints(). */
object RelyKeyOptimization
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.aggregate._
  import org.apache.spark.sql.execution.datasources.v2.{
    DataSourceV2Relation, DataSourceV2ScanRelation}
  import org.apache.spark.sql.connector.catalog.constraints.{
    PrimaryKey, Unique}

  /** A RELY'd key: the exprIds its columns resolve to at the current
    * plan level, plus whether NULL duplicates are impossible (PK, or
    * every column non-nullable). */
  private final case class RelyKey(ids: Set[ExprId], nullSafe: Boolean)

  private def tableKeys(t: org.apache.spark.sql.connector.catalog.Table,
      output: Seq[Attribute]): Seq[RelyKey] = {
    val byName = output.map(a => a.name.toLowerCase -> a).toMap
    def resolve(cols: Array[
        org.apache.spark.sql.connector.expressions.NamedReference])
        : Option[Seq[Attribute]] = {
      val attrs = cols.toSeq.map(c =>
        if (c.fieldNames().length == 1) byName.get(c.fieldNames().head.toLowerCase)
        else None)
      if (attrs.forall(_.isDefined)) Some(attrs.map(_.get)) else None
    }
    try t.constraints().toSeq.flatMap {
      case pk: PrimaryKey if pk.rely() =>
        resolve(pk.columns()).map(as =>
          RelyKey(as.map(_.exprId).toSet, nullSafe = true))
      case u: Unique if u.rely() =>
        resolve(u.columns()).map(as =>
          RelyKey(as.map(_.exprId).toSet, nullSafe = as.forall(!_.nullable)))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** RELY'd keys visible at `plan`'s output, walked down through
    * uniqueness-preserving operators only. A Project re-maps ids through
    * identity/alias entries; a key any column of which is projected away
    * is dropped. Everything else (joins, generators, unions, aggregates)
    * conservatively ends the walk. */
  private def uniqueKeys(plan: LogicalPlan): Seq[RelyKey] = plan match {
    case SubqueryAlias(_, c) => uniqueKeys(c)
    case Filter(_, c) => uniqueKeys(c)
    case Sort(_, _, c, _) => uniqueKeys(c)
    case GlobalLimit(_, c) => uniqueKeys(c)
    case LocalLimit(_, c) => uniqueKeys(c)
    case Project(pl, c) =>
      val below = uniqueKeys(c)
      if (below.isEmpty) Nil
      else {
        val mapped: Map[ExprId, ExprId] = pl.collect {
          case a: AttributeReference => a.exprId -> a.exprId
          case al @ Alias(ar: AttributeReference, _) => ar.exprId -> al.exprId
        }.toMap
        below.flatMap(k =>
          if (k.ids.forall(mapped.contains)) Some(k.copy(ids = k.ids.map(mapped)))
          else None)
      }
    case r: DataSourceV2Relation => tableKeys(r.table, r.output)
    case r: DataSourceV2ScanRelation => tableKeys(r.relation.table, r.output)
    case _ => Nil
  }

  /** A plan's base graft table plus the map from its OUTPUT exprIds back
    * to base column names — what FK matching needs on both join sides.
    * `wholeTable` demands the unfiltered relation (Project/alias only):
    * the FK parent's promised match must not have been filtered or
    * limited away — EXCEPT pure `IsNotNull` conjuncts, which Catalyst's
    * own InferFiltersFromConstraints plants on every inner-join key;
    * those are recorded in `nullChecked` (base column names) for the
    * caller to prove harmless (a null-check on a join-key column cannot
    * remove the match promised to a non-null-keyed child row). With
    * `wholeTable = false`, Filter/Sort/Limit are value-preserving per
    * surviving row, which is all the FK child needs (the promise is
    * per-row, not per-table). */
  private final case class BaseTable(table: graft.sources.GraftTable,
      colOf: Map[ExprId, String], nullChecked: Set[String])
  private def baseTable(plan: LogicalPlan, wholeTable: Boolean)
      : Option[BaseTable] = plan match {
    case SubqueryAlias(_, c) => baseTable(c, wholeTable)
    case Filter(cond, c) =>
      if (!wholeTable) baseTable(c, wholeTable)
      else {
        val checks = splitConjunctivePredicates(cond).map {
          case IsNotNull(a: AttributeReference) => Some(a.name.toLowerCase)
          case _ => None
        }
        if (checks.forall(_.isDefined))
          baseTable(c, wholeTable).map(b =>
            b.copy(nullChecked = b.nullChecked ++ checks.flatten))
        else None
      }
    case Sort(_, _, c, _) if !wholeTable => baseTable(c, wholeTable)
    case GlobalLimit(_, c) if !wholeTable => baseTable(c, wholeTable)
    case LocalLimit(_, c) if !wholeTable => baseTable(c, wholeTable)
    case Project(pl, c) => baseTable(c, wholeTable).map { b =>
      b.copy(colOf = pl.collect {
        case a: AttributeReference if b.colOf.contains(a.exprId) =>
          a.exprId -> b.colOf(a.exprId)
        case al @ Alias(ar: AttributeReference, _)
            if b.colOf.contains(ar.exprId) =>
          al.exprId -> b.colOf(ar.exprId)
      }.toMap)
    }
    case r: DataSourceV2Relation => r.table match {
      case gt: graft.sources.GraftTable => Some(BaseTable(gt,
        r.output.map(a => a.exprId -> a.name.toLowerCase).toMap, Set.empty))
      case _ => None
    }
    case r: DataSourceV2ScanRelation => r.relation.table match {
      case gt: graft.sources.GraftTable => Some(BaseTable(gt,
        r.output.map(a => a.exprId -> a.name.toLowerCase).toMap, Set.empty))
      case _ => None
    }
    case _ => None
  }

  /** The RELY'd FOREIGN KEYs declared on `t`, as (referenced table name,
    * child-column → parent-column name pairs), lowercase. */
  private def relyForeignKeys(t: graft.sources.GraftTable)
      : Seq[(String, Seq[(String, String)])] = {
    import org.apache.spark.sql.connector.catalog.constraints.ForeignKey
    try t.constraints().toSeq.collect {
      case fk: ForeignKey if fk.rely() &&
          fk.columns().forall(_.fieldNames().length == 1) &&
          fk.referencedColumns().forall(_.fieldNames().length == 1) =>
        (fk.referencedTable().name().toLowerCase,
          fk.columns().map(_.fieldNames().head.toLowerCase).toSeq
            .zip(fk.referencedColumns().map(_.fieldNames().head.toLowerCase)
              .toSeq))
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Split a join condition into (left-attr, right-attr) EqualTo pairs
    * and the remaining conjuncts. */
  private def equiPairs(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): (Seq[(Attribute, Attribute)], Seq[Expression]) = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (eqs, rest) = conjuncts.partition {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
          (left.outputSet.contains(b) && right.outputSet.contains(a))
      case _ => false
    }
    (eqs.map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (left.outputSet.contains(a)) (a: Attribute, b: Attribute)
        else (b: Attribute, a: Attribute)
    }, rest)
  }
  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** LEFT OUTER elimination: no right column above, equi-keys cover a
    * RELY'd unique key of the right side → the join is an identity on
    * the left. Returns the replacement child. */
  private def eliminableLeftOuter(j: Join,
      refsAbove: AttributeSet): Option[LogicalPlan] = j match {
    case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftOuter, Some(cond), _)
        if refsAbove.subsetOf(l.outputSet) =>
      val (pairs, _) = equiPairs(cond, l, r)
      val rightIds = pairs.map(_._2.exprId).toSet
      if (pairs.nonEmpty &&
          uniqueKeys(r).exists(_.ids.subsetOf(rightIds))) Some(l) else None
    case _ => None
  }

  /** The FK-promise check shared by the inner and semi/anti
    * eliminations. Holds when: both sides resolve to base tables of the
    * SAME store at their CURRENT snapshots (an explicit
    * VERSION/TIMESTAMP AS OF pin on either side breaks cross-table
    * alignment — the RELY warrant is about the live tables, not an old
    * child against a new parent); the equi-pairs are EXACTLY the column
    * set of one RELY'd FK from left to right — a strict SUBSET carries
    * no promise, because MATCH SIMPLE semantics impose nothing when any
    * FK column is NULL, so a row matching on the subset may still have
    * no parent; and any parent-side null checks sit on join-key columns
    * only (inferred IsNotNull, harmless there). Returns the left
    * join-key attributes on success — the columns whose conjoined
    * IS NOT NULL reproduces the FK's match condition exactly.
    *
    * TRUST-SURFACE NOTE (torn-cut window): "current snapshots" is
    * checked per side (`!versionPinned`), but the two scans RESOLVE at
    * different instants — a child resolved after a transaction with its
    * parent resolved before it sees FK rows whose parents the physical
    * join would (transiently) miss, so the rewrite keeps rows the
    * un-rewritten plan would drop until both resolutions catch up. This
    * is within RELY's declared trust surface: RELY constraints are the
    * user's unverified warrant ABOUT THE LIVE TABLES, and the same
    * window exists for any two independent current-head reads (the
    * store's general read contract) — a reader needing one cut resolves
    * both sides through [[graft.core.SnapshotStore.snapshotAll]] /
    * `graft_snapshot_all` and pins, at which point this rewrite stands
    * down (`versionPinned`) and the physical join runs on the
    * consistent pair. */
  private def fkPromise(l: LogicalPlan, r: LogicalPlan,
      pairs: Seq[(Attribute, Attribute)]): Option[Seq[Attribute]] =
    (baseTable(l, wholeTable = false), baseTable(r, wholeTable = true)) match {
      case (Some(lb), Some(rb))
          if lb.table.storeRoot.isDefined &&
            lb.table.storeRoot == rb.table.storeRoot &&
            !lb.table.versionPinned && !rb.table.versionPinned =>
        val namePairs = pairs.flatMap { case (a, b) =>
          for (la <- lb.colOf.get(a.exprId); rc <- rb.colOf.get(b.exprId))
            yield (la, rc)
        }
        val ok = namePairs.length == pairs.length &&
          relyForeignKeys(lb.table).exists { case (refName, fkPairs) =>
            refName == rb.table.tableName.toLowerCase &&
              namePairs.forall(fkPairs.contains) &&
              fkPairs.forall(namePairs.contains)
          } &&
          rb.nullChecked.subsetOf(namePairs.map(_._2).toSet)
        if (ok) Some(pairs.map(_._1)) else None
      case _ => None
    }

  /** INNER FK elimination: the condition is exactly equi-pairs that (a)
    * all belong to one RELY'd FK from the left base table to the right
    * base table in the SAME store, with the right side the WHOLE table,
    * and (b) cover a RELY'd unique key of the right side. Exactly one
    * match per non-null-keyed left row → the join reduces to the left
    * child behind an IS NOT NULL filter on its nullable key columns. */
  private def eliminableInnerFk(j: Join,
      refsAbove: AttributeSet): Option[LogicalPlan] = j match {
    case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner, Some(cond), _)
        if refsAbove.subsetOf(l.outputSet) =>
      val (pairs, rest) = equiPairs(cond, l, r)
      if (pairs.isEmpty || rest.nonEmpty) None
      else {
        val rightIds = pairs.map(_._2.exprId).toSet
        val covered = uniqueKeys(r).exists(_.ids.subsetOf(rightIds))
        if (!covered) None
        else fkPromise(l, r, pairs).map { leftKeys =>
          val nullableKeys = leftKeys.filter(_.nullable).distinct
          if (nullableKeys.isEmpty) l
          else Filter(nullableKeys.map(IsNotNull(_): Expression)
            .reduce(And), l)
        }
      }
    case _ => None
  }

  /** LEFT SEMI / LEFT ANTI against a RELY'd FK's WHOLE parent: the FK
    * promises every non-null key a match, so the semi join ("EXISTS") is
    * an IS NOT NULL filter and the anti join ("NOT EXISTS") its
    * complement — no uniqueness needed (semi/anti never duplicate), no
    * Project wrapper needed (their output IS the left side). Emitted as
    * the Filter form even for non-nullable keys: Catalyst's own
    * NullPropagation folds IsNotNull(non-nullable) to true and
    * PruneFilters deletes it (or collapses the anti to empty). */
  private def eliminableSemiAnti(j: Join): Option[LogicalPlan] = {
    val (l, r, negate, cond) = j match {
      case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftSemi,
          Some(c), _) => (l, r, false, c)
      case Join(l, r, org.apache.spark.sql.catalyst.plans.LeftAnti,
          Some(c), _) => (l, r, true, c)
      case _ => return None
    }
    val (pairs, rest) = equiPairs(cond, l, r)
    if (pairs.isEmpty || rest.nonEmpty) return None
    fkPromise(l, r, pairs).map { leftKeys =>
      val allNotNull = leftKeys.distinct
        .map(IsNotNull(_): Expression).reduce(And)
      Filter(if (negate) Not(allNotNull) else allNotNull, l)
    }
  }

  /** An aggregate output a ONE-ROW group can project directly: a grouping
    * attribute, or First/Last/Min/Max over the single row (all four are
    * type- and value-preserving there; Sum/Avg/Count change type or
    * value). FILTER clauses disqualify (a filtered-out singleton yields
    * NULL, not the value). */
  private def singleRowProjection(ne: NamedExpression,
      groupIds: Set[ExprId]): Option[NamedExpression] = ne match {
    case ar: AttributeReference if groupIds.contains(ar.exprId) => Some(ar)
    case al @ Alias(e, name) => (e match {
      case AggregateExpression(First(x, _), _, _, None, _) => Some(x)
      case AggregateExpression(Last(x, _), _, _, None, _) => Some(x)
      case AggregateExpression(Min(x), _, _, None, _) => Some(x)
      case AggregateExpression(Max(x), _, _, None, _) => Some(x)
      case ar: AttributeReference if groupIds.contains(ar.exprId) => Some(ar)
      case _ => None
    }).map(x => Alias(x, name)(exprId = al.exprId, qualifier = al.qualifier,
      explicitMetadata = al.explicitMetadata))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // dropDuplicates over a covered null-safe key: identity
    case Deduplicate(keys, child)
        if uniqueKeys(child).exists(k =>
          k.nullSafe && k.ids.subsetOf(keys.map(_.exprId).toSet)) =>
      child
    // join elimination under a Project that keeps only left columns
    case p @ Project(pl, j: Join) =>
      val refs = AttributeSet(pl.flatMap(_.references))
      eliminableLeftOuter(j, refs).orElse(eliminableInnerFk(j, refs)) match {
        case Some(replacement) => p.copy(child = replacement)
        case None => p
      }
    // semi/anti output IS the left side — no wrapper needed (returning
    // the node unchanged is a no-op for transformUp)
    case j: Join => eliminableSemiAnti(j).getOrElse(j)
    case a0 @ Aggregate(groups, aggs, child0, _) =>
      // join elimination first when the aggregate sits DIRECTLY on an
      // eliminable join (the shape a grouped query leaves when nothing
      // above needs a Project); the rest of the case then works over
      // the simplified child in the same pass
      val child = child0 match {
        case j: Join => eliminableLeftOuter(j, a0.references)
          .orElse(eliminableInnerFk(j, a0.references)).getOrElse(child0)
        case _ => child0
      }
      val a = if (child eq child0) a0 else a0.copy(child = child)
      lazy val keys = uniqueKeys(child)
      val groupAttrs = groups.collect { case ar: AttributeReference => ar }
      val groupIds = groupAttrs.map(_.exprId).toSet
      val groupsCoverKey = groups.nonEmpty &&
        groups.length == groupAttrs.length &&
        keys.exists(k => k.nullSafe && k.ids.subsetOf(groupIds))
      val projected =
        if (!groupsCoverKey) None
        else {
          val ps = aggs.map(singleRowProjection(_, groupIds))
          if (ps.forall(_.isDefined)) Some(ps.map(_.get)) else None
        }
      projected match {
        // DISTINCT / GROUP-BY-key over a covered null-safe key: every
        // group is one row — the aggregate (and its exchange) deletes
        case Some(pl) => Project(pl, child)
        case None =>
          // COUNT(DISTINCT key…) → COUNT(key…): no exchange for the
          // distinct expansion; null tuples skip on both sides
          var changed = false
          val rewritten = aggs.map(_.transform {
            case ae @ AggregateExpression(Count(args), _, true, None, _)
                if args.nonEmpty &&
                  args.forall(_.isInstanceOf[AttributeReference]) &&
                  keys.exists(_.ids.subsetOf(
                    args.map(_.asInstanceOf[AttributeReference].exprId).toSet)) =>
              changed = true
              ae.copy(isDistinct = false)
          }.asInstanceOf[NamedExpression])
          if (changed) a.copy(aggregateExpressions = rewritten) else a
      }
  }
}

/** Optimizer rule: `cosine(lit, col)` → `cosine(col, lit)`. Cosine is
  * symmetric, so flipping arguments is semantics-preserving — and it puts
  * the constant on the right, where [[CosineSimilarity]]'s plan-time fold
  * (query values + norm computed once) applies. A user writing the query
  * vector first gets the same specialized codegen as the canonical V1
  * shape, the same way Catalyst's own rules canonicalize commutative
  * arithmetic. Registered via `injectOptimizerRule` (the §2.13 extension
  * surface), and post-hoc onto already-built sessions through
  * `spark.experimental.extraOptimizations` (`GraftExtensions.register`);
  * a plain session with neither simply keeps the generic path — the rule
  * is an optimization, never a correctness requirement. */
object CosineArgumentReorder
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.foldable && !r.foldable =>
        CosineSimilarity(r, l)
    }
}

object GraftExtensions {
  import org.apache.spark.sql.graftbridge.Bridge

  val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
    val arrD = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Cast(children.head, arrD),
      org.apache.spark.sql.catalyst.expressions.Cast(children(1), arrD))
  }

  /** The dedup kernels as SQL functions — the same formulas as the Column
    * API in `Dedup`, built as raw Catalyst trees (a `Column`-built
    * expression is an unevaluable ColumnNode wrapper inside a function
    * builder; composing catalyst classes keeps everything codegen'd). */
  private val jaccardBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "jaccard_similarity takes exactly 2 arguments")
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.DoubleType
    def d(e: Expression) = Cast(e, DoubleType)
    val Seq(a, b) = children
    val inter = d(Size(ArrayIntersect(a, b)))
    Divide(inter, Subtract(Add(d(Size(a)), d(Size(b))), inter))
  }
  private val hammingBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "hamming64 takes exactly 2 arguments")
    import org.apache.spark.sql.catalyst.expressions._
    BitwiseCount(BitwiseXor(children.head, children(1)))
  }
  private val portableHashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "portable_hash60 takes exactly 1 argument")
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, LongType}
    Cast(Conv(Substring(Md5(Cast(children.head, BinaryType)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> cosineBuilder,
    "jaccard_similarity" -> jaccardBuilder,
    "hamming64" -> hammingBuilder,
    "portable_hash60" -> portableHashBuilder)

  // --- table-valued functions: the direct analog of the reference's
  // graph_accel_* set-returning SQL functions (graph-accel/ext/src/
  // {neighborhood,degree,subgraph}.rs, called as `SELECT * FROM
  // graph_accel_neighborhood($1,$2,$3,$4)` at graph_facade.py:236-241).
  // The first argument names a registered view holding (src, dst[,
  // rel_type, confidence]) edges; the traversal runs through the same
  // auto-dispatching engines as the Scala API (accelerator below the
  // size threshold — like graph_accel, the work happens eagerly inside
  // the call) and the rows return as a LocalRelation.

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def constString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.toString
  }
  private def constInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what: expected a 32-bit integer literal, got $other")
    }
  }
  private def constLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$what: expected an integer literal, got $other")
    }
  }
  // The TVF builders return the traversal's own plan: the iterative
  // engines materialize per-hop checkpoints while CONSTRUCTING the
  // DataFrame (the eager part, exactly like the reference's Rust BFS
  // running inside the set-returning call), but the returned plan itself
  // stays lazy — a distributed result (e.g. graft_degree over an
  // over-threshold graph) is never collected to the driver.

  private val neighborhoodTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 3,
      "graft_neighborhood(edges_view, start_id, max_depth)")
    val spark = org.apache.spark.sql.SparkSession.active
    Bridge.analyzedPlan(graft.graph.GraphOps.bfsAuto(
      spark.table(constString(children.head, "edges_view")),
      Seq(constString(children(1), "start_id")),
      constInt(children(2), "max_depth")))
  }
  private val degreeTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 1, "graft_degree(edges_view)")
    val spark = org.apache.spark.sql.SparkSession.active
    Bridge.analyzedPlan(graft.graph.GraphOps.degrees(
      spark.table(constString(children.head, "edges_view"))))
  }
  private val subgraphTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 3,
      "graft_subgraph(edges_view, start_id, max_depth)")
    val spark = org.apache.spark.sql.SparkSession.active
    Bridge.analyzedPlan(graft.graph.GraphOps.inducedSubgraph(
      spark.table(constString(children.head, "edges_view")),
      constString(children(1), "start_id"),
      constInt(children(2), "max_depth")))
  }

  private val pathTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 4,
      "graft_path(edges_view, from_id, to_id, max_hops)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val path = graft.graph.GraphOps.shortestPathAuto(
      spark.table(constString(children.head, "edges_view")),
      constString(children(1), "from_id"),
      constString(children(2), "to_id"),
      constInt(children(3), "max_hops"))
    val rows = path match {
      case Some((hops, nodes)) =>
        nodes.zipWithIndex.map { case (n, i) => (i, n, hops) }
      case None => Seq.empty
    }
    Bridge.analyzedPlan(rows.toDF("step", "node", "total_hops"))
  }
  private val pathsTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 5,
      "graft_paths(edges_view, from_id, to_id, max_hops, max_paths)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val rows = graft.graph.GraphOps.kShortestPathsAuto(
        spark.table(constString(children.head, "edges_view")),
        constString(children(1), "from_id"),
        constString(children(2), "to_id"),
        constInt(children(3), "max_hops"),
        constInt(children(4), "max_paths"))
      .zipWithIndex.flatMap { case ((hops, nodes), p) =>
        nodes.zipWithIndex.map { case (n, i) => (p, i, n, hops) }
      }
    Bridge.analyzedPlan(rows.toDF("path_idx", "step", "node", "total_hops"))
  }
  private val loadTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 1, "graft_accel_load(edges_view)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    // graph_accel_load analog: probe + bulk-load the view into the
    // accelerator cache, idempotently. `loaded` reflects residency AFTER
    // the call (true on fresh load OR cache hit — a size-delta heuristic
    // would lie at LRU capacity); false means the view exceeds the size
    // threshold and the distributed engines own it.
    val g = graft.graph.GraphOps.ensureLoaded(
      spark.table(constString(children.head, "edges_view")))
    Bridge.analyzedPlan(
      Seq((g.isDefined, g.map(_.size.toLong).getOrElse(0L)))
        .toDF("loaded", "resident_nodes"))
  }
  private val statusTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.isEmpty, "graft_accel_status()")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val (graphs, nodes, over) = graft.graph.GraphOps.accelStatus
    Bridge.analyzedPlan(Seq((graphs.toLong, nodes, over.toLong))
      .toDF("loaded_graphs", "resident_nodes", "over_threshold_entries"))
  }
  private val invalidateTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.isEmpty, "graft_accel_invalidate()")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    graft.graph.GraphOps.invalidateAccel()
    Bridge.analyzedPlan(Seq(true).toDF("invalidated"))
  }

  private def constDouble(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what: expected a numeric literal, got $other")
    }
  }

  // Pipeline TVFs: the dedup/quality operators as set-returning SQL over
  // a registered (id/doc_id, text) view — the same lazy-plan contract as
  // the graph TVFs (the RETURNED plan is the operator's own distributed
  // plan; nothing collects). One view serves all three: each resolves the
  // document key as `doc_id` first, then `id`.
  private def resolveDocId(df: org.apache.spark.sql.DataFrame): String =
    Seq("doc_id", "id").find(df.columns.contains).getOrElse(
      throw new IllegalArgumentException(
        s"docs view needs a doc_id or id column, got " +
          df.columns.mkString("(", ", ", ")")))
  private val exactDedupTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 1, "graft_exact_dedup(docs_view)")
    val spark = org.apache.spark.sql.SparkSession.active
    val t = spark.table(constString(children.head, "docs_view"))
    Bridge.analyzedPlan(graft.dedup.Dedup.exactDedup(t, resolveDocId(t), "text"))
  }
  private val nearDupsTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2, "graft_near_dups(docs_view, min_jaccard)")
    val spark = org.apache.spark.sql.SparkSession.active
    val t = spark.table(constString(children.head, "docs_view"))
    Bridge.analyzedPlan(graft.dedup.Dedup.minhashNearDups(
      t, resolveDocId(t), "text",
      minJaccard = constDouble(children(1), "min_jaccard")))
  }
  private val qualityTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 1, "graft_quality(docs_view)")
    val spark = org.apache.spark.sql.SparkSession.active
    val t = spark.table(constString(children.head, "docs_view"))
    // gopherRules' contract names the key doc_id; an id-keyed view is
    // projected to it (output column is doc_id either way).
    val in = if (resolveDocId(t) == "doc_id") t
             else t.withColumnRenamed("id", "doc_id")
    Bridge.analyzedPlan(graft.queries.TextQueries.gopherRules(in))
  }

  // Snapshot-store SQL surface: time travel from SQL, the Delta/Iceberg
  // `VERSION AS OF` idiom over graft.core.SnapshotStore (M8's versioned
  // parquet layer). The returned plan is the store's own lazy parquet
  // scan — pinned to an immutable version directory at call time, so a
  // concurrent commit never mutates data under the running query.
  private val snapshotTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_snapshot(root, table[, version])")
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val table = constString(children(1), "table")
    Bridge.analyzedPlan(
      if (children.size == 3)
        store.readAt(table, constInt(children(2), "version").toLong)
      else store.read(table))
  }
  private val snapshotHistoryTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2, "graft_snapshot_history(root, table)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val table = constString(children(1), "table")
    val latest = store.latestVersion(table)
    // DESCRIBE HISTORY's shape: version, expose-time commit timestamp
    // (what TIMESTAMP AS OF resolves against), the producing operation
    // (commit-props tag; bare commits/appends carry none), and whether
    // the version is the current head.
    Bridge.analyzedPlan(store.history(table)
      .map { v =>
        (v,
          store.commitTimeOf(table, v).map(new java.sql.Timestamp(_)),
          store.commitProps(table, v).get(graft.core.SnapshotStore.OpProp),
          latest.contains(v))
      }
      .toDF("version", "commit_time", "op", "is_latest"))
  }

  // Batch change-feed TVF: the rows `append` admitted after since_version,
  // tagged with _version — the SQL catch-up read for incremental jobs
  // (Delta's table_changes analog over the store's v=n/_changes dirs).
  private val changesTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_changes(root, table[, since_version])")
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val table = constString(children(1), "table")
    val since =
      if (children.size == 3) constInt(children(2), "since_version").toLong else 0L
    Bridge.analyzedPlan(store.changesSince(table, since))
  }

  // Change-DATA feed TVF (Delta table_changes shape): inserts AND deletes
  // after since_version, tagged _change_type/_version — what a SQL
  // incremental consumer folds (retractions included) instead of
  // re-scanning the snapshot.
  private val changeFeedTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_change_feed(root, table[, since_version])")
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val table = constString(children(1), "table")
    val since =
      if (children.size == 3) constInt(children(2), "since_version").toLong else 0L
    Bridge.analyzedPlan(store.changeFeedSince(table, since))
  }

  // Bootstrap face of the change-data feed: the catch-up a consumer
  // below the vacuum horizon runs instead of being refused — the oldest
  // RETAINED snapshot as 'insert' images at its version + the true feed
  // after it (SnapshotStore.changeFeedBootstrap). A SQL consumer folds
  // this exactly like graft_change_feed, from empty.
  private val feedBootstrapTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2, "graft_feed_bootstrap(root, table)")
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    Bridge.analyzedPlan(
      store.changeFeedBootstrap(constString(children(1), "table")))
  }

  // Consistent multi-table cut TVF: one transactionally consistent
  // (table, version) vector — the SQL face of SnapshotStore.snapshotAll.
  // A SQL consumer pins each table to the cut with
  // `graft_snapshot(root, table, version)`, so a concept⋈edge query never
  // straddles an appendAll/deleteAll cascade's commit point the way two
  // independent graft_snapshot calls can.
  private val snapshotAllTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size >= 2,
      "graft_snapshot_all(root, table1[, table2, ...])")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val tables = children.tail.zipWithIndex.map { case (c, i) =>
      constString(c, s"table${i + 1}") }
    Bridge.analyzedPlan(store.snapshotAll(tables).toSeq.sorted
      .toDF("table_name", "version"))
  }

  // Maintained-view refresh TVFs (side-effecting, like graft_accel_load):
  // the SQL faces of MaterializedView.refresh and
  // JoinMaterializedView.refresh — fold unseen deltas, return the new
  // horizon(s). Idempotent: nothing new → the standing horizon returns
  // and no view version commits.
  private val refreshViewTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 5,
      "graft_refresh_view(root, src_table, view_table, key_col, val_col)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val h = graft.core.MaterializedView.refresh(store,
      constString(children(1), "src_table"), constString(children(2), "view_table"),
      constString(children(3), "key_col"), constString(children(4), "val_col"))
    Bridge.analyzedPlan(Seq(h.getOrElse(0L)).toDF("up_to_version"))
  }
  private val refreshJoinViewTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 8,
      "graft_refresh_join_view(root, left, right, left_key, right_key, " +
        "key_col, val_col, view_table)")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val h = graft.core.JoinMaterializedView.refresh(store,
      constString(children(1), "left"), constString(children(2), "right"),
      constString(children(3), "left_key"), constString(children(4), "right_key"),
      constString(children(5), "key_col"), constString(children(6), "val_col"),
      constString(children(7), "view_table"))
    Bridge.analyzedPlan(Seq(h.getOrElse((0L, 0L)))
      .toDF("left_version", "right_version"))
  }

  // Maintenance TVFs: the SQL faces of retention and layout upkeep, so a
  // SQL-first operator — the reference's job-queue workers
  // (api/app/services/job_queue.py) — can run the store's lifecycle
  // without a Scala entry point.
  //   graft_vacuum(root, table, keep_last)        → horizon + retained
  //   graft_vacuum_older_than(root, table, ts_ms) → horizon + retained
  //   graft_compact(root, table)                  → compacted version
  //   graft_adopt_field_ids(root, table)          → adopted version
  // All inherit the Scala APIs' safety rails unchanged: vacuum keeps the
  // pointer + chain closures and advances the feed horizon (below which
  // graft_change_feed refuses and graft_feed_bootstrap catches up);
  // compact/adopt are CAS commits that retry under hot appenders.
  // UNLIKE the refresh TVFs, the store call is DEFERRED to execution
  // through GraftDeferredAction: vacuum is irreversible, so EXPLAIN or
  // any dry-run resolution of a query naming these must not fire it
  // (argument validation still fails at analysis, where it belongs).
  private def deferredTvf(label: String,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)])(
      thunk: () => Seq[Seq[Any]]): LogicalPlan =
    graft.plans.GraftDeferredAction(label,
      cols.map { case (n, dt) =>
        org.apache.spark.sql.catalyst.expressions
          .AttributeReference(n, dt, nullable = false)()
      },
      thunk)

  private val horizonCols = Seq(
    "vacuum_horizon" -> org.apache.spark.sql.types.LongType,
    "retained_versions" -> org.apache.spark.sql.types.LongType)
  private val versionCols = Seq(
    "version" -> org.apache.spark.sql.types.LongType)

  private val vacuumTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_vacuum(root, table[, keep_last])")
    val root = constString(children.head, "root")
    val table = constString(children(1), "table")
    val keep = if (children.size == 3) constInt(children(2), "keep_last") else 1
    deferredTvf("graft_vacuum", horizonCols) { () =>
      val store = new graft.core.SnapshotStore(
        org.apache.spark.sql.SparkSession.active, root)
      store.vacuum(table, keepLast = keep)
      Seq(Seq(store.vacuumHorizon(table), store.history(table).size.toLong))
    }
  }
  private val vacuumOlderThanTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 3,
      "graft_vacuum_older_than(root, table, ts_millis)")
    val root = constString(children.head, "root")
    val table = constString(children(1), "table")
    val ts = constLong(children(2), "ts_millis")
    deferredTvf("graft_vacuum_older_than", horizonCols) { () =>
      val store = new graft.core.SnapshotStore(
        org.apache.spark.sql.SparkSession.active, root)
      store.vacuumOlderThan(table, ts)
      Seq(Seq(store.vacuumHorizon(table), store.history(table).size.toLong))
    }
  }
  private val compactTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_compact(root, table[, target_partitions])")
    val root = constString(children.head, "root")
    val table = constString(children(1), "table")
    val target =
      if (children.size == 3) constInt(children(2), "target_partitions") else 0
    deferredTvf("graft_compact", versionCols) { () =>
      val store = new graft.core.SnapshotStore(
        org.apache.spark.sql.SparkSession.active, root)
      Seq(Seq(store.compact(table, target)))
    }
  }
  // Table-statistics TVF (the reference's /database stats endpoints):
  // one row per column with EXACTLY what the optimizer sees — the scan's
  // own estimateStatistics/columnStats (chain-unioned NDV sketches,
  // zone-map-folded bounds and null counts) — plus the scan-level
  // rows/bytes. An operator checks "does CBO have stats for this join
  // key" with one SELECT instead of reading sidecar JSON.
  private val tableStatsTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2 || children.size == 3,
      "graft_table_stats(root, table[, version])")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val store = new graft.core.SnapshotStore(
      spark, constString(children.head, "root"))
    val table = constString(children(1), "table")
    val version =
      if (children.size == 3) Some(constLong(children(2), "version")) else None
    val t = graft.sources.GraftTable.forSnapshot(spark, store, table, version)
    val scan = t.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val stats = scan match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => null
    }
    // absence is NULL uniformly (no -1 sentinels a consumer could
    // mistake for data)
    val rows: Option[Long] =
      if (stats != null && stats.numRows.isPresent) Some(stats.numRows.getAsLong)
      else None
    val bytes: Option[Long] =
      if (stats != null && stats.sizeInBytes.isPresent)
        Some(stats.sizeInBytes.getAsLong)
      else None
    // bounds arrive as CATALYST-INTERNAL values; render date/timestamp
    // through their external forms (an operator reading "9204" for a
    // DATE column defeats the TVF's purpose)
    def render(v: Any, dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      import org.apache.spark.sql.types._
      (v, dt) match {
        case (d: java.lang.Integer, DateType) =>
          DateTimeUtils.toJavaDate(d.intValue).toString
        case (t: java.lang.Long, TimestampType) =>
          DateTimeUtils.toJavaTimestamp(t.longValue).toInstant.toString
        case (t: java.lang.Long, TimestampNTZType) =>
          DateTimeUtils.microsToLocalDateTime(t.longValue).toString
        case _ => String.valueOf(v)
      }
    }
    val byType = t.schema().fields.map(f => f.name -> f.dataType).toMap
    val byCol = if (stats == null) Map.empty[String, (Option[Long],
        Option[String], Option[String], Option[Long], Option[Long])]
      else {
        import scala.jdk.CollectionConverters._
        stats.columnStats().asScala.map { case (ref, cs) =>
          val name = ref.fieldNames().mkString(".")
          val dt = byType.getOrElse(name,
            org.apache.spark.sql.types.StringType)
          name -> ((
            if (cs.distinctCount.isPresent) Some(cs.distinctCount.getAsLong) else None,
            if (cs.min.isPresent) Some(render(cs.min.get, dt)) else None,
            if (cs.max.isPresent) Some(render(cs.max.get, dt)) else None,
            if (cs.nullCount.isPresent) Some(cs.nullCount.getAsLong) else None,
            // histogram READINESS: bin count when the scan reports one
            // (single-data-link DV-free chains — compact restores)
            if (cs.histogram.isPresent)
              Some(cs.histogram.get.bins().length.toLong)
            else None))
        }.toMap
      }
    val out = t.schema().fields.toSeq.map { f =>
      val (ndv, mn, mx, nulls, histBins) =
        byCol.getOrElse(f.name, (None, None, None, None, None))
      (f.name, f.dataType.simpleString, ndv, mn, mx, nulls, histBins,
        rows, bytes)
    }
    Bridge.analyzedPlan(out.toDF("column", "type", "ndv", "min", "max",
      "null_count", "histogram_bins", "table_rows", "table_bytes"))
  }

  private val adoptFieldIdsTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 2, "graft_adopt_field_ids(root, table)")
    val root = constString(children.head, "root")
    val table = constString(children(1), "table")
    deferredTvf("graft_adopt_field_ids", versionCols) { () =>
      Seq(Seq(new graft.core.SnapshotStore(
        org.apache.spark.sql.SparkSession.active, root).adoptFieldIds(table)))
    }
  }

  // Incrementally-maintained ADJACENCY layout refresh (r19,
  // graft.graph.AdjacencyStore over BucketedView): fold the edges
  // chain's delta past the view horizon into the node-bucketed view;
  // returns (version, horizon). DEFERRED like the maintenance TVFs —
  // unlike graft_refresh_view (which predates GraftDeferredAction and
  // is idempotent-at-analysis by design), a refresh COMMITS a view
  // version, and EXPLAIN must not move a table head.
  private val refreshAdjacencyTvf: Seq[Expression] => LogicalPlan = { children =>
    require(children.size == 3 || children.size == 4,
      "graft_refresh_adjacency(root, edges_table, view_table[, buckets])")
    val root = constString(children.head, "root")
    val edges = constString(children(1), "edges_table")
    val view = constString(children(2), "view_table")
    val buckets =
      if (children.size == 4) constInt(children(3), "buckets") else 32
    deferredTvf("graft_refresh_adjacency", Seq(
      "version" -> org.apache.spark.sql.types.LongType,
      "horizon" -> org.apache.spark.sql.types.LongType)) { () =>
      val store = new graft.core.SnapshotStore(
        org.apache.spark.sql.SparkSession.active, root)
      val v = graft.graph.AdjacencyStore.refresh(store, edges, view,
        buckets = buckets)
      Seq(Seq(v, store.resolvedProps(view, v)(
        graft.graph.AdjacencyStore.HorizonProp).toLong))
    }
  }

  val tableBuilders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_snapshot" -> snapshotTvf,
    "graft_snapshot_all" -> snapshotAllTvf,
    "graft_refresh_view" -> refreshViewTvf,
    "graft_refresh_join_view" -> refreshJoinViewTvf,
    "graft_refresh_adjacency" -> refreshAdjacencyTvf,
    "graft_vacuum" -> vacuumTvf,
    "graft_vacuum_older_than" -> vacuumOlderThanTvf,
    "graft_compact" -> compactTvf,
    "graft_adopt_field_ids" -> adoptFieldIdsTvf,
    "graft_table_stats" -> tableStatsTvf,
    "graft_snapshot_history" -> snapshotHistoryTvf,
    "graft_changes" -> changesTvf,
    "graft_change_feed" -> changeFeedTvf,
    "graft_feed_bootstrap" -> feedBootstrapTvf,
    "graft_exact_dedup" -> exactDedupTvf,
    "graft_near_dups" -> nearDupsTvf,
    "graft_quality" -> qualityTvf,
    "graft_neighborhood" -> neighborhoodTvf,
    "graft_degree" -> degreeTvf,
    "graft_subgraph" -> subgraphTvf,
    "graft_path" -> pathTvf,
    "graft_paths" -> pathsTvf,
    "graft_accel_load" -> loadTvf,
    "graft_accel_status" -> statusTvf,
    "graft_accel_invalidate" -> invalidateTvf)

  /** Arm Spark's cost-based optimizer for snapshot-store work in ONE
    * call: the graft scans always REPORT per-column statistics (chain-
    * unioned NDV sketches, zone-map-folded min/max/nullCount, and — on
    * compacted chains — equi-height histograms), but Catalyst only
    * CONSUMES them for filter selectivity and multi-table join
    * REORDERING behind these two flags. Session-wide by nature (they
    * change plans for every table), hence explicit: call this, or set
    * `spark.sql.catalog.<name>.cbo=true` on a graft catalog. */
  def enableCbo(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  /** Register on an already-built session (tests, REPL). Note data
    * skipping needs no registration at all — it lives in the connector's
    * FileIndex, below the extension surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
    tableBuilders.foreach { case (name, builder) =>
      Bridge.registerTableFunction(spark, name, builder)
    }
    // Planner strategies can't be injected into an ALREADY-BUILT session
    // through SparkSessionExtensions; the experimental-strategies hook is
    // the sanctioned post-hoc path (a session built with
    // spark.sql.extensions=graft.GraftExtensions gets it via apply above).
    val mutationStrategies = Seq(graft.plans.GraftUpdateStrategy,
      graft.plans.GraftMergeStrategy, graft.plans.GraftDeferredActionStrategy)
    val missing = mutationStrategies.filterNot(
      spark.experimental.extraStrategies.contains(_))
    if (missing.nonEmpty)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies ++ missing
    // Optimizer rules have the same post-hoc hook: extraOptimizations
    // (extension-built sessions get them via injectOptimizerRule above).
    val rules = Seq(CosineArgumentReorder, RelyKeyOptimization, CmsJoinSizing)
    val missingRules = rules.filterNot(
      spark.experimental.extraOptimizations.contains(_))
    if (missingRules.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missingRules
  }
}
