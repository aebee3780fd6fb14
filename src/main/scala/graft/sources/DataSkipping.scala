package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.FileStats
import graft.core.FileStats.{BoolVal, ColStats, DoubleVal, FileStat, LongVal, StatVal, StringVal}

/** Zone-map predicate evaluation: can a file whose manifest entry is `fs`
  * contain ANY row satisfying a predicate? The contract is one-sided —
  * `mayMatch` returning true proves nothing, returning false PROVES the
  * file contributes no rows, so the scan may drop it. Every unhandled
  * expression shape therefore answers true.
  *
  * Comparisons follow SQL three-valued logic: a NULL comparison result
  * never satisfies a Filter, so a column that is all-null in a file (or
  * physically absent — older chain files before an append added it) lets
  * any null-rejecting predicate prune the file outright.
  */
object DataSkipping {

  /** `resolve` maps a queried (logical) column name — lowercased — to the
    * PHYSICAL name the file was written under, when they differ: after a
    * metadata RENAME on a field-ID'd chain, pre-rename files hold the
    * column under its old name, and both the stats lookup and the
    * absent-means-null inference must follow the mapping or a renamed
    * column would prune files that match (the name is absent, the ID
    * isn't). Identity by default. */
  def mayMatch(cond: Expression, fs: FileStat,
      resolve: Map[String, String] = Map.empty): Boolean =
    if (fs.rows == 0L) false else eval(cond, fs, resolve)

  private def eval(e: Expression, fs: FileStat,
      resolve: Map[String, String]): Boolean = {
    implicit val rs: Map[String, String] = resolve
    e match {
      case And(l, r) => eval(l, fs, resolve) && eval(r, fs, resolve)
      case Or(l, r) => eval(l, fs, resolve) || eval(r, fs, resolve)
      case Literal(v, BooleanType) => v == true
      case EqualTo(a: Attribute, l: Literal) => cmp(fs, a, l, Op.Eq)
      case EqualTo(l: Literal, a: Attribute) => cmp(fs, a, l, Op.Eq)
      case EqualNullSafe(a: Attribute, l: Literal) =>
        if (l.value == null) nullPossible(fs, a) else cmp(fs, a, l, Op.Eq)
      case EqualNullSafe(l: Literal, a: Attribute) =>
        if (l.value == null) nullPossible(fs, a) else cmp(fs, a, l, Op.Eq)
      case LessThan(a: Attribute, l: Literal) => cmp(fs, a, l, Op.Lt)
      case LessThan(l: Literal, a: Attribute) => cmp(fs, a, l, Op.Gt)
      case LessThanOrEqual(a: Attribute, l: Literal) => cmp(fs, a, l, Op.Le)
      case LessThanOrEqual(l: Literal, a: Attribute) => cmp(fs, a, l, Op.Ge)
      case GreaterThan(a: Attribute, l: Literal) => cmp(fs, a, l, Op.Gt)
      case GreaterThan(l: Literal, a: Attribute) => cmp(fs, a, l, Op.Lt)
      case GreaterThanOrEqual(a: Attribute, l: Literal) => cmp(fs, a, l, Op.Ge)
      case GreaterThanOrEqual(l: Literal, a: Attribute) => cmp(fs, a, l, Op.Le)
      case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists(l => cmp(fs, a, l.asInstanceOf[Literal], Op.Eq))
      case InSet(a: Attribute, hset) =>
        hset.exists(v => cmp(fs, a, Literal(v, a.dataType), Op.Eq))
      case IsNull(a: Attribute) => nullPossible(fs, a)
      case IsNotNull(a: Attribute) => nonNullPossible(fs, a)
      case StartsWith(a: Attribute, Literal(p: UTF8String, StringType)) =>
        prefixPossible(fs, a, p.toString)
      case a: Attribute if a.dataType == BooleanType =>
        cmp(fs, a, Literal(true, BooleanType), Op.Eq)
      case Not(a: Attribute) if a.dataType == BooleanType =>
        cmp(fs, a, Literal(false, BooleanType), Op.Eq)
      case _ => true
    }
  }

  private object Op extends Enumeration { val Eq, Lt, Le, Gt, Ge = Value }

  /** Public face of [[toStatVal]] for the runtime-filter path: a V2
    * LiteralValue's (internal value, dataType) into the manifest's
    * comparable domain. None for NULL (which never satisfies IN) and for
    * types the manifest has no bounds domain for. */
  def statValOf(value: Any, dt: DataType): Option[StatVal] = toStatVal(value, dt)

  /** Runtime `col IN (vals)` zone-map check with `vals` SORTED ascending
    * (one shared domain — all values of one IN list carry one literal
    * type): binary-search the smallest value ≥ the file's min and test it
    * against the file's max, O(log V) per file instead of O(V). The
    * one-sided contract is [[mayMatch]]'s: false PROVES no row of the
    * file equals any value (IN over an all-null or absent column is never
    * true; a cross-domain comparison keeps the file). An EMPTY `vals`
    * matches nothing — the empty-build-side dynamic filter prunes every
    * file. */
  def mayMatchIn(fs: FileStat, colLower: String, sortedVals: Array[StatVal],
      resolve: Map[String, String] = Map.empty): Boolean = {
    if (fs.rows == 0L) return false
    if (sortedVals.isEmpty) return false
    implicit val rs: Map[String, String] = resolve
    val a = AttributeReference(colLower, NullType)() // name-only lookup key
    stateOf(fs, a) match {
      case AllNull => false
      case Unknown => true
      case Bounded(cs) =>
        (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            // comparability probe: one cross-domain pair keeps the file
            if (FileStats.compareOpt(sortedVals(0), mn).isEmpty ||
                FileStats.compareOpt(sortedVals(0), mx).isEmpty) return true
            var lo = 0
            var hi = sortedVals.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (FileStats.compare(sortedVals(mid), mn) < 0) lo = mid + 1
              else hi = mid
            }
            lo < sortedVals.length && FileStats.compare(sortedVals(lo), mx) <= 0
          case _ => true // bounds withheld: no proof, keep
        }
    }
  }

  /** Runtime RANGE zone-map check: may any row of the file fall in
    * (lower, upper)? Bounds are optional and each carries its
    * inclusivity. Same one-sided contract as [[mayMatchIn]]: false PROVES
    * the file's [min, max] misses the range entirely (a range predicate
    * over an all-null or absent column is never true); cross-domain
    * comparisons and withheld bounds keep the file. */
  def mayMatchRange(fs: FileStat, colLower: String,
      lower: Option[(StatVal, Boolean)], upper: Option[(StatVal, Boolean)],
      resolve: Map[String, String] = Map.empty): Boolean = {
    if (fs.rows == 0L) return false
    implicit val rs: Map[String, String] = resolve
    val a = AttributeReference(colLower, NullType)() // name-only lookup key
    stateOf(fs, a) match {
      case AllNull => false
      case Unknown => true
      case Bounded(cs) =>
        // lower bound vs file MAX: the file holds a qualifying row only
        // if its max reaches the lower bound; dually for upper vs min.
        val lowerOk = (lower, cs.max) match {
          case (Some((lo, incl)), Some(mx)) =>
            FileStats.compareOpt(mx, lo) match {
              case Some(c) => if (incl) c >= 0 else c > 0
              case None => true // cross-domain: no proof
            }
          case _ => true
        }
        val upperOk = (upper, cs.min) match {
          case (Some((hi, incl)), Some(mn)) =>
            FileStats.compareOpt(mn, hi) match {
              case Some(c) => if (incl) c <= 0 else c < 0
              case None => true
            }
          case _ => true
        }
        lowerOk && upperOk
    }
  }

  /** Catalyst literal internal value → the manifest's comparable domain.
    * Timestamp/date literals are already epoch micros / days internally, so
    * this is representation alignment, not a conversion. */
  private def toStatVal(value: Any, dt: DataType): Option[StatVal] = {
    if (value == null) return None
    dt match {
      case ByteType => Some(LongVal(value.asInstanceOf[Byte].toLong))
      case ShortType => Some(LongVal(value.asInstanceOf[Short].toLong))
      case IntegerType => Some(LongVal(value.asInstanceOf[Int].toLong))
      case LongType => Some(LongVal(value.asInstanceOf[Long]))
      case FloatType => // exact widening — the manifest widened floats the same way
        val f = value.asInstanceOf[Float]
        if (f.isNaN) None
        else Some(DoubleVal(FileStats.canonDouble(f.toDouble)))
      case DoubleType =>
        val d = value.asInstanceOf[Double]
        if (d.isNaN) None
        else Some(DoubleVal(FileStats.canonDouble(d))) // -0.0 == 0.0 in SQL
      case StringType => Some(StringVal(value.asInstanceOf[UTF8String].toString))
      case BooleanType => Some(BoolVal(value.asInstanceOf[Boolean]))
      case DateType => Some(LongVal(value.asInstanceOf[Int].toLong))
      case TimestampType | TimestampNTZType =>
        Some(LongVal(value.asInstanceOf[Long]))
      case _ => None
    }
  }

  /** Column state within a file, derived from the manifest. */
  private sealed trait ColState
  private case object Unknown extends ColState // no usable info
  private case object AllNull extends ColState // every row NULL (or column absent)
  private final case class Bounded(cs: ColStats) extends ColState

  private def stateOf(fs: FileStat, a: Attribute)(
      implicit resolve: Map[String, String]): ColState = {
    val name = resolve.getOrElse(a.name.toLowerCase, a.name.toLowerCase)
    fs.cols.get(name) match {
      case None =>
        // Physically absent column reads as NULL on every row (pinned
        // snapshot schema over an older chain file). Absent from stats but
        // present in the file: no information.
        if (fs.leaves.contains(name)) Unknown else AllNull
      case Some(cs) =>
        if (cs.nullCount.contains(fs.rows)) AllNull
        else Bounded(cs)
    }
  }

  private def nullPossible(fs: FileStat, a: Attribute)(
      implicit resolve: Map[String, String]): Boolean =
    stateOf(fs, a) match {
      case AllNull => true
      case Unknown => true
      case Bounded(cs) => cs.nullCount.forall(_ > 0L)
    }

  private def nonNullPossible(fs: FileStat, a: Attribute)(
      implicit resolve: Map[String, String]): Boolean =
    stateOf(fs, a) match {
      case AllNull => false
      case _ => true
    }

  private def cmp(fs: FileStat, a: Attribute, l: Literal, op: Op.Value)(
      implicit resolve: Map[String, String]): Boolean = {
    if (l.value == null) return false // comparison with NULL is never true
    stateOf(fs, a) match {
      case AllNull => false
      case Unknown => true
      case Bounded(cs) =>
        toStatVal(l.value, l.dataType) match {
          case None => true
          case Some(v) =>
            // Literal-vs-bound comparison: Some(c) within a comparable
            // domain, None on a domain mismatch (corrupt-but-parseable
            // manifest) — which must KEEP the file, exactly like the
            // corrupt-manifest fallback, never prune it.
            val cMin = cs.min.map(m => FileStats.compareOpt(v, m))
            val cMax = cs.max.map(m => FileStats.compareOpt(v, m))
            if (cMin.exists(_.isEmpty) || cMax.exists(_.isEmpty)) true
            else {
              val geMin = cMin.forall(_.exists(_ >= 0))
              val gtMin = cMin.forall(_.exists(_ > 0))
              val leMax = cMax.forall(_.exists(_ <= 0))
              val ltMax = cMax.forall(_.exists(_ < 0))
              op match {
                case Op.Eq => geMin && leMax // v inside [min, max]
                case Op.Lt => gtMin // some row < v ⟺ min < v
                case Op.Le => geMin // some row ≤ v ⟺ min ≤ v
                case Op.Gt => ltMax // some row > v ⟺ max > v
                case Op.Ge => leMax // some row ≥ v ⟺ max ≥ v
              }
            }
        }
    }
  }

  /** `col LIKE 'p%'`: the matching set is the string interval
    * [p, successor(p)); overlap with [min, max] requires max ≥ p and
    * min's |p|-char prefix ≤ p. ASCII bounds (the only kind the manifest
    * stores) make Java string order agree with parquet's byte order here. */
  private def prefixPossible(fs: FileStat, a: Attribute, p: String)(
      implicit resolve: Map[String, String]): Boolean =
    stateOf(fs, a) match {
      case AllNull => false
      case Unknown => true
      case Bounded(cs) =>
        val maxOk = cs.max.forall {
          case StringVal(mx) => mx.compareTo(p) >= 0 // p-prefixed values are ≥ p
          case _ => true
        }
        val minOk = cs.min.forall {
          case StringVal(mn) => mn.take(p.length).compareTo(p) <= 0
          case _ => true
        }
        maxOk && minOk
    }
}
