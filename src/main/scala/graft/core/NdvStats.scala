package graft.core

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Base64

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-column DISTINCT-COUNT sketches for a snapshot-store version — the
  * third statistic (after `_stats.json`'s min/max/null-counts) Spark's
  * cost-based optimizer needs to estimate equi-join cardinalities
  * (|A⋈B| ≈ |A|·|B| / max(ndv)) and therefore to REORDER multi-table
  * store joins (reference analog: Postgres ANALYZE n_distinct feeding its
  * planner, which the reference leans on implicitly for every
  * api/app query; schema/00_baseline.sql's btree'd keys).
  *
  * Computed with ZERO extra passes: the commit's write job carries an
  * [[org.apache.spark.sql.Observation]] whose metrics are
  * `hll_sketch_agg` per eligible column (Spark's DataSketches HLL, the
  * same family Iceberg stores in its puffin stat files), so the sketch
  * rides the write's own scan. Serialized sketches land in `_ndv.json`
  * (column → base64), strictly best-effort like `_stats.json`: a crash
  * here leaves a valid, merely CBO-blind version.
  *
  * CHAIN reads union the links' sketches (HLL unions are lossless, the
  * whole point of sketching over exact sets): an append chain's NDV is
  * the union estimate, never a naive sum. Tombstoned/DV'd rows stay in
  * their link's sketch, so a delete-heavy chain over-estimates NDV until
  * compact rewrites it — the conservative direction for join sizing
  * (an over-estimated NDV under-estimates join fan-out, matching the
  * no-stats default rather than inventing selectivity). */
object NdvStats {

  val NdvFileName = "_ndv.json"

  /** Equi-height histogram sidecar: column → k+1 quantile boundaries
    * (doubles), from `percentile_approx` riding the same write-job
    * Observation as the NDV sketches. Read back as CBO histograms
    * ([[graft.sources.GraftTable]] → connector ColumnStatistics →
    * Catalyst's FilterEstimation), where they turn skewed-value
    * selectivities from 1/ndv guesses into bin-resolution estimates.
    * Since r19 the sidecar also carries per-column NON-NULL ROW WEIGHTS
    * (`__weights__` entry, from a `count(col)` metric on the same
    * Observation), which is what makes the per-link histograms
    * MERGEABLE: an append chain's histogram is the weighted-CDF mix of
    * its links' piecewise-uniform distributions, re-inverted at k
    * equi-height boundaries ([[mergeEquiHeight]]) — the same
    * union-across-links discipline as the HLL NDV sketches, so the
    * append-heavy steady state keeps bin-resolution estimates instead
    * of falling back to 1/NDV until compact. */
  val HistFileName = "_hist.json"

  /** Count-min sketch sidecar: STRING column → base64 CMS, from
    * `count_min_sketch` riding the same write-job Observation. Strings
    * are the skew case Catalyst's double-binned histograms cannot
    * describe (the reference's hot categorical key is `rel_type`, ~120
    * power-law values — api/app/constants.py:22-87): the sketch answers
    * point-frequency queries at ±eps·rows, and CMS merges are EXACT
    * (counter-wise sums), so chains union losslessly like the NDV
    * sketches. Consumed by the join-sizing rule
    * ([[graft.GraftExtensions]]) to pick the right build side under a
    * hot-string-equality filter. */
  val CmsFileName = "_cms.json"

  /** CMS shape: eps 0.5% of rows, 99% confidence → 400×7 longs ≈ 22 KB
    * per string column per link. */
  val CmsEps = 0.005
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** Equi-height bin count. 32 resolves a hot key down to ~3% of rows
    * while keeping the sidecar at 33 doubles per column (ANALYZE's
    * default 254 buys little at estimate precision). */
  val HistBins = 32

  /** Spark's hll_sketch_agg default lgConfigK. */
  private val LgK = 12

  /** Histogram metric prefix inside the shared Observation (the NDV
    * metrics are keyed by bare lowercased column name). */
  private val HistPrefix = "__graft_hist__"

  /** Non-null row-count metric prefix (the histogram's merge weight). */
  private val HistNPrefix = "__graft_histn__"

  /** Count-min-sketch metric prefix (string columns). */
  private val CmsPrefix = "__graft_cms__"

  /** The `__weights__` key inside `_hist.json`. */
  private val WeightsKey = "__weights__"

  /** Histogram-eligible column expression: NUMERIC domains only — the
    * Catalyst histogram bins are doubles, and numeric casts are the 1:1
    * path. (Dates/timestamps have internal numeric forms but ANALYZE-
    * grade fidelity there isn't worth the cast subtleties; they keep
    * min/max + NDV.) */
  private def histExpr(f: StructField): Option[org.apache.spark.sql.Column] =
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType =>
        Some(col(s"`${f.name}`").cast(DoubleType))
      case _ => None
    }

  /** The sketchable column expression, or None when the type has no
    * 1:1 cheap encoding (hll_sketch_agg accepts int/long/string/binary;
    * every encoding below preserves distinct-count exactly). */
  private def sketchExpr(f: StructField): Option[org.apache.spark.sql.Column] = {
    val c = col(s"`${f.name}`")
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(c.cast(LongType))
      case StringType => Some(c)
      case BinaryType => Some(c)
      // timestamps sketch their exact micros: a string cast renders
      // SESSION-LOCAL time without offset, so two distinct instants in a
      // DST fall-back hour collide — an UNDER-counted NDV, the dangerous
      // direction. unix_micros is the 1:1 internal value.
      case TimestampType => Some(unix_micros(c))
      // date (no DST in epoch days) and NTZ (no zone at all) render 1:1
      case DateType | TimestampNTZType => Some(c.cast(StringType))
      // float/double: canonical toString is 1:1 per distinct bit pattern
      // (NaN collapses — irrelevant at estimate precision)
      case FloatType | DoubleType => Some(c.cast(StringType))
      case _: DecimalType => Some(c.cast(StringType))
      case BooleanType => Some(c.cast(LongType))
      case _ => None // nested/array/map: no NDV
    }
  }

  /** Wrap a to-be-written frame with an NDV observation: returns the
    * wrapped frame and the harvest handle (None when no column is
    * sketchable — the observe node is not free, don't add it for
    * nothing). Metrics come from the FRAME's own columns, not the merged
    * snapshot schema: an append delta legitimately lacks columns a later
    * link added (they read as NULL there — zero distinct values — which
    * is exactly how [[chainNdv]] treats the missing sketch). */
  def observed(df: DataFrame)
      : (DataFrame, Option[(Observation, Seq[String])]) = {
    val ndvMetrics = df.schema.fields.toSeq.flatMap { f =>
      // Locale.ROOT like every reader: the default locale would key "ID"
      // as dotless-i under Turkish locales and lose the sketch silently
      val n = f.name.toLowerCase(java.util.Locale.ROOT)
      sketchExpr(f).map(e => n -> hll_sketch_agg(e, lit(LgK)).as(n))
    }
    // equi-height boundaries ride the SAME observation — still one pass;
    // each histogram column also gets its NON-NULL COUNT (the weight the
    // chain merge mixes CDFs by) and string columns a count-min sketch
    val histMetrics = df.schema.fields.toSeq.flatMap { f =>
      val base = f.name.toLowerCase(java.util.Locale.ROOT)
      val n = HistPrefix + base
      val pcts = array((0 to HistBins).map(i =>
        lit(i.toDouble / HistBins)): _*)
      histExpr(f).toSeq.flatMap(e => Seq(
        n -> percentile_approx(e, pcts, lit(10000)).as(n),
        (HistNPrefix + base) ->
          count(col(s"`${f.name}`")).as(HistNPrefix + base)))
    }
    val cmsMetrics = df.schema.fields.toSeq.flatMap { f =>
      val n = CmsPrefix + f.name.toLowerCase(java.util.Locale.ROOT)
      f.dataType match {
        case StringType => Some(n -> count_min_sketch(col(s"`${f.name}`"),
          lit(CmsEps), lit(CmsConfidence), lit(CmsSeed)).as(n))
        case _ => None
      }
    }
    val metrics = (ndvMetrics ++ histMetrics ++ cmsMetrics)
      // Case-sensitive-mode frames can carry "ID" and "id" as distinct
      // columns; their metric names collide after lowercasing and the
      // duplicate alias fails the observe ANALYSIS — which would fail the
      // whole commit, not just this best-effort sidecar. Keep the first
      // (the reader keys by lowercase anyway; the union is an estimate).
      .distinctBy(_._1)
    if (metrics.isEmpty) (df, None)
    else {
      val obs = Observation("graft_ndv_" + java.util.UUID.randomUUID())
      (df.observe(obs, metrics.head._2, metrics.tail.map(_._2): _*),
        Some((obs, metrics.map(_._1))))
    }
  }

  /** Harvest the observation (the write action has completed, so `get`
    * returns immediately) and write `_ndv.json` into the version dir —
    * temp + atomic rename like every store sidecar. Best-effort by
    * contract: callers swallow failures. */
  def write(versionDir: Path, harvest: (Observation, Seq[String])): Unit = {
    val (obs, names) = harvest
    val got = obs.get
    val entries = names.filterNot(n => n.startsWith(HistPrefix) ||
        n.startsWith(HistNPrefix) || n.startsWith(CmsPrefix)).flatMap { n =>
      got.get(n) match {
        case Some(bytes: Array[Byte]) if bytes.nonEmpty =>
          Some(n -> Base64.getEncoder.encodeToString(bytes))
        case _ => None // column all-null in this delta, or metric missing
      }
    }
    if (entries.nonEmpty) {
      val tmp = versionDir.resolve(NdvFileName + ".tmp")
      Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(
        JObject(entries.sortBy(_._1).map { case (k, v) =>
          k -> JString(v) }.toList))))
      Files.move(tmp, versionDir.resolve(NdvFileName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    // histogram boundaries (+ their merge weights) → _hist.json
    val hists = names.filter(_.startsWith(HistPrefix)).flatMap { n =>
      got.get(n) match {
        case Some(bs: scala.collection.Seq[_]) if bs.nonEmpty =>
          val ds = bs.flatMap {
            case null => None
            case x: Number => Some(x.doubleValue)
            case _ => None
          }
          // all-null columns yield an empty/degenerate array: no histogram
          if (ds.length == HistBins + 1)
            Some(n.stripPrefix(HistPrefix) ->
              (JArray(ds.toList.map(JDouble(_))): JValue))
          else None
        case _ => None
      }
    }
    if (hists.nonEmpty) {
      val histCols = hists.map(_._1).toSet
      val weights = names.filter(_.startsWith(HistNPrefix)).flatMap { n =>
        val c = n.stripPrefix(HistNPrefix)
        got.get(n) match {
          case Some(x: Number) if histCols.contains(c) =>
            Some(c -> (JLong(x.longValue): JValue))
          case _ => None
        }
      }
      val body = hists.sortBy(_._1) ++
        (if (weights.nonEmpty)
          Seq(WeightsKey -> (JObject(weights.sortBy(_._1).toList): JValue))
        else Nil)
      val tmp = versionDir.resolve(HistFileName + ".tmp")
      Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(
        JObject(body.toList))))
      Files.move(tmp, versionDir.resolve(HistFileName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    // string count-min sketches → _cms.json (same temp+rename)
    val sketches = names.filter(_.startsWith(CmsPrefix)).flatMap { n =>
      got.get(n) match {
        case Some(bytes: Array[Byte]) if bytes.nonEmpty =>
          Some(n.stripPrefix(CmsPrefix) ->
            Base64.getEncoder.encodeToString(bytes))
        case _ => None // all-null string column in this delta
      }
    }
    if (sketches.nonEmpty) {
      val tmp = versionDir.resolve(CmsFileName + ".tmp")
      Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(
        JObject(sketches.sortBy(_._1).map { case (k, v) =>
          k -> JString(v) }.toList))))
      Files.move(tmp, versionDir.resolve(CmsFileName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** One version directory's histogram boundaries (column → k+1 sorted
    * quantiles), empty when absent/unreadable. */
  def readHist(versionDir: Path): Map[String, Array[Double]] = {
    val f = versionDir.resolve(HistFileName)
    if (!Files.exists(f)) Map.empty
    else try JsonMethods.parse(Files.readString(f)) match {
      case JObject(fields) => fields.collect {
        case (k, JArray(vs)) => k -> vs.collect {
          case JDouble(d) => d
          case JInt(i) => i.toDouble
        }.toArray
      }.toMap
      case _ => Map.empty
    } catch { case NonFatal(_) => Map.empty }
  }

  /** Per-column non-null row weights recorded with a version's histogram
    * (`__weights__` in `_hist.json`); empty for pre-r19 sidecars. */
  def readHistWeights(versionDir: Path): Map[String, Long] = {
    val f = versionDir.resolve(HistFileName)
    if (!Files.exists(f)) Map.empty
    else try JsonMethods.parse(Files.readString(f)) match {
      case JObject(fields) => fields.collectFirst {
        case (WeightsKey, JObject(ws)) => ws.collect {
          case (k, JLong(n)) => k -> n
          case (k, JInt(n)) => k -> n.toLong
        }.toMap
      }.getOrElse(Map.empty)
      case _ => Map.empty
    } catch { case NonFatal(_) => Map.empty }
  }

  /** Merge per-link equi-height histograms into one: each link's bounds
    * + non-null row weight describe a piecewise-uniform distribution
    * (point bins — lo == hi, a hot value — are point MASSES); the union
    * CDF is their weighted mix, re-inverted at k equi-height targets.
    * Jump-aware inversion: a target landing inside a point mass returns
    * the point itself, so a hot value that dominates the union keeps its
    * SINGLETON bins — the property the skewed-equality estimate rides
    * (equiHeightHistogram gives lo==hi bins NDV 1). An approximation of
    * an approximation, in the same spirit as t-digest merging — strictly
    * better than the 1/NDV fallback it replaces on append chains. */
  def mergeEquiHeight(links: Seq[(Array[Double], Long)], bins: Int)
      : Option[Array[Double]] = {
    val ls = links.filter { case (b, w) => b.length >= 2 && w > 0L }
    if (ls.isEmpty) return None
    if (ls.length == 1) return Some(ls.head._1)
    val total = ls.map(_._2.toDouble).sum
    val xs = ls.flatMap(_._1).distinct.sorted.toArray
    // mass strictly below x / at-or-below x for one link
    def mass(b: Array[Double], w: Double, x: Double, inclusive: Boolean)
        : Double = {
      val n = b.length - 1; val per = w / n
      var m = 0.0; var i = 0
      while (i < n) {
        val lo = b(i); val hi = b(i + 1)
        if (hi == lo) { // point mass
          if (if (inclusive) x >= lo else x > lo) m += per
        } else if (x >= hi) m += per
        else if (x > lo) m += per * (x - lo) / (hi - lo)
        i += 1
      }
      m
    }
    val below = xs.map(x => ls.map { case (b, w) =>
      mass(b, w.toDouble, x, inclusive = false) }.sum)
    val at = xs.map(x => ls.map { case (b, w) =>
      mass(b, w.toDouble, x, inclusive = true) }.sum)
    val out = new Array[Double](bins + 1)
    out(0) = xs.head; out(bins) = xs.last
    var j = 1
    while (j < bins) {
      val target = total * j / bins
      var i = 0
      while (i < xs.length && at(i) < target) i += 1
      out(j) =
        if (i >= xs.length) xs.last
        else if (target > below(i) || i == 0) xs(i) // inside the jump at xs(i)
        else {
          // continuous span (xs(i-1), xs(i)): interpolate between the
          // previous point's at-mass and this point's below-mass
          val m0 = at(i - 1); val m1 = below(i)
          if (m1 <= m0) xs(i)
          else xs(i - 1) + (xs(i) - xs(i - 1)) *
            math.min(1.0, math.max(0.0, (target - m0) / (m1 - m0)))
        }
      j += 1
    }
    Some(out)
  }

  /** The chain's histograms. One data-carrying link: its boundaries
    * verbatim (a self-contained commit or a compact — exact, no weight
    * needed). SEVERAL data links: the weighted-CDF merge
    * ([[mergeEquiHeight]]) over the links' boundaries and `__weights__`,
    * so append chains keep bin-resolution estimates (r18 withheld them
    * until compact). Gating mirrors [[chainNdv]]: a data link with NO
    * `_hist.json` at all predates the sidecar (or crashed its write) —
    * unknown rows, so it gates every column; a link WITH the sidecar but
    * missing a column wrote it absent/all-null — zero weight, skipped.
    * A multi-link chain whose links lack weights (pre-r19 sidecars)
    * cannot merge and reports nothing until compact, the old behavior. */
  def chainHist(dirs: Seq[Path], linkHasData: Path => Boolean,
      resolve: Path => Map[String, String] = _ => Map.empty)
      : Map[String, Array[Double]] = {
    val dataDirs = dirs.filter(linkHasData)
    if (dataDirs.isEmpty) return Map.empty
    if (dataDirs.length == 1) {
      val d = dataDirs.head
      val physToLogical = resolve(d).map(_.swap)
      return readHist(d).map { case (k, v) => physToLogical.getOrElse(k, k) -> v }
    }
    // rename-aware per-link (bounds, weights), keyed by head-logical name
    val perLink = dataDirs.map { d =>
      val physToLogical = resolve(d).map(_.swap)
      val bounds = readHist(d).map { case (k, v) =>
        physToLogical.getOrElse(k, k) -> v }
      val weights = readHistWeights(d).map { case (k, v) =>
        physToLogical.getOrElse(k, k) -> v }
      (bounds, weights)
    }
    if (perLink.exists(_._1.isEmpty)) return Map.empty // a blind link gates
    val cols = perLink.map(_._1.keySet).reduce(_ union _)
    cols.iterator.flatMap { c =>
      // links carrying the column need bounds AND a weight; links without
      // it contribute nothing (absent/all-null there)
      val entries = perLink.flatMap { case (bounds, weights) =>
        bounds.get(c).map(b => (b, weights.get(c)))
      }
      if (entries.exists(_._2.isEmpty)) None // pre-weight link: can't merge
      else mergeEquiHeight(entries.map { case (b, w) => (b, w.get) }, HistBins)
        .map(c -> _)
    }.toMap
  }

  /** One version directory's sketches (column → serialized HLL), empty
    * when the sidecar is absent or unreadable (pre-NDV versions). */
  def read(versionDir: Path): Map[String, Array[Byte]] = {
    val f = versionDir.resolve(NdvFileName)
    if (!Files.exists(f)) Map.empty
    else try JsonMethods.parse(Files.readString(f)) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> Base64.getDecoder.decode(v)
      }.toMap
      case _ => Map.empty
    } catch { case NonFatal(_) => Map.empty }
  }

  /** Union the chain's per-link sketches into per-column NDV estimates.
    * A link with NO `_ndv.json` at all is a PRE-NDV commit — unknown
    * rows, so it gates every estimate (a partial union would understate
    * NDV and overstate join selectivity, the dangerous direction). A
    * link WITH a sidecar that merely lacks one column wrote that column
    * absent or all-null — zero distinct values there, so it contributes
    * nothing to that column's union. `linkHasData` marks which dirs
    * carried data files at all: data-less links (pure-DV commits,
    * props-only links) don't gate. */
  def chainNdv(dirs: Seq[Path], linkHasData: Path => Boolean,
      resolve: Path => Map[String, String] = _ => Map.empty)
      : Map[String, Long] = {
    val dataDirs = dirs.filter(linkHasData)
    if (dataDirs.isEmpty) return Map.empty
    // Per-link sketches keyed by the column's LOGICAL name at the head:
    // pre-rename links' sidecars carry the OLD (physical) name, so the
    // union must follow the same logical→physical maps the zone-map
    // pruner uses, or a renamed column's NDV would count only
    // post-rename links — understated NDV, overstated join selectivity,
    // exactly the dangerous direction.
    val perLink: Seq[Map[String, Array[Byte]]] = dataDirs.map { d =>
      val physToLogical = resolve(d).map(_.swap) // logical→physical, inverted
      read(d).map { case (k, v) => physToLogical.getOrElse(k, k) -> v }
    }
    if (perLink.exists(_.isEmpty)) return Map.empty // a blind link gates all
    val cols = perLink.map(_.keySet).reduce(_ union _)
    cols.iterator.flatMap { c =>
      try {
        val u = new org.apache.datasketches.hll.Union(LgK)
        perLink.foreach(_.get(c).foreach(bytes =>
          u.update(org.apache.datasketches.hll.HllSketch.heapify(bytes))))
        Some(c -> math.max(1L, math.round(u.getResult.getEstimate)))
      } catch { case NonFatal(_) => None } // corrupt sketch: no estimate
    }.toMap
  }

  /** One version directory's count-min sketches (string column →
    * serialized CMS), empty when absent/unreadable. */
  def readCms(versionDir: Path): Map[String, Array[Byte]] = {
    val f = versionDir.resolve(CmsFileName)
    if (!Files.exists(f)) Map.empty
    else try JsonMethods.parse(Files.readString(f)) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> Base64.getDecoder.decode(v)
      }.toMap
      case _ => Map.empty
    } catch { case NonFatal(_) => Map.empty }
  }

  /** Union the chain's per-link count-min sketches per column — CMS
    * merges are EXACT counter sums, so the chain estimate carries each
    * link's rows once. Same gating as [[chainNdv]]: a data link with NO
    * `_cms.json` gates every column (it may predate the sidecar — a
    * partial union would UNDERSTATE the hot value's frequency, which is
    * the dangerous direction for build-side sizing); a link WITH the
    * sidecar but missing a column wrote it absent/all-null there. DV'd
    * rows stay counted until compact — over-counted frequency
    * under-broadcasts, the safe direction. */
  def chainCms(dirs: Seq[Path], linkHasData: Path => Boolean,
      resolve: Path => Map[String, String] = _ => Map.empty)
      : Map[String, org.apache.spark.util.sketch.CountMinSketch] = {
    val dataDirs = dirs.filter(linkHasData)
    if (dataDirs.isEmpty) return Map.empty
    val perLink: Seq[Map[String, Array[Byte]]] = dataDirs.map { d =>
      val physToLogical = resolve(d).map(_.swap)
      readCms(d).map { case (k, v) => physToLogical.getOrElse(k, k) -> v }
    }
    if (perLink.exists(_.isEmpty)) return Map.empty // a blind link gates all
    val cols = perLink.map(_.keySet).reduce(_ union _)
    cols.iterator.flatMap { c =>
      try {
        val parts = perLink.flatMap(_.get(c)).map(
          org.apache.spark.util.sketch.CountMinSketch.readFrom)
        parts.reduceOption((a, b) => a.mergeInPlace(b)).map(c -> _)
      } catch { case NonFatal(_) => None } // corrupt/incompatible: none
    }.toMap
  }
}
