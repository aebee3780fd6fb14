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
    * selectivities from 1/ndv guesses into bin-resolution estimates. */
  val HistFileName = "_hist.json"

  /** Equi-height bin count. 32 resolves a hot key down to ~3% of rows
    * while keeping the sidecar at 33 doubles per column (ANALYZE's
    * default 254 buys little at estimate precision). */
  val HistBins = 32

  /** Spark's hll_sketch_agg default lgConfigK. */
  private val LgK = 12

  /** Histogram metric prefix inside the shared Observation (the NDV
    * metrics are keyed by bare lowercased column name). */
  private val HistPrefix = "__graft_hist__"

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
    // equi-height boundaries ride the SAME observation — still one pass
    val histMetrics = df.schema.fields.toSeq.flatMap { f =>
      val n = HistPrefix + f.name.toLowerCase(java.util.Locale.ROOT)
      val pcts = array((0 to HistBins).map(i =>
        lit(i.toDouble / HistBins)): _*)
      histExpr(f).map(e =>
        n -> percentile_approx(e, pcts, lit(10000)).as(n))
    }
    val metrics = (ndvMetrics ++ histMetrics)
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
    val entries = names.filterNot(_.startsWith(HistPrefix)).flatMap { n =>
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
    // histogram boundaries → _hist.json (same temp+rename, best-effort)
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
              JArray(ds.toList.map(JDouble(_))))
          else None
        case _ => None
      }
    }
    if (hists.nonEmpty) {
      val tmp = versionDir.resolve(HistFileName + ".tmp")
      Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(
        JObject(hists.sortBy(_._1).toList))))
      Files.move(tmp, versionDir.resolve(HistFileName),
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

  /** The chain's histograms: reported ONLY when exactly one data-carrying
    * link exists (a self-contained commit or a compact) — equi-height
    * histograms don't union losslessly across links, and a misleading
    * histogram is worse for CBO than none. Appends drop them; the next
    * compact restores them. */
  def chainHist(dirs: Seq[Path], linkHasData: Path => Boolean,
      resolve: Path => Map[String, String] = _ => Map.empty)
      : Map[String, Array[Double]] = {
    val dataDirs = dirs.filter(linkHasData)
    if (dataDirs.length != 1) return Map.empty
    val d = dataDirs.head
    val physToLogical = resolve(d).map(_.swap)
    readHist(d).map { case (k, v) => physToLogical.getOrElse(k, k) -> v }
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
}
