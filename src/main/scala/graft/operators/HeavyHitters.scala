package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequency sketch: a ≤`capacity` counter map whose classic
  * guarantee is that any item occurring more than n/(capacity+1) times is
  * still present after any interleaving of inserts and merges (merge =
  * counter sum, then subtract the (capacity+1)-th largest count from all
  * and drop non-positives — Agarwal et al., "Mergeable Summaries").
  * Counts are LOWER bounds (undercounted by ≤ n/(capacity+1)), which is
  * why [[HeavyHitters.exact]] recounts candidates exactly.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < capacity => b.updated(a, 1L)
      case None =>
        // Full and unseen: decrement every counter (the new item's +1 and
        // one unit of every counter annihilate), dropping zeros.
        b.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= capacity) summed
    else {
      val cut = summed.values.toArray.sortBy(-_).apply(capacity)
      summed.collect { case (k, v) if v > cut => k -> (v - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Exact heavy hitters with ONE pass over the input — the scale path for
  * `GROUP BY item HAVING count(*) > φ·n` when the item domain is too wide
  * to shuffle in full (URLs, shingles, n-grams at 100 TB).
  *
  * The r19 shape scanned the input twice (a Misra-Gries candidate pass,
  * then a re-scan for the exact recount) and the 2× tokenize scan was the
  * whole cost of q83 (~4 s of a 4.2 s query at sf10). r20 (guide §1.2/§2:
  * remove the second pass outright): one `mapPartitions` pass now emits
  *
  *  1. the partition's (item, count) GRAIN — exact per-partition partial
  *     counts, from a bounded counter map that FLUSHES to output when it
  *     hits `flushEntries` (so task memory stays bounded on any domain;
  *     a flushed item's count splits across rows, which the downstream
  *     `sum` re-merges exactly), and
  *  2. the partition's Misra-Gries candidate markers (capacity 2/φ): a
  *     globally φ-heavy item has local share ≥ φ in at least one
  *     partition (else Σc_p < φ·Σs_p), and capacity ≥ 2/φ keeps any such
  *     item alive in that partition's sketch (c_p ≥ 2s_p/capacity >
  *     s_p/(capacity+1), the MG survival bound) — the candidate union is
  *     a guaranteed superset of the true heavy hitters, under any
  *     partitioning and any flush interleaving (the sketch never flushes).
  *
  * The grain is localCheckpointed (executor-local blocks, one row per
  * distinct (partition, item) plus flush splits — corpus-sublinear), and
  * the total, the candidate set, and the exact recount are all computed
  * FROM THE GRAIN: the input — and any tokenize/explode feeding it — is
  * scanned exactly once. The output is EXACT and deterministic: the
  * sketch only decides who gets recounted (a spurious candidate is
  * dropped by the exact HAVING filter), never a final count.
  */
object HeavyHitters {

  /** Items of `itemCol` (string) occurring more than `phi`·n times:
    * (item, freq, share) ordered by freq desc, item asc.
    *
    * `flushEntries` bounds the per-task exact counter map (entries, not
    * bytes); the MG sketch is additionally bounded by capacity 2/φ. */
  def exact(items: DataFrame, itemCol: String, phi: Double,
      flushEntries: Int = 1 << 20): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0, 1)")
    val spark = items.sparkSession
    import spark.implicits._
    val capacity = math.max(16, math.ceil(2.0 / phi).toInt)
    // One pass: exact bounded-map partial counts (grain, cand=false) +
    // MG candidate markers (count 0, cand=true). Plain HashMap increments
    // per token; one decrement-all sweep per MG eviction (amortized
    // O(1)/token: each swept unit annihilates one prior increment).
    val grain = items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        new Iterator[(String, Long, Boolean)] {
          private val exactM = new java.util.HashMap[String, Array[Long]](1024)
          private val mg = new java.util.HashMap[String, Array[Long]](capacity * 2)
          private var pending: java.util.Iterator[(String, Long, Boolean)] = null
          private var finished = false
          private def drainExact(): java.util.Iterator[(String, Long, Boolean)] = {
            val out = new java.util.ArrayList[(String, Long, Boolean)](exactM.size())
            val e = exactM.entrySet().iterator()
            while (e.hasNext) {
              val x = e.next(); out.add((x.getKey, x.getValue()(0), false))
            }
            exactM.clear()
            out.iterator()
          }
          private def step(): Unit = {
            // advance the input until something is ready to emit
            while ((pending == null || !pending.hasNext) && it.hasNext) {
              val t = it.next()
              // exact bounded partial count (flush keeps memory bounded;
              // split counts re-merge in the downstream sum)
              val c = exactM.get(t)
              if (c != null) c(0) += 1L
              else {
                if (exactM.size() >= flushEntries) pending = drainExact()
                exactM.put(t, Array(1L))
              }
              // Misra-Gries candidate sketch (never flushed)
              val m = mg.get(t)
              if (m != null) m(0) += 1L
              else if (mg.size < capacity) mg.put(t, Array(1L))
              else {
                val e = mg.entrySet().iterator()
                while (e.hasNext) {
                  val x = e.next()
                  x.getValue()(0) -= 1L
                  if (x.getValue()(0) == 0L) e.remove()
                }
              }
            }
            if ((pending == null || !pending.hasNext) && !it.hasNext && !finished) {
              // input exhausted: final grain drain + the candidate markers
              val out = new java.util.ArrayList[(String, Long, Boolean)]()
              val e = exactM.entrySet().iterator()
              while (e.hasNext) {
                val x = e.next(); out.add((x.getKey, x.getValue()(0), false))
              }
              exactM.clear()
              val k = mg.keySet().iterator()
              while (k.hasNext) out.add((k.next(), 0L, true))
              pending = out.iterator()
              finished = true
            }
          }
          override def hasNext: Boolean = {
            if (pending == null || !pending.hasNext) step()
            pending != null && pending.hasNext
          }
          override def next(): (String, Long, Boolean) = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }.toDF(itemCol, "c", "cand")
      .localCheckpoint(true) // the ONLY pass over the input
    // total occurrences — exact: every occurrence is in exactly one grain
    // row's count (candidate markers carry 0)
    val nRow = grain.agg(sum(col("c"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val cands = grain.where(col("cand")).select(col(itemCol)).distinct()
    grain
      .join(broadcast(cands), itemCol)
      .groupBy(col(itemCol))
      .agg(sum(col("c")).as("freq"))
      .where(col("freq") > lit(phi) * lit(n))
      .withColumn("share", round(col("freq").cast("double") / lit(n.toDouble), 6))
      .orderBy(col("freq").desc, col(itemCol).asc)
  }
}
