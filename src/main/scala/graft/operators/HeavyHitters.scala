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

/** Exact heavy hitters in two bounded passes — the scale path for
  * `GROUP BY item HAVING count(*) > φ·n` when the item domain is too wide
  * to shuffle in full (URLs, shingles, n-grams at 100 TB):
  *
  *  1. one pass aggregates a Misra-Gries sketch (capacity 2/φ, so every
  *     φ-heavy item is guaranteed among the candidates) plus the total
  *     count — partial aggregation merges per-partition sketches, and the
  *     shuffle carries one ≤capacity map per partition, never the domain;
  *  2. the candidate list (≤2/φ items, broadcast) semi-joins the input and
  *     only those items are exactly counted and thresholded.
  *
  * The output is EXACT and deterministic — the sketch only decides who
  * gets recounted, never a final count, and its superset guarantee holds
  * under any partitioning/merge order.
  */
object HeavyHitters {

  /** Items of `itemCol` (string) occurring more than `phi`·n times:
    * (item, freq, share) ordered by freq desc, item asc.
    *
    * Pass 1 runs Misra-Gries PER PARTITION inside `mapPartitions` with a
    * mutable counter map — plain HashMap increments per token, one
    * decrement-all sweep per eviction (amortized O(1)/token: each swept
    * unit annihilates one prior increment) — instead of routing every
    * token through the immutable-Map `Aggregator` (a Map copy + encoder
    * round per row; measured comparable at sf10 where the 2× tokenize
    * scan dominates, but GC-flat where the Aggregator's allocation rate
    * grows with tokens/partition). The superset guarantee survives
    * partitioning: a globally φ-heavy item has `c_p ≥ φ·s_p` in at least
    * one partition (else Σc_p < φ·Σs_p), and capacity ≥ 2/φ keeps any
    * such item alive in that partition's sketch (`c_p ≥ 2s_p/capacity >
    * s_p/(capacity+1)`, the MG survival bound). The wire carries only
    * ≤capacity candidates + one count per partition; the exact recount
    * makes the FINAL output deterministic regardless of partitioning. */
  def exact(items: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0, 1)")
    val spark = items.sparkSession
    import spark.implicits._
    val capacity = math.max(16, math.ceil(2.0 / phi).toInt)
    val partials = items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Array[Long]](capacity * 2)
        var n = 0L
        while (it.hasNext) {
          val t = it.next(); n += 1L
          val c = m.get(t)
          if (c != null) c(0) += 1L
          else if (m.size < capacity) m.put(t, Array(1L))
          else {
            // Full and unseen: the new item's +1 annihilates with one unit
            // of every live counter (classic MG eviction), dropping zeros.
            val e = m.entrySet().iterator()
            while (e.hasNext) {
              val x = e.next()
              x.getValue()(0) -= 1L
              if (x.getValue()(0) == 0L) e.remove()
            }
          }
        }
        // One (null, partition count) row + the partition's candidates.
        Iterator.single((null: String, n)) ++ scala.jdk.CollectionConverters
          .SetHasAsScala(m.keySet()).asScala.iterator.map(k => (k, 0L))
      }.collect()
    val n = partials.collect { case (null, c) => c }.sum
    val cands = partials.collect { case (t, _) if t != null => t }.distinct.toSeq
    items
      .join(broadcast(cands.toDF(itemCol)), itemCol)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") > lit(phi) * lit(n))
      .withColumn("share", round(col("freq").cast("double") / lit(n.toDouble), 6))
      .orderBy(col("freq").desc, col(itemCol).asc)
  }
}
