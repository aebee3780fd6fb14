package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Capacity-capped `collect_set` for LONG keys — the skew-safe single-pass
  * form of the "dedup the members, count them, and collect the small
  * groups" postings pattern (q87/q115 Adamic-Adar).
  *
  * The multi-pass form (distinct over the stream, count per key, join the
  * counts back, filter, THEN collect) pays an exchange per step just to
  * avoid materializing a power-law hub's full member list in one
  * aggregation buffer. This aggregator provides the same bound in ONE
  * aggregate: the set stops growing at `cap` distinct elements, so a
  * 10M-member hub costs at most `cap` longs of buffer in any task. A group
  * whose true distinct count is < cap can never be truncated (the buffer
  * only ever holds genuine members, bounded by the true count), so for
  * callers that keep only groups of size ≤ cap−1 (q87's degree ceiling,
  * cap = ceiling + 1) every surviving set is exact — `size(set)` IS the
  * distinct count, and an overflowed set has size cap > ceiling, which the
  * degree filter drops regardless of which members it happened to retain.
  * Participates in partial aggregation (ObjectHashAggregate), same as
  * `collect_set`; dedup happens map-side in the buffer, so the exchange
  * carries one capped set per (key × partition), never the raw stream.
  *
  * NULL inputs are skipped (callers guard them upstream; q87 raises on
  * malformed ids before the aggregate).
  */
class CapSetAggregator(cap: Int)
    extends Aggregator[java.lang.Long, Set[Long], Seq[Long]] {
  require(cap > 0, "cap must be positive")

  override def zero: Set[Long] = Set.empty

  override def reduce(buf: Set[Long], a: java.lang.Long): Set[Long] =
    if (a == null || buf.size >= cap) buf else buf + (a: Long)

  override def merge(x: Set[Long], y: Set[Long]): Set[Long] = {
    // Fold the smaller side in, stop at the cap: overflowed groups are
    // dropped by the caller's size filter, so their content is free.
    val (big, small) = if (x.size >= y.size) (x, y) else (y, x)
    var out = big
    val it = small.iterator
    while (it.hasNext && out.size < cap) out = out + it.next()
    out
  }

  override def finish(buf: Set[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: ExpressionEncoder[Set[Long]] =
    ExpressionEncoder[Set[Long]]()
  override def outputEncoder: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CapList {
  /** `capSet(cap)(col)` → `array<bigint>` of up to `cap` of the group's
    * DISTINCT values (unordered); exact for any group with < cap distinct
    * values. */
  def capSet(cap: Int): Column => Column = {
    val f = udaf(new CapSetAggregator(cap), ExpressionEncoder[java.lang.Long]())
    c => f(c)
  }
}
