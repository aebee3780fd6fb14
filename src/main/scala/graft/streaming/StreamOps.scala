package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental/streaming semantics (SURVEY §2.12). The reference has no
  * stream processor — it approximates incrementality with an epoch log +
  * generation counters + job queue (graph_epochs, ADR-207;
  * api/app/lib/age_client/ingestion.py:31-152). Structured Streaming is the
  * Spark-native replacement: the epoch log is a streaming sink, windowed
  * aggregates maintain live stats under a watermark, and
  * flatMapGroupsWithState carries per-key session state.
  */
object StreamOps {

  /** Event schema matching testdata `events` after ts normalization. */
  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")

  /** Event-time normalization at the watermark boundary: Spark's
    * EventTimeWatermark requires plain TIMESTAMP and rejects TIMESTAMP_NTZ
    * at analysis (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`) — the streaming
    * twin of the NTZ arm in [[graft.sources.Tables.events]]. Sessions pin
    * UTC, so the cast is an exact reinterpretation. */
  private def eventTime(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Watermarked tumbling-window aggregate per event type — the streaming
    * twin of q20_time_window. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    eventTime(events, "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Epoch-log append: every micro-batch becomes one epoch record
    * (kind, actor, max event id, row count) — the committed-epoch clock is
    * `max(event_id)` (M8, schema/00_baseline.sql:2198-2240). */
  def epochRecords(events: DataFrame): DataFrame =
    eventTime(events, "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type").as("kind"))
      .agg(max(col("event_id")).as("committed_epoch"), count(lit(1)).as("n_events"))

  /** Late/duplicate-data handling (§2.12): drop re-deliveries of the same
    * content key, with state bounded by the event-time watermark — the
    * streaming twin of the reference's content-hash dedup on ingest
    * (api/app/services/content_hasher.py; instance dedup M3,
    * ingestion.py:390-423). State holds one entry per key seen within the
    * watermark horizon; older duplicates age out of state AND can no
    * longer arrive (they'd be later than the watermark allows). */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    eventTime(df, tsCol).withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment: decorate a stream with a broadcast-joined
    * dimension table — the streaming twin of the vocab/epistemic decoration
    * joins (J9/F4; the reference re-reads its vocabulary table per batch,
    * api/app/lib/age_client/grounding.py:335-346). The static side is
    * planned as a broadcast hash join in every micro-batch, so the stream
    * never shuffles. Without an allowlist, the join is LEFT: every stream
    * row survives, unmatched keys carry null dim columns. With
    * `allowed = Some((col, values))`, rows whose decorated `col` is not in
    * `values` are dropped — INCLUDING rows with no dim match at all (their
    * col is null, and an unknown key is by definition not on the
    * allowlist), exactly how F4's status→type resolution excludes edge
    * types the vocabulary doesn't know. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String,
      allowed: Option[(String, Seq[String])] = None): DataFrame = {
    val joined = stream.join(broadcast(dim), Seq(key), "left")
    allowed match {
      case Some((c, vs)) => joined.where(col(c).isin(vs: _*))
      case None          => joined
    }
  }

  /** Stream-stream interval join: pair each left event with right events of
    * the same key whose timestamp falls in [left.ts − within, left.ts] —
    * the streaming twin of the backward as-of lookup
    * (graft.operators.AsOfJoin), bounded instead of latest-only because an
    * unbounded "latest" needs state Spark can't reclaim. Both sides are
    * watermarked and the time-range predicate is what lets the state store
    * evict: a right row older than (watermark − within) can never match a
    * future left row, so state is bounded by the interval, not the stream
    * length. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      within: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val l = eventTime(left, "ts").withWatermark("ts", watermark).as("l")
    val r = eventTime(right, "ts").withWatermark("ts", watermark).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $within") &&
        col("r.ts") <= col("l.ts"))
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, duration_s: Long, closed: Boolean)

  /** Stateful sessionization with a 30-minute idle gap via
    * flatMapGroupsWithState (the KeyValueGroupedDataset custom-state path).
    * A session closes when a later event arrives past the gap (`closed =
    * true`) OR when the processing-time timeout fires on an idle key —
    * without the timeout a user's final session would sit in state
    * forever and the stream would permanently undercount vs the q39
    * batch twin. Timed-out sessions emit `closed = false` (flushed idle,
    * not gap-delimited; in batch execution timeouts never fire, so a
    * batch run emits only the gap-closed sessions). */
  def sessionize(events: Dataset[SessionEvent],
      idleFlush: String = "35 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, s.n, (s.last - s.start) / 1000, closed = false))
          } else {
            val gapMs = 30L * 60 * 1000
            var cur = state.getOption
            val closed = Vector.newBuilder[SessionOut]
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.n, (s.last - s.start) / 1000, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(idleFlush)
            }
            closed.result().iterator
          }
      }
  }

  final case class ScoredEvent(group: String, score: Double, key: String)
  final case class TopKSnapshot(group: String, topk: String)

  /** Streaming grouped top-k: per group, the running k best (score desc,
    * key asc) across the whole stream, re-emitted whenever a batch touches
    * the group (Update mode). State is the same ≤k sorted buffer the batch
    * aggregate uses (`functions.TopKAggregator.reduce` — one code path for
    * both engines), so state size is O(k) per group FOREVER, independent
    * of stream length: the streaming twin of q80's bounded top-k, the same
    * way `sessionize` twins q39. */
  def streamingTopK(events: Dataset[ScoredEvent], k: Int): Dataset[TopKSnapshot] = {
    import events.sparkSession.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    events
      .groupByKey(_.group)
      .mapGroupsWithState[List[graft.functions.Scored], TopKSnapshot](
        GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[ScoredEvent], state: GroupState[List[graft.functions.Scored]]) =>
          val cur = state.getOption.getOrElse(agg.zero)
          val next = batch.foldLeft(cur)((b, e) =>
            agg.reduce(b, graft.functions.Scored(e.score, e.key)))
          state.update(next)
          TopKSnapshot(g, next.map(s => s"${s.key}:${s.score}").mkString(","))
      }
  }

  final case class TokenEvent(group: String, token: String)
  final case class HHSnapshot(group: String, candidates: String)

  /** Streaming Misra-Gries candidates: per group, the capacity-bounded
    * frequency sketch maintained across micro-batches — state is ≤capacity
    * counters per group forever, and the mergeable-summary guarantee means
    * any item above n/(capacity+1) of the group's lifetime stream is
    * always among the emitted candidates (`operators.MisraGriesAggregator
    * .reduce`, the same kernel the batch two-pass [[graft.operators
    * .HeavyHitters]] uses for pass 1; the exact recount stays a batch job
    * over the accumulated data). Emits `item:lowerBoundCount` pairs,
    * estimate-descending, whenever a batch touches the group. */
  def streamingHeavyHitters(events: Dataset[TokenEvent],
      capacity: Int): Dataset[HHSnapshot] = {
    import events.sparkSession.implicits._
    val mg = new graft.operators.MisraGriesAggregator(capacity)
    events
      .groupByKey(_.group)
      .mapGroupsWithState[Map[String, Long], HHSnapshot](
        GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[TokenEvent], state: GroupState[Map[String, Long]]) =>
          val next = batch.foldLeft(state.getOption.getOrElse(mg.zero))(
            (b, e) => mg.reduce(b, e.token))
          state.update(next)
          HHSnapshot(g, next.toSeq.sortBy { case (t, c) => (-c, t) }
            .map { case (t, c) => s"$t:$c" }.mkString(","))
      }
  }

  final case class BandedDoc(bk: String, id: String, sig: Seq[Long])
  final case class NearDupHit(a_id: String, b_id: String, est_jaccard: Double)

  /** Streaming MinHash-LSH near-dup detection: as documents arrive, emit
    * (a_id, b_id, est_jaccard) for every earlier document that collides
    * with the new one in an LSH band and whose signature agreement is at
    * least `minEstJaccard` — the streaming twin of
    * [[graft.dedup.Dedup.minhashNearDups]], for dedup-on-ingest instead of
    * dedup-after-the-fact (the reference dedups at ingest time too, via
    * whole-document content hashes, api/app/lib/ingestion.py:432-507; this
    * is the near-dup generalization).
    *
    * Shape: signatures are computed per-row with the batch kernels
    * (shingle → minhash, no shuffle), the band fan-out shuffles only
    * (band-key, id, signature), and state is per LSH bucket — a capped
    * list of (id, signature) pairs, ≤ `maxPerBucket` entries of
    * `numHashes` longs each, FOREVER, with FIFO eviction (keep newest:
    * near-dups cluster in arrival time). The similarity test inside state
    * is the signature AGREEMENT ESTIMATE (matching components /
    * numHashes), not exact Jaccard — state holds signatures, never
    * shingle sets, so a bucket entry is O(numHashes) regardless of
    * document size; route emitted pairs through the batch verifier if
    * exactness matters. A pair sharing several bands emits once per
    * colliding band (identical est value) — consumers dedup on
    * (a_id, b_id), which is also what makes the emission idempotent. */
  def streamingNearDup(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 4, numHashes: Int = 32, bands: Int = 8,
      minEstJaccard: Double = 0.5, maxPerBucket: Int = 256): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    import graft.dedup.Dedup
    val banded = docs
      .select(col(idCol).cast("string").as("id"),
        Dedup.minhashSignature(
          Dedup.charShingles(col(textCol), shingleK), numHashes).as("sig"))
      .withColumn("bk",
        explode(Dedup.lshBandKeys(col("sig"), bands, numHashes / bands)))
      // groupByKey needs a flat key: (band idx, band hash) → "idx#hash",
      // injective, so bucket identity is unchanged.
      .select(concat_ws("#", col("bk.band"), col("bk.key")).as("bk"),
        col("id"), col("sig"))
      .as[BandedDoc]
    banded
      .groupByKey(_.bk)
      .flatMapGroupsWithState[List[(String, Seq[Long])], NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = Vector.newBuilder[NearDupHit]
          // id-sorted fold: pairs inside one micro-batch emit exactly once
          // with a deterministic orientation, whatever the task order.
          batch.toSeq.sortBy(_.id).foreach { d =>
            if (!seen.exists(_._1 == d.id)) {
              seen.foreach { case (oid, osig) =>
                val agree = osig.iterator.zip(d.sig.iterator)
                  .count { case (a, b) => a == b }
                val est = agree.toDouble / numHashes
                if (est >= minEstJaccard) {
                  val (a, b) = if (oid < d.id) (oid, d.id) else (d.id, oid)
                  out += NearDupHit(a, b, est)
                }
              }
              seen = ((d.id, d.sig) :: seen).take(maxPerBucket)
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** Batch-drives a streaming query over a parquet dir through the memory
    * sink; returns the sink table. Lets specs exercise the real streaming
    * planner synchronously (spark_guide.md pattern). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
