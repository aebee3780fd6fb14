package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.SnapshotStore

/** Exactly-once streaming append into a snapshot-store table.
  *
  * Structured Streaming's foreachBatch is at-least-once: after a sink-side
  * crash the engine replays the last micro-batch, and a bare
  * `store.append` would double-append it. The fix is the idempotent-write
  * idiom lake formats use (Delta's txnAppId/txnVersion riding inside the
  * commit): the micro-batch id is stored IN the appended rows as a
  * `_batch_id` column, so batch data and the "this batch is committed"
  * record are one atomic version commit — there is no window where one
  * exists without the other. On replay, the last committed batch id is
  * read from the newest version's change set (O(delta), never a snapshot
  * scan) and the batch is skipped.
  *
  * Contract: the table is written only through this sink (mixed writers
  * would leave `_batch_id`-less deltas on top and break the replay check);
  * batch ids are monotone per checkpoint, which Structured Streaming
  * guarantees. The reference's job queue gets the same effect from
  * Postgres transactions (api/app/services/job_queue.py); here the atomic
  * unit is the store's version commit.
  */
object SnapshotSink {

  /** Highest batch id this sink has committed to `table` (None for an
    * empty or never-sink-written table). Batch ids are monotone, so the
    * NEWEST change set carrying a `_batch_id` value is authoritative —
    * but a zero-row change set (an empty micro-batch) has `max(_batch_id)
    * = null`, so the scan walks versions newest-first until one yields an
    * id, rather than degrading the replay check to None. Still O(recent
    * deltas), never a snapshot scan: the walk stops at the first
    * non-empty sink-written change set. */
  def lastBatchId(store: SnapshotStore, table: String): Option[Long] =
    store.changedVersions(table).reverseIterator.map { v =>
      store.changesAt(table, v)
        .filter(_.columns.contains("_batch_id"))
        .flatMap(df => Option(df.agg(max(col("_batch_id"))).head.get(0))
          .map(_.asInstanceOf[Long]))
    }.collectFirst { case Some(id) => id }

  /** Append one micro-batch idempotently; returns true iff the batch was
    * new (false = replay of an already-committed id, skipped). Public so
    * the replay contract is directly testable without crashing a query. */
  def appendBatch(store: SnapshotStore, table: String,
      batch: DataFrame, batchId: Long): Boolean = {
    val replay = lastBatchId(store, table).exists(_ >= batchId)
    if (!replay) {
      // localCheckpoint: the batch plan must not re-execute against moved
      // state when append evaluates it twice (snapshot union + change set)
      val b = batch.withColumn("_batch_id", lit(batchId)).localCheckpoint(true)
      // An empty micro-batch commits nothing: a zero-row version adds
      // churn and carries no `_batch_id` evidence (its max is null), and
      // skipping it is idempotent — a replayed empty batch skips again.
      if (!b.isEmpty) store.append(table, b)
    }
    !replay
  }

  /** Run a stream into `table` exactly-once. Plain foreachBatch
    * composition — checkpointing, triggers, and restart semantics are the
    * caller's writeStream options, as with any Spark sink. */
  def start(stream: DataFrame, store: SnapshotStore, table: String,
      checkpointLocation: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        appendBatch(store, table, batch.toDF(), id)
        ()
      }
      .start()

  /** MULTI-TABLE exactly-once: one micro-batch split into several tables'
    * deltas, committed at ONE point via [[SnapshotStore.appendAll]]'s
    * write-ahead intent — the streaming twin of the reference's
    * ingestion transaction (concepts + instances + sources land together,
    * ingestion.py:31-152). The `_batch_id` evidence therefore lands in
    * EVERY participating table atomically: a crash between the intent
    * and the pointer moves rolls the whole batch forward on recovery, a
    * crash before it exposes nothing, and the replay check (ANY table's
    * last id ≥ this id — tables whose split was empty for a batch carry
    * no evidence for it) can never see half a batch. Returns true iff
    * the batch was new. */
  def appendAllBatch(store: SnapshotStore, split: Map[String, DataFrame],
      batchId: Long): Boolean = {
    require(split.nonEmpty, "appendAllBatch requires at least one table")
    // Pending-txn roll-forward BEFORE the replay check: a crash after the
    // intent means the batch IS committed (recovery completes it), but
    // the pointers may not have moved yet — a stale check here would
    // re-append a committed batch, exactly the double the sink exists to
    // prevent.
    store.recoverPendingTxns()
    val replay = split.keys.exists(t =>
      lastBatchId(store, t).exists(_ >= batchId))
    if (!replay) {
      val nonEmpty = split.toSeq.map { case (t, df) =>
        t -> df.withColumn("_batch_id", lit(batchId)).localCheckpoint(true)
      }.filter { case (_, b) => !b.isEmpty }.toMap
      if (nonEmpty.nonEmpty) store.appendAll(nonEmpty)
    }
    !replay
  }

  /** Run a stream into several tables exactly-once: `split` projects each
    * micro-batch into per-table deltas (e.g. an extraction batch into
    * concepts + edges), all committed at one transactional point. */
  def startAll(stream: DataFrame, store: SnapshotStore,
      split: DataFrame => Map[String, DataFrame],
      checkpointLocation: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        // checkpoint the parent ONCE: every per-table projection then
        // reads stable state however many times appendAll evaluates it
        appendAllBatch(store, split(batch.toDF().localCheckpoint(true)), id)
        ()
      }
      .start()
}
