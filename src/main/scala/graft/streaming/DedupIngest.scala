package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import graft.core.SnapshotStore
import graft.dedup.Dedup

/** Streaming dedup-on-ingest: the composition of the streaming ingest
  * loop (S1), incremental exact dedup, and the versioned snapshot store —
  * each micro-batch admits only globally-unseen documents and advances
  * two SnapshotStore tables, `docsTable` (admitted rows) and `indexTable`
  * (the fingerprint index, one short row per admitted doc ever).
  *
  * This is the corpus-building write path at 100 TB: the accumulated
  * corpus is NEVER re-read — each batch's cost is the batch itself plus
  * the fingerprint anti-join (see [[Dedup.dedupAgainstIndex]]); the
  * reference runs the same check per uploaded document via its
  * content-hash lookup (api/app/services/content_hasher.py), here it is
  * one set-oriented job per micro-batch. Batch state is checkpointed per
  * micro-batch (lineage truncation, the StreamingIngest discipline), and
  * the index read pins an immutable store version, so a batch can never
  * anti-join against its own delta.
  */
final class DedupIngest(spark: SparkSession, store: SnapshotStore,
    docsTable: String = "docs", indexTable: String = "fp_index") {

  def start(docsStream: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val ix = store.latestVersion(indexTable).map(_ => store.read(indexTable))
        val (fresh, delta) = Dedup.dedupAgainstIndex(
          batch.toDF(), idCol, textCol, ix)
        // Materialize BOTH outputs before any append: delta's lazy plan
        // shares the anti-join against the pinned index version, and
        // appending docs first must not re-run it against a moved pointer.
        val freshM = fresh.localCheckpoint(true)
        val deltaM = delta.localCheckpoint(true)
        if (!freshM.isEmpty) {
          store.append(docsTable, freshM)
          store.append(indexTable, deltaM)
        }
        ()
      }
      .start()

  /** Admitted corpus so far; None until the first batch admits rows. */
  def corpus(): Option[DataFrame] =
    store.latestVersion(docsTable).map(_ => store.read(docsTable))
}
