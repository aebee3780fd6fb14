package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}

/** Structured Streaming semantics driven synchronously through the memory
  * sink (no async flakiness): windowed aggregate under watermark, epoch
  * records, stateful sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowed counts aggregate a file-driven stream like the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = Seq(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(20), 10L, "click", 2.0, "{}"),
      (3L, ts(65), 11L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val out = StreamOps.runToMemory(spark, StreamOps.windowedCounts(stream), "wc",
      OutputMode.Append)
    // Append mode only emits closed windows; with a 2h watermark nothing
    // closes in one batch — switch: drive with Complete over aggregation.
    val out2 = StreamOps.runToMemory(spark,
      StreamOps.windowedCounts(stream, watermark = "0 seconds"), "wc2",
      OutputMode.Complete)
    val rows = out2.select($"event_type", $"n").as[(String, Long)].collect().toMap
    assert(rows("click") == 2 && rows("view") == 1)
  }

  test("stream-static enrichment broadcast-joins the dim per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    Seq(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(6), 11L, "view", 2.0, "{}"),
      (3L, ts(7), 12L, "purchase", 3.0, "{}"),
      (4L, ts(8), 13L, "scroll", 4.0, "{}")) // no dim entry
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue")).toDF("event_type", "category")
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    // No allowlist: LEFT semantics — the unmatched key survives with null
    val all = StreamOps.runToMemory(spark,
      StreamOps.enrichWithDim(stream, dim, "event_type"), "enrich_all",
      OutputMode.Append)
    assert(all.count() == 4)
    assert(all.where($"event_id" === 4L && $"category".isNull).count() == 1)
    // Allowlist: non-allowed AND unmatched keys are both dropped (F4)
    val out = StreamOps.runToMemory(spark,
      StreamOps.enrichWithDim(stream, dim, "event_type",
        allowed = Some(("category", Seq("engagement")))),
      "enrich", OutputMode.Append)
    val rows = out.select($"event_id", $"category").as[(Long, String)]
      .collect().toMap
    assert(rows == Map(1L -> "engagement", 2L -> "engagement"))
    // The static side is a broadcast hash join (stream side never
    // shuffles): assert on the equivalent batch plan — stream-static joins
    // go through the same planning path per micro-batch.
    val batchPlan = spark.read.schema(StreamOps.eventSchema).parquet(dir)
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"), "left")
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"), batchPlan.take(500))
  }

  test("checkpointed restart resumes exactly-once: no reprocessed batches") {
    // the operational contract a production ingest relies on: stop the
    // query, add data, restart with the SAME checkpointLocation — the
    // restarted query processes only the new file, so the append sink
    // holds every event exactly once
    val dir = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ck").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
    def write(ids: Seq[Long], part: String): Unit =
      ids.map(i => (i, ts(i.toInt), 10L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/$part")
    write(Seq(1L, 2L), "p1")
    def start() = spark.readStream.schema(StreamOps.eventSchema)
      .parquet(s"$dir/*")
      .select($"event_id", $"user_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(sink).count() == 2)
    write(Seq(3L), "p2")
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(sink).select($"event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L)) // 1,2 NOT reprocessed after restart
  }

  test("epoch records expose the committed-epoch clock per kind (M8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    Seq(
      (7L, ts(10), 1L, "ingestion", 0.0, "{}"),
      (9L, ts(15), 1L, "ingestion", 0.0, "{}"),
      (8L, ts(30), 2L, "edit", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val out = StreamOps.runToMemory(spark, StreamOps.epochRecords(stream), "ep",
      OutputMode.Complete)
    val m = out.select($"kind", $"committed_epoch").as[(String, Long)].collect().toMap
    assert(m("ingestion") == 9L)
    assert(m("edit") == 8L)
  }

  test("dedup within watermark drops re-delivered content keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val batch = Seq(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(6), 10L, "click", 1.0, "{}"),  // same (user, type): duplicate
      (3L, ts(7), 10L, "view", 2.0, "{}"),
      (4L, ts(8), 11L, "click", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val out = StreamOps.runToMemory(spark,
      StreamOps.dedupWithinWatermark(stream, Seq("user_id", "event_type")),
      "dd", OutputMode.Append)
    val keys = out.select($"user_id", $"event_type").as[(Long, String)]
      .collect().sorted
    assert(keys.toSeq == Seq((10L, "click"), (10L, "view"), (11L, "click")))
  }

  test("stream-stream interval join pairs events within the bound only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    // user 10: click at :05 and error at :20 (in 30-min bound), error at
    // :50 (45 min after the click — out of bound); user 11: error with no
    // click. Expect exactly one joined pair.
    Seq(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(20), 10L, "error", 2.0, "{}"),
      (3L, ts(50), 10L, "error", 3.0, "{}"),
      (4L, ts(25), 11L, "error", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    def src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val joined = StreamOps.intervalJoin(
      src.where($"event_type" === "error")
        .select($"user_id", $"ts", $"event_id".as("error_id")),
      src.where($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id")),
      key = "user_id", within = "30 minutes")
      .select($"error_id", $"click_id")
    val out = StreamOps.runToMemory(spark, joined, "ssj", OutputMode.Append)
    assert(out.as[(Long, Long)].collect().toSet == Set((2L, 1L)))
  }

  test("streaming top-k keeps O(k) state and updates across batches") {
    import StreamOps.{ScoredEvent, TopKSnapshot}
    // Batch semantics first: one pass, ties broken by key.
    val events = Seq(
      ScoredEvent("g", 5.0, "e"), ScoredEvent("g", 9.0, "a"),
      ScoredEvent("g", 7.0, "c"), ScoredEvent("g", 9.0, "b"),
      ScoredEvent("h", 1.0, "z")).toDS()
    val out = StreamOps.streamingTopK(events, k = 2).collect()
      .map(s => s.group -> s.topk).toMap
    assert(out("g") == "a:9.0,b:9.0") // two 9.0s, key-asc tiebreak
    assert(out("h") == "z:1.0")

    // Real streaming: two micro-batches through the state store — batch 2
    // must merge against batch 1's retained buffer, not restart.
    val dir = java.nio.file.Files.createTempDirectory("topk-stream").toString
    def write(part: String, rows: Seq[(String, Double, String)]): Unit =
      rows.toDF("group", "score", "key")
        .coalesce(1).write.mode("append").parquet(s"$dir/$part")
    write("p1", Seq(("g", 9.0, "a"), ("g", 5.0, "e")))
    val stream = spark.readStream
      .schema("group STRING, score DOUBLE, key STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .as[ScoredEvent]
    write("p2", Seq(("g", 7.0, "c"), ("g", 2.0, "f")))
    val table = StreamOps.runToMemory(spark,
      StreamOps.streamingTopK(stream, k = 2).toDF(),
      "topk_stream", org.apache.spark.sql.streaming.OutputMode.Update)
    // The LAST update for g must reflect both batches: {a:9.0, c:7.0}.
    val snaps = table.collect().map(_.getString(1))
    assert(snaps.last == "a:9.0,c:7.0" || snaps.contains("a:9.0,c:7.0"))
  }

  test("streaming heavy-hitter candidates keep the hot item under eviction") {
    import StreamOps.TokenEvent
    // 12 HOTs in a 30-token tail with capacity 4: eviction runs, yet the
    // 25%-heavy item (> 1/(4+1) = 20%) must stay among the candidates.
    val tail = (0 until 30).map(i => TokenEvent("g", s"t${i % 15}"))
    val hot = Seq.fill(12)(TokenEvent("g", "HOT"))
    val events = new scala.util.Random(11L).shuffle(hot ++ tail).toDS()
    val out = StreamOps.streamingHeavyHitters(events, capacity = 4).collect()
    val cands = out.find(_.group == "g").get.candidates
    assert(cands.split(",").map(_.split(":")(0)).contains("HOT"))
    assert(cands.split(",").length <= 4)
  }

  test("foreachBatch maintains the incremental aggregate per micro-batch") {
    import graft.core.Incremental
    val dir = java.nio.file.Files.createTempDirectory("inc-stream").toString
    def write(part: String, rows: Seq[(String, Double, Long)]): Unit =
      rows.toDF("k", "v", "epoch").coalesce(1)
        .write.mode("append").parquet(s"$dir/$part")
    write("p1", Seq(("a", 10.0, 1L), ("b", 5.0, 2L)))
    write("p2", Seq(("a", 1.0, 3L), ("c", 7.0, 4L)))

    var state: Option[Incremental.MaintainedAgg] = None
    val q = spark.readStream
      .schema("k STRING, v DOUBLE, epoch BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // each micro-batch IS the delta: horizon Long.MinValue per batch
        // would double-count on replay, so advance() keyed on epoch keeps
        // exactly-once folding even if a batch re-delivers
        state = Some(Incremental.advance(state, batch, "k", "v", "epoch"))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val got = state.get.agg.orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSeq
    assert(got == Seq(("a", 2L, 11.0), ("b", 1L, 5.0), ("c", 1L, 7.0)))
    assert(state.get.upToEpoch == 4L)
  }

  test("stateful sessionization closes sessions across the 30-min gap") {
    val events = Seq(
      SessionEvent(1L, ts(0), "click"),
      SessionEvent(1L, ts(10), "view"),
      SessionEvent(1L, ts(50), "click"), // 40-min gap → new session
      SessionEvent(2L, ts(0), "view")).toDS()
    // batch Dataset drives the same lambda via groupByKey semantics
    val sessions = StreamOps.sessionize(events).collect()
    // only CLOSED sessions are emitted; user 1's first session closed
    assert(sessions.toSeq == Seq(SessionOut(1L, 2, 600, closed = true)))
  }

  test("streaming near-dup matches the batch LSH candidates across micro-batches") {
    import graft.dedup.Dedup
    val base = "the quick brown fox jumps over the lazy dog and keeps running"
    val docs = Seq(
      "d1" -> base,
      "d2" -> (base + "!"),                       // near-dup of d1
      "d3" -> "an entirely different document about spark structured streaming",
      "d4" -> base,                               // exact dup of d1 — arrives in batch 2
      "d5" -> "another unrelated text with its own vocabulary and shape")

    // Expected set: the batch twin — same kernels, band join, agreement
    // estimate ≥ threshold (NOT exact Jaccard: the streaming operator's
    // state holds signatures only, so the batch comparison must too).
    val docsDF = docs.toDF("id", "text")
    val sigs = docsDF.select($"id",
      Dedup.minhashSignature(Dedup.charShingles($"text", 4), 32).as("sig"))
    val bandRows = sigs.withColumn("bk",
      explode(Dedup.lshBandKeys($"sig", 8, 4))).select($"id", $"bk", $"sig")
    val expected = bandRows.as("a")
      .join(bandRows.as("b"), $"a.bk" === $"b.bk" && $"a.id" < $"b.id")
      .select($"a.id".as("a_id"), $"b.id".as("b_id"),
        (aggregate(zip_with($"a.sig", $"b.sig",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, m) => acc + m) / 32.0).as("est"))
      .where($"est" >= 0.5)
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(expected.contains(("d1", "d2")) && expected.contains(("d1", "d4")))

    // Stream the same docs in two micro-batches: d4 (dup of batch-1's d1)
    // arrives in batch 2, so the d1↔d4 hit can only come from state.
    val dir = java.nio.file.Files.createTempDirectory("neardup-stream").toString
    def write(part: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("id", "text").coalesce(1).write.mode("append").parquet(s"$dir/$part")
    write("p1", docs.take(3))
    write("p2", docs.drop(3))
    val stream = spark.readStream.schema("id STRING, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val got = StreamOps.runToMemory(spark,
      StreamOps.streamingNearDup(stream, "id", "text").toDF(), "neardup")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("streaming near-dup state survives a checkpointed restart") {
    // d1 arrives before the stop; its duplicate d9 arrives only after the
    // restart. The pair can emit iff the restarted query restored d1's
    // bucket signatures from the STATE STORE — a fresh query would have
    // nothing to collide with (batch 1 is not reprocessed: exactly-once).
    val base = "the quick brown fox jumps over the lazy dog and keeps running"
    val dir = java.nio.file.Files.createTempDirectory("neardup-restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("neardup-ck").toString
    val sink = java.nio.file.Files.createTempDirectory("neardup-sink").toString
    def write(part: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("id", "text").coalesce(1).write.mode("append").parquet(s"$dir/$part")
    def start() = StreamOps.streamingNearDup(
        spark.readStream.schema("id STRING, text STRING").parquet(s"$dir/*"),
        "id", "text").toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()
    write("p1", Seq("d1" -> base, "d2" -> "something entirely unrelated here"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    write("p2", Seq("d9" -> base))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val pairs = spark.read.parquet(sink)
      .select($"a_id", $"b_id").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("d1", "d9")))
  }

  test("dedup-on-ingest admits only unseen docs across micro-batches") {
    val root = java.nio.file.Files.createTempDirectory("dedup-ingest").toString
    val dir = java.nio.file.Files.createTempDirectory("dedup-ingest-src").toString
    val store = new graft.core.SnapshotStore(spark, root)
    val ingest = new graft.streaming.DedupIngest(spark, store)
    def write(part: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$dir/$part")
    // batch 2 re-delivers batch 1's "alpha" (different id, same content)
    // and carries an internal dup pair (5 ≡ 6)
    write("p1", Seq(1L -> "alpha beta", 2L -> "gamma delta"))
    val q = ingest.start(spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"))
    q.processAllAvailable() // batch 1 fully admitted before batch 2 exists
    write("p2", Seq(4L -> "alpha beta", 5L -> "epsilon zeta", 6L -> "epsilon zeta"))
    q.processAllAvailable(); q.stop()
    val corpus = ingest.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(corpus == Set(1L, 2L, 5L))
    assert(store.read("fp_index").count() == 3L)
    // the index holds one row per distinct content, min-id representative
    val reps = store.read("fp_index").select("rep_id").as[Long].collect().toSet
    assert(reps == Set(1L, 2L, 5L))
  }

  test("streaming IVF maintenance: docs admitted batches ago are searchable, no rebuild") {
    import graft.similarity.AnnIndex
    val root = java.nio.file.Files.createTempDirectory("ann-stream").toString
    val dir = java.nio.file.Files.createTempDirectory("ann-stream-src").toString
    val store = new graft.core.SnapshotStore(spark, root)
    val dim = 8
    // Seed index: 4 axis clusters, 20 vectors each (same planted layout as
    // AnnIndexSpec, smaller).
    val seedRows = for { a <- 0 until 4; j <- 0 until 20 } yield
      ((a * 20 + j).toLong,
        Seq.tabulate(dim)(i => if (i == a) 1.0 else 0.01 * j))
    AnnIndex.build(store, "vecs", seedRows.toDF("vid", "vec"), "vid", "vec",
      (0 until 4).map(a => Seq.tabulate(dim)(i => if (i == a) 1.0 else 0.0)))
    val v0 = store.latestVersion("vecs").get

    // Stream: each parquet file is one micro-batch routed through
    // appendIncremental — the streaming twin of build().
    def write(part: String, rows: Seq[(Long, Seq[Double])]): Unit =
      rows.toDF("vid", "vec").coalesce(1)
        .write.mode("append").parquet(s"$dir/$part")
    write("p1", Seq((1000L, Seq.tabulate(dim)(i => if (i == 2) 1.0 else 0.02))))
    val q = spark.readStream
      .schema("vid BIGINT, vec ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          AnnIndex.appendIncremental(store, "vecs", batch, "vid", "vec"): Unit
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ann-stream-ck").toString)
      .start()
    q.processAllAvailable()
    write("p2", Seq((1001L, Seq.tabulate(dim)(i => if (i == 0) 1.0 else 0.02))))
    q.processAllAvailable()
    write("p3", Seq((1002L, Seq.tabulate(dim)(i => if (i == 1) 1.0 else 0.02))))
    q.processAllAvailable(); q.stop()

    // The doc admitted TWO micro-batches earlier is found by a probe of
    // its own cell — no rebuild ever ran (every post-seed version is a
    // chain link over the original build).
    val query = Seq.tabulate(dim)(i => if (i == 2) 1.0 else 0.0)
    val hit = AnnIndex.search(spark, root, "vecs", "vid", "vec",
      query, k = 25, nprobe = 1).select("vid").as[Long].collect().toSet
    assert(hit.contains(1000L), s"batch-1 doc must be searchable, got $hit")
    val post = store.history("vecs").filter(_ > v0)
    assert(post.size === 3 && post.forall(v => store.baseOf("vecs", v).nonEmpty),
      "all three micro-batches appended as chain links; none triggered a rebuild")
  }

  test("streaming near-dup bucket state is capped with FIFO eviction") {
    import graft.streaming.StreamOps.NearDupHit
    // Three identical docs through maxPerBucket = 1: each bucket retains
    // only the newest signature, so e1↔e3 (evicted) never emits while the
    // adjacent pairs do — the state bound is real, not advisory.
    val docs = Seq("e1" -> "aaaa bbbb cccc dddd", "e2" -> "aaaa bbbb cccc dddd",
      "e3" -> "aaaa bbbb cccc dddd").toDF("id", "text")
    val got = StreamOps.streamingNearDup(docs, "id", "text", maxPerBucket = 1)
      .collect().toSet
    assert(got.map(h => (h.a_id, h.b_id)) == Set(("e1", "e2"), ("e2", "e3")))
    assert(got.forall(_.est_jaccard == 1.0))
  }
}
