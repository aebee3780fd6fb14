package graft

import graft.core.{Incremental, MaterializedView, SnapshotStore}

/** CDC-maintained materialized aggregate: refresh folds only unseen change
  * sets, equals the full recompute after any refresh schedule, is
  * idempotent with no new data, and carries its horizon atomically inside
  * the committed view. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): SnapshotStore = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft-mv").toString)

  private def rows(view: org.apache.spark.sql.DataFrame): Set[(String, Long, BigDecimal)] =
    view.select("k", "n", "total").as[(String, Long, BigDecimal)].collect().toSet

  test("refresh ≡ full recompute across an interleaved append/refresh schedule") {
    val st = fresh()
    st.append("src", Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(1L))
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))

    st.append("src", Seq(("a", 10.0)).toDF("k", "v"))
    st.append("src", Seq(("c", 5.0)).toDF("k", "v"))
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(3L))
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
    assert(MaterializedView.horizon(st, "view") == Some(3L))
  }

  test("refresh with no new change sets is a no-op: no new view version") {
    val st = fresh()
    st.append("src", Seq(("a", 1.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    val versions = st.history("view")
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(1L))
    assert(st.history("view") == versions) // idempotent: nothing committed
  }

  test("a crash-replayed refresh cannot double-fold (horizon is atomic)") {
    val st = fresh()
    st.append("src", Seq(("a", 1.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    st.append("src", Seq(("a", 2.0)).toDF("k", "v"))
    // two refreshes racing over the same delta (the crash-retry shape):
    // the second sees the first's committed horizon and folds nothing
    MaterializedView.refresh(st, "src", "view", "k", "v")
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == Set(("a", 2L, BigDecimal("3.0000"))))
  }

  test("a rewrite triggers ONE full recompute, then folding resumes") {
    val st = fresh()
    st.commit("src", Seq(("a", 1.0)).toDF("k", "v")) // rewrite: no change set
    // r12 semantics: a rewrite is detected (nonFeedMutationsSince) and the
    // view recomputes from the snapshot instead of silently staling
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(1L))
    assert(rows(MaterializedView.read(st, "view"))
      == Set(("a", 1L, BigDecimal("1.0000"))))
    // appends after the rewrite fold incrementally again (no-op check:
    // a second refresh with nothing new commits no view version)
    val versions = st.history("view")
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(1L))
    assert(st.history("view") == versions)
    st.append("src", Seq(("b", 2.0)).toDF("k", "v"))
    assert(MaterializedView.refresh(st, "src", "view", "k", "v") == Some(2L))
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
  }

  test("a fold that retracts EVERYTHING empties the view; refresh survives it") {
    import org.apache.spark.sql.functions.lit
    val st = fresh()
    st.append("src", Seq(("a", 1.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    st.delete("src", lit(true))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view")).isEmpty)
    // horizon survives the empty view (props carrier) and folding resumes
    assert(MaterializedView.horizon(st, "view").isDefined)
    st.append("src", Seq(("b", 3.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == Set(("b", 1L, BigDecimal("3.0000"))))
  }

  test("randomized schedule differential: fold ≡ recompute over appends+deletes") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(1234)
    val st = fresh()
    var nextId = 0
    // seeded random interleaving of appends, deletes, and refreshes; after
    // EVERY refresh the view must equal the from-scratch recompute
    st.append("src", Seq(("a", 1.0, 0)).toDF("k", "v", "id"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    for (step <- 1 to 18) {
      rnd.nextInt(3) match {
        case 0 | 1 =>
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextId += 1
            (s"k${rnd.nextInt(5)}", (rnd.nextInt(80) + 1) / 4.0, nextId)
          }
          st.append("src", batch.toDF("k", "v", "id"))
        case 2 =>
          // delete a random id band (possibly empty)
          val lo = rnd.nextInt(math.max(nextId, 1))
          st.delete("src", col("id").between(lo, lo + rnd.nextInt(4)))
      }
      if (rnd.nextBoolean()) {
        MaterializedView.refresh(st, "src", "view", "k", "v")
        assert(rows(MaterializedView.read(st, "view"))
          == rows(Incremental.recompute(st.read("src"), "k", "v")), s"step $step")
      }
    }
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")), "final")
  }

  test("deletes fold incrementally: exact retraction, zero-count groups drop") {
    import org.apache.spark.sql.functions.col
    val st = fresh()
    st.append("src", Seq(("a", 1.0), ("a", 2.5), ("b", 4.0)).toDF("k", "v"))
    st.append("src", Seq(("b", 6.0), ("c", 9.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    // delete one of a's rows and ALL of c's
    st.delete("src", (col("k") === "a" && col("v") > 2.0) || col("k") === "c")
    // deletes are feed-visible, NOT rewrite-class: no recompute trigger
    assert(st.nonFeedMutationsSince("src", 0L).isEmpty)
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
    assert(rows(MaterializedView.read(st, "view"))
      == Set(("a", 1L, BigDecimal("1.0000")), ("b", 2L, BigDecimal("10.0000"))))
    // and folding continues past the delete
    st.append("src", Seq(("c", 1.5)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
  }

  test("a view vacuumed past BOOTSTRAPS: bounded refold, exact vs recompute") {
    import org.apache.spark.sql.functions.col
    val st = fresh()
    st.append("src", Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")) // v1
    st.append("src", Seq(("a", 5.0), ("c", 3.0)).toDF("k", "v")) // v2
    MaterializedView.refresh(st, "src", "view", "k", "v") // horizon 2
    // history the view will MISS: a delete, a compaction, an append
    st.delete("src", col("k") === "b")                           // v3
    st.compact("src")                                            // v4
    st.append("src", Seq(("d", 7.0)).toDF("k", "v"))             // v5
    st.vacuum("src", keepLast = 2) // reclaims v1-v3: view horizon 2 < h 3
    assert(st.vacuumHorizon("src") >= 3L, "precondition: horizon raised")
    assert(MaterializedView.horizon(st, "view").get <
      st.vacuumHorizon("src"), "precondition: the view lags below it")
    // the plain feed refuses this consumer (its deltas are gone)...
    val e = intercept[Exception](st.changeFeedSince("src", 2L).count())
    assert(e.getMessage.contains("vacuumed"))
    // ...but refresh BOOTSTRAPS: oldest retained snapshot + retained
    // deltas refolded from empty, landing exactly on the recompute
    val newH = MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(newH == Some(st.latestVersion("src").get))
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
    assert(rows(MaterializedView.read(st, "view")) == Set(
      ("a", 2L, BigDecimal("6.0000")), ("c", 1L, BigDecimal("3.0000")),
      ("d", 1L, BigDecimal("7.0000"))))
    // and incremental folding RESUMES after the bootstrap
    st.append("src", Seq(("d", 1.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
    // a FIRST refresh against an already-vacuumed source bootstraps too
    // (changeFeedSince(0) would refuse; a new consumer must still be able
    // to subscribe without a side-channel recompute)
    MaterializedView.refresh(st, "src", "view2", "k", "v")
    assert(rows(MaterializedView.read(st, "view2"))
      == rows(Incremental.recompute(st.read("src"), "k", "v")))
  }

  test("an EMPTY bootstrap frame means the table is empty — the view must follow") {
    import org.apache.spark.sql.functions.col
    val st = fresh()
    st.append("src", Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    MaterializedView.refresh(st, "src", "view", "k", "v") // non-empty agg
    assert(rows(MaterializedView.read(st, "view")).nonEmpty)
    // empty the table, collapse, vacuum the view's deltas away: the
    // bootstrap frame is EMPTY (empty oldest snapshot, no deltas) —
    // which is NOT "nothing changed"; the old aggregate is obsolete
    st.delete("src", col("k").isNotNull)
    st.compact("src")
    st.vacuum("src", keepLast = 1)
    assert(MaterializedView.horizon(st, "view").get <
      st.vacuumHorizon("src"), "precondition: the view lags the horizon")
    MaterializedView.refresh(st, "src", "view", "k", "v")
    assert(rows(MaterializedView.read(st, "view")).isEmpty,
      "a view of an emptied-then-vacuumed source must serve EMPTY, " +
        "not its stale pre-horizon aggregate")
  }
}
