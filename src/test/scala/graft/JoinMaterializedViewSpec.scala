package graft

import org.apache.spark.sql.functions._
import graft.core.{JoinMaterializedView, SnapshotStore}
import scala.util.Random

/** Incrementally maintained aggregate over a two-table join: after any
  * interleaved schedule of single-table and ATOMIC multi-table mutations
  * on both sides, a refresh equals the full recompute of the same
  * aggregate over the joined snapshots at the view's recorded cut — the
  * delta algebra Δ(L⋈R) = ΔL⋈R@new + L@old⋈ΔR, with the old term read
  * from the versioned store instead of maintained auxiliary state. */
class JoinMaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): SnapshotStore = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft-jmv").toString)

  /** The reference the incremental path must equal: the same aggregate
    * over the joined snapshots at (vL, vR). */
  private def reference(st: SnapshotStore, vL: Long, vR: Long)
      : Set[(Long, Long, BigDecimal)] = {
    val l = st.readAt("edges", vL)
    val r = st.readAt("concepts", vR)
    l.join(r, l("cid") === r("cid2"), "inner")
      .groupBy(col("gen")).agg(count(lit(1)).as("n"),
        sum(col("w").cast("decimal(28,4)")).as("total"))
      .select("gen", "n", "total").as[(Long, Long, BigDecimal)]
      .collect().toSet
  }

  private def viewRows(st: SnapshotStore): Set[(Long, Long, BigDecimal)] =
    JoinMaterializedView.read(st, "view")
      .select(col("gen"), col("n"), col("total").cast("decimal(28,4)"))
      .as[(Long, Long, BigDecimal)].collect().toSet

  private def refreshAndCheck(st: SnapshotStore): Unit = {
    val Some((vL, vR)) = JoinMaterializedView.refresh(st, "edges", "concepts",
      "cid", "cid2", "gen", "w", "view"): @unchecked
    assert(viewRows(st) == reference(st, vL, vR),
      s"view diverged from recompute at cut ($vL, $vR)")
  }

  test("refresh ≡ joined recompute across a randomized mutation schedule") {
    val st = fresh()
    // concepts(cid2, gen): the dimension side; edges(eid, cid, w): facts
    st.commit("concepts", Seq((1L, 1L), (2L, 2L)).toDF("cid2", "gen"))
    st.commit("edges",
      Seq((10L, 1L, 1.5), (11L, 1L, 2.0), (20L, 2L, 4.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st)

    val rnd = new Random(4242L)
    var nextC = 100L
    var nextE = 1000L
    val liveC = scala.collection.mutable.Set(1L, 2L)
    (1 to 24).foreach { i =>
      rnd.nextInt(7) match {
        case 0 => // new concept (dimension append)
          nextC += 1
          st.append("concepts", Seq((nextC, nextC % 5)).toDF("cid2", "gen"))
          liveC += nextC
        case 1 | 2 => // fact appends onto random live concepts
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextE += 1
            (nextE, liveC.toSeq(rnd.nextInt(liveC.size)), rnd.nextInt(10) / 2.0)
          }
          st.append("edges", batch.toDF("eid", "cid", "w"))
        case 3 => // fact delete (signed retraction through the feed)
          st.delete("edges", col("eid") % 3 === i % 3 && col("eid") > 1000L)
        case 4 => // fact UPDATE: delete+insert image pair must re-join
          st.update("edges", col("cid") === liveC.toSeq(rnd.nextInt(liveC.size)),
            Map("w" -> (col("w") + lit(0.5))))
        case 5 => // ATOMIC cascade: retire a concept AND its edges — the
          // consistent cut means the view can never fold half of this
          if (liveC.size > 1) {
            val cid = liveC.toSeq(rnd.nextInt(liveC.size))
            st.deleteAll(Map(
              "concepts" -> (col("cid2") === cid),
              "edges" -> (col("cid") === cid)), maxRetries = 10)
            liveC -= cid
          }
        case 6 => // ATOMIC ingest: concept + its first edges in one tx
          nextC += 1; nextE += 1
          st.appendAll(Map(
            "concepts" -> Seq((nextC, nextC % 5)).toDF("cid2", "gen"),
            "edges" -> Seq((nextE, nextC, 3.0)).toDF("eid", "cid", "w")))
          liveC += nextC
      }
      if (rnd.nextInt(3) == 0) refreshAndCheck(st)
    }
    refreshAndCheck(st)
  }

  test("refresh with nothing new is a no-op; horizon survives empty views") {
    val st = fresh()
    st.commit("concepts", Seq((1L, 1L)).toDF("cid2", "gen"))
    st.commit("edges", Seq((10L, 1L, 2.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st)
    val versions = st.history("view")
    assert(JoinMaterializedView.refresh(st, "edges", "concepts",
      "cid", "cid2", "gen", "w", "view").isDefined)
    assert(st.history("view") == versions, "no-op refresh must not commit")
    // a cascade that empties the join: the view goes empty but keeps
    // folding afterwards (horizon rides commit props, not rows)
    st.deleteAll(Map("concepts" -> (col("cid2") === 1L),
      "edges" -> (col("cid") === 1L)))
    refreshAndCheck(st)
    assert(viewRows(st).isEmpty)
    st.appendAll(Map(
      "concepts" -> Seq((2L, 7L)).toDF("cid2", "gen"),
      "edges" -> Seq((20L, 2L, 5.0)).toDF("eid", "cid", "w")))
    refreshAndCheck(st)
    assert(viewRows(st) == Set((7L, 1L, BigDecimal("5.0000"))))
    // a source compaction moves versions but folds nothing: the horizon
    // advances as one DATA-LESS props link, never a rewrite of the view
    st.compact("edges")
    refreshAndCheck(st)
    assert(st.commitProps("view", st.latestVersion("view").get)
      .get(graft.core.SnapshotStore.OpProp).contains("set-properties"),
      "an empty-delta refresh must advance the horizon data-lessly")
    assert(viewRows(st) == Set((7L, 1L, BigDecimal("5.0000"))))
  }

  test("a rewrite on either side triggers ONE recompute, then folding resumes") {
    val st = fresh()
    st.commit("concepts", Seq((1L, 1L)).toDF("cid2", "gen"))
    st.commit("edges", Seq((10L, 1L, 2.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st)
    st.commit("concepts", Seq((1L, 1L), (2L, 2L)).toDF("cid2", "gen")) // rewrite
    st.append("edges", Seq((20L, 2L, 3.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st) // recompute at the cut
    st.append("edges", Seq((21L, 2L, 1.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st) // incremental again
  }

  test("a crash-replayed refresh cannot double-fold the join delta") {
    val st = fresh()
    st.commit("concepts", Seq((1L, 1L)).toDF("cid2", "gen"))
    st.commit("edges", Seq((10L, 1L, 2.0)).toDF("eid", "cid", "w"))
    refreshAndCheck(st)
    st.append("edges", Seq((11L, 1L, 3.0)).toDF("eid", "cid", "w"))
    JoinMaterializedView.refresh(st, "edges", "concepts",
      "cid", "cid2", "gen", "w", "view")
    JoinMaterializedView.refresh(st, "edges", "concepts",
      "cid", "cid2", "gen", "w", "view") // same delta again: no-op
    assert(viewRows(st) == Set((1L, 2L, BigDecimal("5.0000"))))
  }
}
