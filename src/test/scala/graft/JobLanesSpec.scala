package graft

import java.nio.file.Files
import graft.core.SnapshotStore
import graft.streaming.JobLanes
import graft.streaming.JobLanes.LaneConfig

/** Worker-lane scheduling semantics (VERDICT r7 item #7): typed lanes with
  * per-lane slot ceilings, priority-ordered claims, stale reaping, and a
  * durable event log that a replacement leader can fold back. Mirrors the
  * reference's lane contract (lane_manager.py claim query + worker_registry
  * lane-uniqueness + job_scheduler reaper, worker-lanes.md). */
class JobLanesSpec extends SparkSpec {

  private val laneCfg = Seq(
    LaneConfig("interactive", Seq("ingestion", "polarity"),
      maxSlots = 2, staleTimeoutMs = 30L * 60 * 1000),
    LaneConfig("maintenance", Seq("projection", "vocab_refresh"),
      maxSlots = 1, staleTimeoutMs = 60L * 60 * 1000))

  private def fixture(): (SnapshotStore, JobLanes) = {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-lanes").toString)
    (store, new JobLanes(spark, store, laneCfg))
  }

  test("a maintenance job is deferred under load; lane isolation holds") {
    val (_, m) = fixture()
    // ingest load: two ingestion jobs + two maintenance jobs, all approved
    Seq("i1" -> "ingestion", "i2" -> "ingestion",
        "m1" -> "projection", "m2" -> "vocab_refresh").foreach {
      case (id, t) => m.submit(id, t); m.approve(id)
    }
    // interactive fills both slots; maintenance (1 slot) claims ONE —
    // the second maintenance job is DEFERRED
    assert(m.claimNext("interactive").map(_.jobId).toSet == Set("i1", "i2"))
    assert(m.claimNext("maintenance").map(_.jobId) == Seq("m1"))
    assert(m.claimNext("maintenance").isEmpty) // no slot: m2 waits
    assert(m.job("m2").get.status == "approved")
    // lane isolation: a saturated maintenance lane never blocks
    // interactive claims (and vice versa) — i3 claims while m2 waits...
    m.submit("i3", "ingestion"); m.approve("i3")
    assert(m.claimNext("interactive").isEmpty) // interactive also full
    m.complete("i1")
    assert(m.claimNext("interactive").map(_.jobId) == Seq("i3"))
    assert(m.job("m2").get.status == "approved") // still deferred
    // ...and the slot frees only when the RUNNING maintenance job ends
    m.complete("m1")
    assert(m.claimNext("maintenance").map(_.jobId) == Seq("m2"))
  }

  test("claims order by priority DESC then submission order") {
    val (_, m) = fixture()
    m.submit("low", "projection", priority = 1)
    m.submit("hi", "vocab_refresh", priority = 9)
    m.submit("mid1", "projection", priority = 5)
    m.submit("mid2", "projection", priority = 5)
    Seq("low", "hi", "mid1", "mid2").foreach(m.approve(_))
    def one() = { val j = m.claimNext("maintenance"); m.complete(j.head.jobId); j.head.jobId }
    assert(one() == "hi")
    assert(one() == "mid1") // FIFO within equal priority
    assert(one() == "mid2")
    assert(one() == "low")
  }

  test("lifecycle guards: only approved jobs claim; unknown types refused") {
    val (_, m) = fixture()
    m.submit("j1", "ingestion") // awaiting_approval
    assert(m.claimNext("interactive").isEmpty)
    intercept[IllegalArgumentException] { m.submit("x", "no_such_type") }
    intercept[IllegalArgumentException] { m.submit("j1", "ingestion") } // dup id
    m.cancel("j1")
    assert(m.job("j1").get.status == "cancelled")
    intercept[IllegalArgumentException] { m.approve("j1") } // cancelled is terminal
  }

  test("job types must be unique across lanes") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-lanes").toString)
    intercept[IllegalArgumentException] {
      new JobLanes(spark, store, Seq(
        LaneConfig("a", Seq("ingestion"), 1, 1000),
        LaneConfig("b", Seq("ingestion"), 1, 1000)))
    }
  }

  test("stale running jobs are reaped back to approved and re-claim with attempts+1") {
    val (_, m) = fixture()
    m.submit("j1", "projection"); m.approve("j1")
    assert(m.claimNext("maintenance", nowMs = 1000L).nonEmpty)
    // within the 60 min timeout: nothing reaped
    assert(m.reapStale(nowMs = 1000L + 60L * 60 * 1000).isEmpty)
    val reaped = m.reapStale(nowMs = 2000L + 60L * 60 * 1000)
    assert(reaped.map(_.jobId) == Seq("j1"))
    assert(m.job("j1").get.status == "approved")
    val re = m.claimNext("maintenance", nowMs = 3000L + 60L * 60 * 1000)
    assert(re.head.attempts == 2)
  }

  test("the log is the truth: a replacement leader folds back the exact state") {
    val (store, m) = fixture()
    m.submit("i1", "ingestion", priority = 7); m.approve("i1")
    m.submit("m1", "projection"); m.approve("m1")
    m.claimNext("interactive", nowMs = 42L)
    m.submit("i2", "polarity") // still awaiting approval
    m.close() // leader dies; lock released
    val m2 = new JobLanes(spark, store, laneCfg, worker = "leader-1")
    assert(m2.job("i1").get.status == "running")
    assert(m2.job("i1").get.claimedAtMs == 42L)
    assert(m2.job("m1").get.status == "approved")
    assert(m2.job("i2").get.status == "awaiting_approval")
    // the new leader continues the lifecycle where the old one stopped
    m2.complete("i1")
    assert(m2.claimNext("maintenance").map(_.jobId) == Seq("m1"))
    assert(m2.laneStatus("interactive") ==
      Map("completed" -> 1, "awaiting_approval" -> 1))
  }

  test("split-brain refused: a second leader on the same root fails fast") {
    val (store, m) = fixture()
    intercept[IllegalArgumentException] {
      new JobLanes(spark, store, laneCfg, worker = "intruder")
    }
    m.close()
    new JobLanes(spark, store, laneCfg, worker = "successor").close()
  }

  test("lifecycle events flow through the store's change feed") {
    val (store, m) = fixture()
    m.submit("j1", "ingestion"); m.approve("j1")
    val v = store.latestVersion("jobs_log").get
    m.claimNext("interactive"); m.complete("j1")
    // a monitor catching up from v sees exactly the claim + completion
    val events = store.changesSince("jobs_log", v)
      .select("event").collect().map(_.getString(0)).toSet
    assert(events == Set("claimed", "completed"))
  }
}
