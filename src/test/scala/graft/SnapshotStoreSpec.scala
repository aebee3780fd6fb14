package graft

import graft.core.SnapshotStore

/** Snapshot-isolation contract of the versioned table store (M8): commits
  * create immutable versions, readers pin the version they resolved, time
  * travel reads any kept version, vacuum retains the latest. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  def freshStore(): SnapshotStore = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft-snap").toString)

  test("commit bumps the version; read sees the latest; readAt time-travels") {
    val st = freshStore()
    assert(st.latestVersion("t").isEmpty)
    assert(st.commit("t", Seq(1, 2).toDF("x")) == 1L)
    assert(st.commit("t", Seq(3).toDF("x")) == 2L)
    assert(st.read("t").as[Int].collect().toSet == Set(3))
    assert(st.readAt("t", 1).as[Int].collect().toSet == Set(1, 2))
    assert(st.history("t") == Seq(1L, 2L))
  }

  test("a pinned reader is unaffected by a later commit (snapshot isolation)") {
    val st = freshStore()
    st.commit("t", Seq("a", "b").toDF("s"))
    val pinned = st.read("t") // resolves the pointer NOW
    st.commit("t", Seq("c").toDF("s"))
    assert(pinned.as[String].collect().toSet == Set("a", "b"))
    assert(st.read("t").as[String].collect().toSet == Set("c"))
  }

  test("append unions with the current snapshot as a new version") {
    val st = freshStore()
    st.append("t", Seq(1).toDF("x"))
    st.append("t", Seq(2).toDF("x"))
    assert(st.read("t").as[Int].collect().toSet == Set(1, 2))
    assert(st.history("t") == Seq(1L, 2L))
  }

  test("vacuum keeps the newest versions and their data") {
    val st = freshStore()
    (1 to 4).foreach(i => st.commit("t", Seq(i).toDF("x")))
    st.vacuum("t", keepLast = 2)
    assert(st.history("t") == Seq(3L, 4L))
    assert(st.read("t").as[Int].collect().toSet == Set(4))
    assert(st.readAt("t", 3).as[Int].collect().toSet == Set(3))
  }

  test("epoch clock integration: committed version drives Freshness") {
    val st = freshStore()
    st.commit("events", Seq(1L).toDF("event_id"))
    val fresh = new graft.core.Freshness(() => st.latestVersion("events").getOrElse(0L))
    var computes = 0
    fresh.register("totals") { computes += 1; st.read("events").groupBy().count() }
    fresh.get("totals"); fresh.get("totals")
    assert(computes == 1) // cached within the epoch
    st.commit("events", Seq(1L, 2L).toDF("event_id"))
    assert(fresh.get("totals").head().getLong(0) == 2L)
    assert(computes == 2) // clock advanced → recompute
  }
}
