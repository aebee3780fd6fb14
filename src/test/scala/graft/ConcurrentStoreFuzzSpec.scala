package graft

import org.apache.spark.sql.functions._
import graft.core.SnapshotStore

import scala.util.Random

/** CONCURRENT fuzz of the store's OCC surface: several writer threads on
  * ONE root racing appends, row deletes, and schema DDL for real — no
  * testRaceHook choreography — with end-state INVARIANTS instead of a
  * step-by-step model (concurrency has no single model order):
  *
  *   - row conservation: every appended row survives exactly once unless
  *     its owner deleted it (writers only ever delete their OWN key
  *     range, so the expected final multiset is exact);
  *   - schema convergence: every concurrently-added column is present
  *     exactly once (the relink RESTAMP path: same-name adds from racing
  *     writers mint different field IDs and must re-wire, not null out);
  *   - history integrity: every committed version stays readable, the
  *     chain strictly ascends, and reads never throw mid-race.
  *
  * What the deterministic specs pin one interleaving at a time, this
  * exercises under genuine scheduling: CAS storms, relinks over relinks,
  * rebases over pure appends, and the ID-divergence restamp. Thread
  * count and op counts are small enough to finish in seconds; every
  * operation retries through the store's own liveness machinery. */
class ConcurrentStoreFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("racing writers: row conservation, schema convergence, readable history") {
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz").toString
    val store = new SnapshotStore(spark, root)
    store.commit("t", Seq((0L, 0L)).toDF("k", "v")) // seed (writer keys are >0)
    store.commit("t2", Seq((0L, 0L)).toDF("k", "v")) // txn sibling table

    val writers = 3
    val opsPerWriter = 8
    // expected end state per writer, built as each thread's ops COMPLETE
    // (an op that returned has committed — OCC guarantees it)
    val appended = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val deleted = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val updated = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val txnKeys = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val constraintUp = new java.util.concurrent.atomic.AtomicBoolean(false)
    val addedCols = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            // each writer its own store INSTANCE (cross-instance, same
            // root — the cross-JVM shape minus the process boundary)
            val st = new SnapshotStore(spark, root)
            val rnd = new Random(9000L + w)
            var nextKey = (w + 1) * 1000000L
            var myCols = List.empty[String] // this writer's added columns
            (1 to opsPerWriter).foreach { i =>
              rnd.nextInt(9) match {
                case 0 | 1 => // append a batch of OWN unique keys
                  val ks = (0 until 1 + rnd.nextInt(3)).map { _ =>
                    nextKey += 1; nextKey }
                  st.append("t", ks.map(k => (k, k * 2)).toDF("k", "v"))
                  appended(w).synchronized { appended(w) ++= ks }
                case 8 => // ATOMIC multi-table append racing everything:
                  // the same keys land in t AND t2, or neither (appendAll's
                  // write-ahead intent + multi-CAS with relink-on-stale)
                  val ks = (0 until 1 + rnd.nextInt(2)).map { _ =>
                    nextKey += 1; nextKey }
                  st.appendAll(Map(
                    "t" -> ks.map(k => (k, k * 2)).toDF("k", "v"),
                    "t2" -> ks.map(k => (k, k * 2)).toDF("k", "v")))
                  appended(w).synchronized { appended(w) ++= ks }
                  txnKeys(w).synchronized { txnKeys(w) ++= ks }
                case 2 => // delete one of OWN already-committed keys
                  val mine = appended(w).synchronized {
                    (appended(w) -- deleted(w)).toSeq }
                  if (mine.nonEmpty) {
                    val k = mine(rnd.nextInt(mine.size))
                    st.delete("t", col("k") === k, maxRetries = 25)
                    deleted(w).synchronized { deleted(w) += k }
                  }
                case 3 => // add a column; HALF the time a SHARED name, so
                  // two writers race the same add from the same base and
                  // the loser exercises retype-check or relink-restamp
                  val name =
                    if (rnd.nextBoolean()) s"shared_c$i"
                    else s"w${w}_c$i"
                  try {
                    st.addColumns("t", org.apache.spark.sql.types.StructType(
                      Seq(org.apache.spark.sql.types.StructField(name,
                        org.apache.spark.sql.types.LongType))))
                    addedCols.add(name)
                    if (name.startsWith(s"w${w}_")) myCols ::= name
                  } catch {
                    // the SHARED name may legitimately already exist
                    // (sibling won) — anything else is a real failure
                    case e: IllegalArgumentException
                        if e.getMessage != null &&
                          e.getMessage.contains("already exist") =>
                      addedCols.add(name)
                  }
                case 4 => // metadata RENAME of one of this writer's OWN
                  // added columns (fresh target) — CAS-until-won racing
                  // every other writer's commits; deletes/appends racing
                  // it recompute/relink through the store's machinery
                  myCols match {
                    case c :: rest =>
                      val to = s"${c}_r$i"
                      st.renameColumns("t", Map(c -> to))
                      addedCols.remove(c); addedCols.add(to)
                      myCols = to :: rest
                    case Nil => ()
                  }
                case 5 => // compact under fire (generous retry budget —
                  // a continuously-hot table legitimately exhausts a
                  // small one; exhaustion is a loud refusal, not data
                  // loss, but here we want the fold to land)
                  if (w == 0 && i == opsPerWriter / 2)
                    st.compact("t", maxRetries = 50)
                case 6 => // UPDATE one of OWN keys: v -> v + 1 (the DV /
                  // post-image path racing everyone else's commits);
                  // v-integrity accounting moves the key to the updated set
                  val mine = appended(w).synchronized {
                    (appended(w) -- deleted(w) -- updated(w)).toSeq }
                  if (mine.nonEmpty) {
                    val k = mine(rnd.nextInt(mine.size))
                    st.update("t", col("k") === k,
                      Map("v" -> (col("v") + lit(1L))), maxRetries = 25)
                    updated(w).synchronized { updated(w) += k }
                  }
                case 7 => // one writer lands a CHECK constraint mid-run;
                  // afterwards a VIOLATING append must refuse everywhere
                  // (incl. through the relink re-validation when the
                  // appender raced the constraint's CAS)
                  if (w == writers - 1 && !constraintUp.get()) {
                    st.addCheckConstraint("t", "k_nonneg", "k >= 0")
                    constraintUp.set(true)
                  } else if (constraintUp.get()) {
                    val bad = try {
                      st.append("t", Seq((-1L * (w * 100 + i), 0L)).toDF("k", "v"))
                      false
                    } catch {
                      case e: IllegalArgumentException
                          if e.getMessage != null &&
                            e.getMessage.contains("k_nonneg") => true
                    }
                    assert(bad, "a violating append must refuse once the " +
                      "constraint is committed")
                  }
              }
              // interleaved read: must never throw and must see a
              // consistent committed snapshot
              assert(st.read("t").count() >= 1L)
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()

    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"writer failed: $f")
    }

    // row conservation: exactly the surviving owned keys, plus the seed
    val expected = (0 until writers)
      .flatMap(w => appended(w) -- deleted(w)).toSet + 0L
    val got = store.read("t").select("k").as[Long].collect()
    assert(got.length == got.toSet.size, "no row may appear twice")
    assert(got.toSet == expected,
      s"lost=${expected -- got.toSet} phantom=${got.toSet -- expected}")
    // value integrity: the restamp path must never cross-wire columns;
    // each writer updates a key AT MOST once, so v is exactly k*2 (+1
    // iff its owner updated it)
    val updatedKeys = (0 until writers).flatMap(w => updated(w)).toSet
    val rows = store.read("t").select("k", "v").as[(Long, Long)].collect()
    rows.filter(_._1 > 0L).foreach { case (k, v) =>
      val want = k * 2 + (if (updatedKeys.contains(k)) 1L else 0L)
      assert(v == want, s"k=$k v=$v want=$want")
    }
    // schema convergence: every add present exactly once, no dup names
    val cols = store.read("t").columns.toSeq
    assert(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    addedCols.forEach(c => assert(cols.contains(c), s"lost column $c"))
    // txn atomicity: every appendAll batch landed in BOTH tables — t2
    // holds exactly the union of all writers' txn keys (t2 sees no
    // deletes/updates), and every txn key reached t's appended set
    val allTxn = (0 until writers).flatMap(w => txnKeys(w)).toSet
    val t2Keys = store.read("t2").select("k").as[Long].collect().toSet - 0L
    assert(t2Keys == allTxn,
      s"txn halves diverged: onlyT2=${t2Keys -- allTxn} " +
        s"missing=${allTxn -- t2Keys}")
    // history integrity: strictly ascending, every version readable
    val h = store.history("t")
    assert(h == h.sorted && h.distinct == h)
    h.foreach(v => store.readAt("t", v).count())
    val h2 = store.history("t2")
    assert(h2 == h2.sorted)
    h2.foreach(v => store.readAt("t2", v).count())
  }

  test("cascade deletes race atomic appends: no reader ever observes a dangling edge") {
    // The reference's cascade shape under free-running schedules: each
    // ingest lands (concept + its edges) via appendAll, each retirement
    // removes (concept + its edges) via deleteAll. Invariants:
    //   - END STATE: edges reference exactly the surviving concepts —
    //     never an edge whose concept is gone nor a concept that kept a
    //     retired edge;
    //   - MID-RACE: the E1→C→E2 read protocol. Two reads are two pointer
    //     resolutions, so pure read-skew can show an edge in E1 whose
    //     concept a cascade removed before C — but then the SAME cascade
    //     already removed its edges, so the dangler must be gone from a
    //     RE-read E2. A half-committed cascade (concept gone, edges
    //     still there across both reads) fails this; atomic commits
    //     cannot.
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz2").toString
    val store = new SnapshotStore(spark, root)
    store.commit("concepts", Seq((0L, 0L)).toDF("cid", "gen"))
    store.commit("edges", Seq((0L, 0L)).toDF("eid", "cid"))

    val writers = 3
    val opsPerWriter = 7
    val ingested = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long]) // concept ids
    val retired = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val trimmed = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            val rnd = new Random(7100L + w)
            var nextCid = (w + 1) * 1000000L
            (1 to opsPerWriter).foreach { _ =>
              rnd.nextInt(4) match {
                case 0 | 1 => // atomic ingest: concept + 2 owned edges
                  nextCid += 1
                  val cid = nextCid
                  st.appendAll(Map(
                    "concepts" -> Seq((cid, w.toLong)).toDF("cid", "gen"),
                    "edges" -> Seq((cid * 10, cid), (cid * 10 + 1, cid))
                      .toDF("eid", "cid")))
                  ingested(w).synchronized { ingested(w) += cid }
                case 2 => // atomic cascade retirement of an OWN concept
                  val mine = ingested(w).synchronized {
                    (ingested(w) -- retired(w)).toSeq }
                  if (mine.nonEmpty) {
                    val cid = mine(rnd.nextInt(mine.size))
                    st.deleteAll(Map(
                      "concepts" -> (col("cid") === cid),
                      "edges" -> (col("cid") === cid)), maxRetries = 25)
                    retired(w).synchronized { retired(w) += cid }
                  }
                case 3 => // atomic TRIM: the MIXED update+delete tx
                  // (mutateAll) — stamp the concept's gen AND drop one of
                  // its edges at one commit point, racing everything else
                  val mine = ingested(w).synchronized {
                    (ingested(w) -- retired(w) -- trimmed(w)).toSeq }
                  if (mine.nonEmpty) {
                    val cid = mine(rnd.nextInt(mine.size))
                    st.mutateAll(
                      updates = Map("concepts" -> ((col("cid") === cid,
                        Map("gen" -> (col("gen") + lit(100L)))))),
                      deletes = Map("edges" ->
                        (col("eid") === cid * 10 + 1)),
                      maxRetries = 25)
                    trimmed(w).synchronized { trimmed(w) += cid }
                  }
              }
              // the E1→C→E2 dangling probe, every iteration, mid-race
              val e1 = st.read("edges").select("cid").as[Long].collect().toSet
              val c = st.read("concepts").select("cid").as[Long].collect().toSet
              val danglers = e1 -- c
              if (danglers.nonEmpty) {
                val e2 = st.read("edges").select("cid").as[Long].collect().toSet
                assert((danglers & e2).isEmpty,
                  s"HALF-COMMITTED cascade visible: edges of ${danglers & e2} " +
                    "survived two reads with their concepts gone")
              }
              // the CONSISTENT-CUT probe: snapshotAll pins ONE
              // transactional cut, so the per-read skew the E1→C→E2
              // protocol must tolerate is structurally gone — at ANY cut,
              // edge cids equal concept cids EXACTLY (ingest and cascade
              // move both tables at one commit point), and the trim tx's
              // halves agree (gen bumped ⟺ second edge gone), an
              // invariant no pair of independent reads could assert
              val cut = st.readAll(Seq("concepts", "edges"))
              val cutC = cut("concepts").select("cid", "gen")
                .as[(Long, Long)].collect()
              val cutE = cut("edges").select("eid", "cid")
                .as[(Long, Long)].collect()
              assert(cutE.map(_._2).toSet == cutC.map(_._1).toSet,
                s"TORN CUT: edge cids ${cutE.map(_._2).toSet} != " +
                  s"concept cids ${cutC.map(_._1).toSet}")
              cutC.filter(_._1 > 0L).foreach { case (cid2, g) =>
                val eids = cutE.filter(_._2 == cid2).map(_._1).toSet
                val want = if (g >= 100L) Set(cid2 * 10)
                  else Set(cid2 * 10, cid2 * 10 + 1)
                assert(eids == want, s"TORN TRIM at cid=$cid2: gen=$g " +
                  s"but edges=$eids — the mixed tx's halves split across the cut")
              }
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"writer failed: $f")
    }
    // end state: survivors exactly, on both tables, edge set derived —
    // trimmed survivors lost exactly edge cid*10+1 AND carry gen+100
    // (the mixed tx's two halves land together or not at all)
    val survivors = (0 until writers)
      .flatMap(w => ingested(w) -- retired(w)).toSet + 0L
    val trimmedAll = (0 until writers).flatMap(w => trimmed(w)).toSet
    val cids = store.read("concepts").select("cid", "gen")
      .as[(Long, Long)].collect()
    assert(cids.length == cids.map(_._1).toSet.size)
    assert(cids.map(_._1).toSet == survivors,
      s"lost=${survivors -- cids.map(_._1).toSet} " +
        s"phantom=${cids.map(_._1).toSet -- survivors}")
    val owner = (0 until writers).flatMap(w =>
      ingested(w).map(_ -> w.toLong)).toMap
    cids.filter(_._1 > 0L).foreach { case (c, g) =>
      val want = owner(c) + (if (trimmedAll.contains(c)) 100L else 0L)
      assert(g == want, s"cid=$c gen=$g want=$want — the trim tx's " +
        "update half diverged from its delete half")
    }
    val edgeCids = store.read("edges").select("cid").as[Long].collect().toSet
    assert(edgeCids == survivors,
      s"dangling=${edgeCids -- survivors} orphanedConcepts=${survivors -- edgeCids}")
    val eids = store.read("edges").select("eid").as[Long].collect()
    assert(eids.length == eids.toSet.size, "no edge may appear twice")
    assert(eids.toSet == survivors.flatMap(c =>
      if (c == 0L) Set(0L)
      else if (trimmedAll.contains(c)) Set(c * 10)
      else Set(c * 10, c * 10 + 1)))
  }

  test("adoptFieldIds races appends and DDL: no lost rows, no cross-wired columns") {
    // The r15 upgrade path under genuine scheduling: a legacy (ID-less)
    // table being appended to and column-DDL'd by two writers while a
    // third fires the adoption rewrite. Invariants: every append survives
    // exactly once with its own value (a cross-wired ID would swap
    // values), adoption lands exactly once with DISTINCT ids, renames
    // resolve (legacy renames rewrite, post-adoption renames restamp),
    // and reads never throw mid-race.
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz-adopt").toString
    val store = new SnapshotStore(spark, root)
    store.append("t", Seq((0L, 0L)).toDF("k", "v"))
    // strip the minted IDs from every pinned schema: the pre-r15 store
    locally {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(root, "t")
      val s0 = java.nio.file.Files.list(dir)
      try s0.iterator().asScala
        .filter(_.getFileName.toString.startsWith("v=")).foreach { vd =>
          val f = vd.resolve("_snapshot_schema.json")
          if (java.nio.file.Files.exists(f)) {
            val sch = org.apache.spark.sql.types.DataType.fromJson(
              java.nio.file.Files.readString(f))
              .asInstanceOf[org.apache.spark.sql.types.StructType]
            java.nio.file.Files.writeString(f,
              org.apache.spark.sql.types.StructType(sch.fields.map(x =>
                x.copy(metadata = org.apache.spark.sql.types.Metadata.empty))).json)
          }
        }
      finally s0.close()
    }
    SnapshotStore.dropCachesForTests()
    assert(!SnapshotStore.schemaHasFieldIds(store.snapshotSchema("t")),
      "precondition: the fixture is legacy")

    val writers = 3
    val opsPerWriter = 7
    val appended = Array.fill(writers)(
      scala.collection.mutable.Set.empty[Long])
    val renamed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            val rnd = new Random(8200L + w)
            var nextKey = (w + 1) * 1000000L
            var myCol: Option[String] = None
            (1 to opsPerWriter).foreach { i =>
              rnd.nextInt(4) match {
                case 0 | 1 => // append own keys — races the O(table)
                  // adoption rewrite's CAS
                  val ks = (0 until 1 + rnd.nextInt(2)).map { _ =>
                    nextKey += 1; nextKey }
                  st.append("t", ks.map(k => (k, k * 2)).toDF("k", "v"))
                  appended(w).synchronized { appended(w) ++= ks }
                case 2 => // the adoption — every writer may fire it;
                  // exactly-once semantics come from the ID'd no-op
                  if (i >= 3) st.adoptFieldIds("t", maxRetries = 50)
                case 3 => // column DDL across the adoption boundary:
                  // add once, rename it on a later turn (legacy rename
                  // rewrites; post-adoption rename restamps by ID —
                  // either path must keep values intact)
                  myCol match {
                    case None =>
                      val name = s"w${w}_c"
                      st.addColumns("t", org.apache.spark.sql.types.StructType(
                        Seq(org.apache.spark.sql.types.StructField(name,
                          org.apache.spark.sql.types.LongType))))
                      myCol = Some(name)
                      renamed.add(name)
                    case Some(c) =>
                      val to = s"${c}_r$i"
                      st.renameColumns("t", Map(c -> to))
                      renamed.remove(c); renamed.add(to)
                      myCol = Some(to)
                  }
              }
              assert(st.read("t").count() >= 1L) // reads never throw
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"writer failed: $f")
    }
    store.adoptFieldIds("t", maxRetries = 50) // quiesced: must land or no-op
    val schema = store.snapshotSchema("t")
    assert(SnapshotStore.schemaHasFieldIds(schema), "adoption must stick")
    val ids = schema.fields.toSeq
      .filter(_.metadata.contains(SnapshotStore.FieldIdKey))
      .map(_.metadata.getLong(SnapshotStore.FieldIdKey))
    assert(ids.size == schema.length && ids.distinct.size == ids.size,
      s"every column exactly one distinct id: $ids")
    // row + value conservation across the adoption rewrite
    val expected = (0 until writers).flatMap(w => appended(w)).toSet + 0L
    val rows = store.read("t").select("k", "v").as[(Long, Long)].collect()
    assert(rows.map(_._1).toSet == expected,
      s"lost=${expected -- rows.map(_._1).toSet}")
    rows.filter(_._1 > 0).foreach { case (k, v) =>
      assert(v == k * 2, s"cross-wired value: k=$k v=$v") }
    // every surviving rename resolves, exactly once
    val cols = store.read("t").columns.toSeq
    assert(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    renamed.forEach(c => assert(cols.contains(c), s"lost column $c"))
  }

  test("vacuum races feed readers: refusals are loud, folds never gap") {
    // The r16 horizon-before-delete ordering plus the bootstrap, under
    // free-running schedules: a writer appends one unique key per
    // version and periodically compacts + vacuums (horizon climbs);
    // readers fold changesSince increments, and on a horizon refusal
    // catch up through changeFeedBootstrap. Invariant: a reader's folded
    // key set is EXACTLY the table's final keys — a silently gapped
    // stream (the pre-r16 delete-then-mark window) loses keys forever
    // and fails the reconciliation; transient read errors from files
    // reclaimed mid-scan are LOUD and just retried.
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz-vac").toString
    val store = new SnapshotStore(spark, root)
    store.append("t", Seq(0L).toDF("k"))
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = 2
    val folded = Array.fill(readers)(
      scala.collection.mutable.Set.empty[Long])
    val pool = java.util.concurrent.Executors.newFixedThreadPool(readers + 1)
    try {
      val writer = pool.submit(new Runnable {
        def run(): Unit = try {
          val st = new SnapshotStore(spark, root)
          (1 to 12).foreach { i =>
            st.append("t", Seq(i.toLong).toDF("k"))
            if (i % 4 == 0) {
              st.compact("t", maxRetries = 50)
              st.vacuum("t", keepLast = 1)
            }
          }
        } catch { case t: Throwable => failures.add(t) }
        finally done.set(true)
      })
      val rtasks = (0 until readers).map { r =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            var lastSeen = 0L
            def catchUp(): Unit =
              try {
                val batch = st.changesSince("t", lastSeen)
                  .select(col("k"), col("_version")).as[(Long, Long)].collect()
                folded(r).synchronized { folded(r) ++= batch.map(_._1) }
                if (batch.nonEmpty)
                  lastSeen = math.max(lastSeen, batch.map(_._2).max)
              } catch {
                case e: Exception
                    if Option(e.getMessage).exists(_.contains("vacuumed")) =>
                  // LOUD horizon refusal → the bootstrap remedy: refold
                  // from the oldest retained snapshot + deltas
                  val boot = st.changeFeedBootstrap("t")
                    .where(col("_change_type") === "insert")
                    .select(col("k"), col("_version")).as[(Long, Long)].collect()
                  folded(r).synchronized {
                    folded(r).clear(); folded(r) ++= boot.map(_._1) }
                  lastSeen = boot.map(_._2).max
                case _: Exception => () // reclaimed mid-scan: retry later
              }
            while (!done.get()) catchUp()
            catchUp() // quiesced final catch-up must land everything
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      (rtasks :+ writer).foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"participant failed: $f")
    }
    val finalKeys = store.read("t").select("k").as[Long].collect().toSet
    assert(finalKeys == (0L to 12L).toSet)
    (0 until readers).foreach { r =>
      assert(folded(r) == finalKeys,
        s"reader $r gapped: missing=${finalKeys -- folded(r)} " +
          s"phantom=${folded(r) -- finalKeys}")
    }
  }

  test("cascades with maxRetries=0 survive hot appenders: the rebase liveness claim") {
    import scala.jdk.CollectionConverters._
    // LIVENESS under free-running schedules: two appenders ingest
    // (concept + edges) transactions as fast as they can while a third
    // thread retires concepts via deleteAll with a ZERO retry budget —
    // under the old discard-and-re-prepare posture a single mid-prepare
    // append threw; the pure-append rebase must absorb every such
    // conflict. Correctness rides along: a retired concept's edges are
    // gone INCLUDING any the rebase had to discover in appended deltas.
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz3").toString
    val store = new SnapshotStore(spark, root)
    store.commit("concepts", Seq((0L, 0L)).toDF("cid", "gen"))
    store.commit("edges", Seq((0L, 0L)).toDF("eid", "cid"))
    val appenders = 2
    val ingests = 8
    val ingested = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val retired = scala.collection.mutable.Set.empty[Long]
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(appenders + 1)
    try {
      val atasks = (0 until appenders).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            var cid = (w + 1) * 1000000L
            (1 to ingests).foreach { _ =>
              cid += 1
              st.appendAll(Map(
                "concepts" -> Seq((cid, w.toLong)).toDF("cid", "gen"),
                "edges" -> Seq((cid * 10, cid), (cid * 10 + 1, cid))
                  .toDF("eid", "cid")))
              ingested.add(cid)
            }
          } catch { case t: Throwable => failures.add(t) }
          finally { done.incrementAndGet(); () }
        })
      }
      val deleter = pool.submit(new Runnable {
        def run(): Unit = try {
          val st = new SnapshotStore(spark, root)
          val rnd = new Random(7300L)
          while (done.get() < appenders || {
              val live = ingested.asScala.toSet -- retired; live.nonEmpty }) {
            val live = (ingested.asScala.toSet -- retired).toSeq.sorted
            if (live.isEmpty) Thread.sleep(20L)
            else {
              val cid = live(rnd.nextInt(live.size))
              // maxRetries = 0: ANY append-conflict fallback to the
              // discard path throws — only the rebase can save this
              st.deleteAll(Map(
                "concepts" -> (col("cid") === cid),
                "edges" -> (col("cid") === cid)), maxRetries = 0)
              retired += cid
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
      (atasks :+ deleter).foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"participant failed: $f")
    }
    // every ingested concept was retired; nothing dangles anywhere
    assert(retired == ingested.asScala.toSet)
    assert(store.read("concepts").select("cid").as[Long].collect().toSet
      == Set(0L))
    assert(store.read("edges").select("eid").as[Long].collect().toSet
      == Set(0L))
  }

  test("racing store-backed ingesters: every batch lands whole, nothing dangles") {
    // The realistic write pattern end-to-end: two ingest pipelines (full
    // chunk→extract→match→commit) race on ONE store root with DISJOINT
    // document streams. Each batch reads its matcher state at a
    // snapshotAll cut and commits four deltas at one appendAll intent —
    // relink-on-stale serializes the racers. Invariants: every doc's
    // concepts exist at the end, every edge endpoint resolves, one epoch
    // record per committed batch, and a MID-RACE readAll cut never shows
    // an edge without its concept.
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz4").toString
    val store = new SnapshotStore(spark, root)
    val writers = 2
    val batchesPerWriter = 3
    // disjoint vocabularies (all words length >=5 — MockExtractor's
    // concept-token floor) so the racers never contend on match-or-create
    // semantics, only on the commit protocol (cross-writer matching is
    // IngestSpec's subject, sequentially)
    val words = Array(
      Array("amber", "basalt", "cirrus", "delta", "ember", "flint"),
      Array("granite", "harbor", "indigo", "jasper", "kelpbed", "lumen"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            (1 to batchesPerWriter).foreach { b =>
              val text = (0 until 30).map(i => words(w)(i % 6)).mkString(" ")
              val docs = Seq((s"w${w}b$b", text)).toDF("doc_id", "text")
              graft.ingest.IngestPipeline.ingestBatchToStore(spark, st, docs,
                batchEpoch = w * 100L + b)
              committed.incrementAndGet()
            }
          } catch { case t: Throwable => failures.add(t) }
          finally { done.incrementAndGet(); () }
        })
      }
      val probe = pool.submit(new Runnable {
        def run(): Unit = try {
          val st = new SnapshotStore(spark, root)
          while (done.get() < writers) {
            if (st.latestVersion("concepts").isDefined &&
                st.latestVersion("edges").isDefined) {
              val cut = st.readAll(Seq("concepts", "edges"))
              val ids = cut("concepts").select("concept_id")
                .as[String].collect().toSet
              cut("edges").select("src", "dst").as[(String, String)]
                .collect().foreach { case (a, b2) =>
                  assert(ids.contains(a) && ids.contains(b2),
                    s"TORN INGEST at cut: edge $a->$b2 without its concept")
                }
            }
            Thread.sleep(50L)
          }
        } catch { case t: Throwable => failures.add(t) }
      })
      (tasks :+ probe).foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"participant failed: $f")
    }
    assert(committed.get() == writers * batchesPerWriter)
    assert(store.read("epoch_log").count() == writers * batchesPerWriter)
    val cids = store.read("concepts").select("concept_id").as[String].collect()
    assert(cids.length == cids.toSet.size, "no duplicate concepts")
    val ids = cids.toSet
    store.read("edges").select("src", "dst").as[(String, String)].collect()
      .foreach { case (a, b) => assert(ids.contains(a) && ids.contains(b)) }
    // both writers' vocabularies are present
    val labels = store.read("concepts").select("label").as[String].collect().toSet
    assert(words(0).toSet.subsetOf(labels) && words(1).toSet.subsetOf(labels))
  }

  test("SERIALIZED ingesters with OVERLAPPING vocabularies: no duplicate concepts, all complete") {
    // The write-skew hole the plain atomic ingest documents away
    // (single-ingester-per-content-domain): two racers matching the same
    // cut can both miss a concept and both create it. The serialized
    // mode validates the match's READ SET at commit — a lost validation
    // re-reads and re-MATCHES, so the second racer sees the winner's
    // concept and matches instead of creating. Invariants: both
    // ingesters complete every batch, every label resolves to EXACTLY
    // one concept, edges dangle nowhere.
    serializedIngestFuzz(java.nio.file.Files
      .createTempDirectory("graft-cfuzz-ser").toString)
  }

  test("SERIALIZED ingesters over the CONDITIONAL-PUT head: the two r18 protocols compose") {
    // Same race, run with the object-store head backend: read-set
    // validation (serialized ingest) over put-if-match pointer swaps
    // (HeadStore). Since r19 the multi-table intent protocol takes NO
    // file locks here — its mutual exclusion is the TTL'd publish
    // LEASE in the head backend itself, so this fuzz exercises the
    // full object-store protocol end to end. Same invariants.
    val prior = SnapshotStore.headStoreFactory
    SnapshotStore.headStoreFactory = () => new graft.core.MockObjectHeadStore
    try serializedIngestFuzz(java.nio.file.Files
      .createTempDirectory("graft-cfuzz-sercp").toString)
    finally SnapshotStore.headStoreFactory = prior
  }

  private def serializedIngestFuzz(root0: String): Unit = {
    val root = root0
    val store = new SnapshotStore(spark, root)
    val writers = 2
    val batchesPerWriter = 3
    // ONE shared vocabulary: maximal match-or-create contention
    val words = Array("amber", "basalt", "cirrus", "delta", "ember", "flint")
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            (1 to batchesPerWriter).foreach { b =>
              // same words, writer-specific rotation: every batch touches
              // the whole shared vocabulary
              val text = (0 until 30).map(i => words((i + w) % 6)).mkString(" ")
              val docs = Seq((s"w${w}b$b", text)).toDF("doc_id", "text")
              graft.ingest.IngestPipeline.ingestBatchToStoreSerialized(
                spark, st, docs, batchEpoch = w * 100L + b)
              committed.incrementAndGet()
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"serialized ingester failed: $f")
    }
    assert(committed.get() == writers * batchesPerWriter, "both complete")
    // THE invariant: one concept per label — the duplicate the
    // unserialized mode admits under overlap must not exist
    val labels = store.read("concepts").select("label").as[String].collect()
    assert(labels.length == labels.toSet.size,
      s"duplicate concepts created under overlap: ${labels.sorted.toSeq}")
    assert(words.toSet.subsetOf(labels.toSet), "the shared vocabulary landed")
    val cids = store.read("concepts").select("concept_id").as[String].collect()
    assert(cids.length == cids.toSet.size)
    val ids = cids.toSet
    store.read("edges").select("src", "dst").as[(String, String)].collect()
      .foreach { case (a, b) => assert(ids.contains(a) && ids.contains(b)) }
    assert(store.read("epoch_log").count() == writers * batchesPerWriter)
  }

  test("racing view refreshers: exactly one wins per horizon, fold exact") {
    // The r17 enforcement (VERDICT r16 #6): the single-maintainer
    // contract is now the store's OCC, not convention. N threads all
    // call MaterializedView.refresh on ONE view while a writer appends
    // deltas; losers of the head CAS throw ConcurrentMaintainerException
    // LOUDLY (never commit a stale fold) and just re-run. Invariants:
    //   - per view version, exactly one refresher committed it (the CAS
    //     can't admit same-horizon twins, so versions strictly ascend
    //     with strictly ascending horizons);
    //   - the final fold equals the recompute from the final snapshot
    //     (no double-fold, no lost delta, whatever the schedule).
    import graft.core.MaterializedView
    val root = java.nio.file.Files.createTempDirectory("graft-cfuzz-view").toString
    val store = new SnapshotStore(spark, root)
    store.append("src", Seq((0L, 1.0)).toDF("g", "x"))
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val lostRaces = new java.util.concurrent.atomic.AtomicInteger(0)
    val refreshers = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(refreshers + 1)
    try {
      val writer = pool.submit(new Runnable {
        def run(): Unit = try {
          val st = new SnapshotStore(spark, root)
          (1 to 10).foreach { i =>
            st.append("src", Seq((i.toLong % 3, i.toDouble)).toDF("g", "x"))
            Thread.sleep(30L)
          }
        } catch { case t: Throwable => failures.add(t) }
        finally done.set(true)
      })
      val tasks = (0 until refreshers).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            def once(): Unit =
              try { MaterializedView.refresh(st, "src", "v", "g", "x"); () }
              catch {
                case _: MaterializedView.ConcurrentMaintainerException =>
                  lostRaces.incrementAndGet(); () // loud, loser re-runs
              }
            while (!done.get()) once()
            once() // quiesced: fold everything committed
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      (tasks :+ writer).foreach(_.get())
    } finally pool.shutdown()
    if (!failures.isEmpty) {
      val f = failures.peek(); f.printStackTrace()
      fail(s"participant failed: $f")
    }
    // horizons strictly ascend across committed view versions — the CAS
    // admits no same-horizon twin and no out-of-order landing
    val horizons = store.history("v").map(v =>
      store.commitProps("v", v)(MaterializedView.HorizonProp).toLong)
    assert(horizons == horizons.sorted && horizons.distinct == horizons,
      s"view horizons must strictly ascend: $horizons")
    // final fold exact vs recompute from the final snapshot
    val got = MaterializedView.read(store, "v")
      .select(col("g"), col("n"), col("total").cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (g, n, t) => g -> ((n, t)) }.toMap
    val want = store.read("src").groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,4)")).cast("double").as("t"))
      .as[(Long, Long, Double)].collect()
      .map { case (g, n, t) => g -> ((n, t)) }.toMap
    assert(got == want, s"fold drifted: got=$got want=$want")
    // Free-running schedules may or may not collide (lostRaces is
    // incidental evidence, logged for the curious) — so pin the CAS
    // refusal DETERMINISTICALLY: a commit conditioned on a stale head
    // must return None, commit nothing, and leave the head unmoved.
    info(s"racing refreshers lost ${lostRaces.get()} CAS races")
    val head = store.latestVersion("v")
    assert(head.isDefined)
    val stale = head.map(_ - 1L)
    assert(store.commitIfHead("v", store.read("v"), stale,
      Map(MaterializedView.HorizonProp -> "999")).isEmpty,
      "a stale expected head must lose the CAS")
    assert(store.latestVersion("v") == head,
      "a lost CAS must leave the head unmoved")
    assert(store.commitProps("v", head.get)
      .get(MaterializedView.HorizonProp).forall(_ != "999"),
      "the loser's horizon must never land")
  }

  test("conditional-put head (object-store protocol): racing appends lose no commits") {
    // The POSIX deployment arbitrates the head swap with a file lock +
    // atomic rename; S3-class stores have neither. MockObjectHeadStore
    // is the put-if-match reference: casAdvance runs LOCK-FREE, both
    // racers stamp their candidate, the conditional put picks one
    // winner, the loser unstamps and rebases through the store's own
    // retry machinery. Invariants: every append that returned is in the
    // final snapshot exactly once (zero lost commits), history strictly
    // ascends and stays fully readable, and no sentinel-less orphan
    // reads as committed.
    val prior = SnapshotStore.headStoreFactory
    SnapshotStore.headStoreFactory = () => new graft.core.MockObjectHeadStore
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-cput").toString
      val store = new SnapshotStore(spark, root)
      store.commit("t", Seq((0L, 0L)).toDF("k", "v"))
      val writers = 4
      val opsPerWriter = 6
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      try {
        val tasks = (0 until writers).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit =
              try {
                val st = new SnapshotStore(spark, root) // own instance, shared head
                (1 to opsPerWriter).foreach { i =>
                  val k = (w + 1) * 1000L + i
                  st.append("t", Seq((k, k * 2)).toDF("k", "v"))
                }
              } catch { case t: Throwable => failures.add(t) }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      if (!failures.isEmpty) {
        val f = failures.peek(); f.printStackTrace()
        fail(s"writer failed under the conditional-put head: $f")
      }
      // zero lost commits: every returned append is present exactly once
      val rows = store.read("t").as[(Long, Long)].collect().toSeq
      val expected = (for {
        w <- 0 until writers; i <- 1 to opsPerWriter
      } yield ((w + 1) * 1000L + i, ((w + 1) * 1000L + i) * 2)) :+ ((0L, 0L))
      assert(rows.sorted == expected.sorted,
        s"lost/duplicated commits: got ${rows.length} rows, expected ${expected.length}")
      // history ascends strictly, every version readable, head = max
      val hist = store.history("t")
      assert(hist == hist.sorted && hist.distinct == hist)
      assert(store.latestVersion("t").contains(hist.last))
      hist.foreach(v => store.readAt("t", v).count())
      // the head count equals the committed chain: 1 seed + 24 appends
      assert(hist.length == 1 + writers * opsPerWriter,
        s"every append must land as exactly one committed version: $hist")
    } finally SnapshotStore.headStoreFactory = prior
  }

  test("conditional-put head: lock-free CAS appenders RACING multi-table cascades — zero lost commits, zero torn cascades") {
    // The r18 ADVICE race, closed by the r19 publish lease: under a
    // conditional HeadStore the multi-table commit paths used to rely on
    // POSIX file locks that a lock-free casAdvance never takes — a
    // single-table append could land its put between a transaction's
    // head validation and its forwardPointer, after which the txn either
    // no-op'd (its own reported-committed candidate orphaned) or CAS'd
    // over the racer (the racer's returned-true commit orphaned). Now
    // every put is arbitrated against the per-table publish LEASE inside
    // the backend's one-item conditional write, with NO file lock and NO
    // JVM root monitor on this path — the in-process race below is the
    // same protocol a multi-process object-store deployment runs.
    // Invariants:
    //   - every single-table append that returned is in the final
    //     snapshot exactly once (zero lost commits, either side);
    //   - every appendAll cascade's keys are in BOTH tables (atomic);
    //   - consistent cuts taken mid-race never observe half a cascade.
    val prior = SnapshotStore.headStoreFactory
    SnapshotStore.headStoreFactory = () => new graft.core.MockObjectHeadStore
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-cput-txn").toString
      val store = new SnapshotStore(spark, root)
      store.commit("a", Seq((0L, "seed")).toDF("k", "src"))
      store.commit("b", Seq((0L, "seed")).toDF("k", "src"))
      val singles = 2; val cascaders = 2; val ops = 5
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val done = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(singles + cascaders + 1)
      try {
        val singleTasks = (0 until singles).map { w =>
          pool.submit(new Runnable {
            def run(): Unit = try {
              val st = new SnapshotStore(spark, root)
              (1 to ops).foreach { i =>
                val k = (w + 1) * 1000L + i
                st.append("a", Seq((k, "single")).toDF("k", "src"))
              }
            } catch { case t: Throwable => failures.add(t) }
            finally { done.incrementAndGet(); () }
          })
        }
        val cascadeTasks = (0 until cascaders).map { c =>
          pool.submit(new Runnable {
            def run(): Unit = try {
              val st = new SnapshotStore(spark, root)
              (1 to ops).foreach { i =>
                val k = (c + 1) * 100000L + i
                st.appendAll(Map(
                  "a" -> Seq((k, "cascade")).toDF("k", "src"),
                  "b" -> Seq((k, "cascade")).toDF("k", "src")))
              }
            } catch { case t: Throwable => failures.add(t) }
            finally { done.incrementAndGet(); () }
          })
        }
        val probe = pool.submit(new Runnable {
          def run(): Unit = try {
            val st = new SnapshotStore(spark, root)
            while (done.get() < singles + cascaders) {
              val cut = st.readAll(Seq("a", "b"))
              val inA = cut("a").where($"src" === "cascade")
                .select("k").as[Long].collect().toSet
              val inB = cut("b").where($"src" === "cascade")
                .select("k").as[Long].collect().toSet
              assert(inA == inB,
                s"TORN CASCADE at a consistent cut: a=$inA b=$inB")
              Thread.sleep(40L)
            }
          } catch { case t: Throwable => failures.add(t) }
        })
        (singleTasks ++ cascadeTasks :+ probe).foreach(_.get())
      } finally pool.shutdown()
      if (!failures.isEmpty) {
        val f = failures.peek(); f.printStackTrace()
        fail(s"participant failed under the leased conditional head: $f")
      }
      val expectedSingles = (for {
        w <- 0 until singles; i <- 1 to ops
      } yield (w + 1) * 1000L + i).toSet
      val expectedCascades = (for {
        c <- 0 until cascaders; i <- 1 to ops
      } yield (c + 1) * 100000L + i).toSet
      val a = store.read("a").as[(Long, String)].collect().toSeq
      assert(a.length == a.toSet.size, "duplicated rows in a")
      assert(a.collect { case (k, "single") => k }.toSet == expectedSingles,
        "a single-table append that returned was lost")
      assert(a.collect { case (k, "cascade") => k }.toSet == expectedCascades,
        "a cascade's a-half was lost")
      val b = store.read("b").as[(Long, String)].collect().toSeq
      assert(b.collect { case (k, "cascade") => k }.toSet == expectedCascades,
        "a cascade's b-half was lost")
      // every committed version stays readable on both chains
      store.history("a").foreach(v => store.readAt("a", v).count())
      store.history("b").foreach(v => store.readAt("b", v).count())
    } finally SnapshotStore.headStoreFactory = prior
  }

  test("conditional-put head: dropTable clears the head entry — no ghost table") {
    // r18 ADVICE: the directory tree died but the pointer OBJECT
    // survived on conditional backends — latestVersion kept reporting a
    // version, createTable refused, reads crashed on missing dirs.
    val prior = SnapshotStore.headStoreFactory
    SnapshotStore.headStoreFactory = () => new graft.core.MockObjectHeadStore
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-cput-drop").toString
      val store = new SnapshotStore(spark, root)
      store.commit("ghost", Seq((1L, 2L)).toDF("k", "v"))
      assert(store.latestVersion("ghost").isDefined)
      assert(store.dropTable("ghost"))
      assert(store.latestVersion("ghost").isEmpty,
        "the head entry must die with the table")
      // the name is immediately reusable and reads see only the new life
      store.commit("ghost", Seq((9L, 9L)).toDF("k", "v"))
      assert(store.read("ghost").as[(Long, Long)].collect().toSeq == Seq((9L, 9L)))
    } finally SnapshotStore.headStoreFactory = prior
  }

  test("publish-lease semantics: live lease blocks foreign puts; TTL takeover fences the loser") {
    // Unit pin of the backend contract the cascade fuzz rides:
    //   1. while a live lease is held, an un-leased put FAILS with the
    //      head unmoved (the single-table committer backs off);
    //   2. the holder's own put (same owner) passes;
    //   3. an expired lease is broken by the next acquirer and the old
    //      holder is FENCED — its puts fail FOREVER on that key, so a
    //      paused holder resuming after takeover can never move the head.
    val hs = new graft.core.MockObjectHeadStore
    val root = "/mock-lease-root"
    try {
      assert(hs.tryLease(root, "t", "txn1", 60000L), "fresh lease grants")
      assert(!hs.compareAndPut(root, "t", None, 1L, None),
        "an un-leased put must fail while a live foreign lease is held")
      assert(hs.read(root, "t").isEmpty, "the refused put moved nothing")
      assert(!hs.tryLease(root, "t", "txn2", 60000L),
        "a live foreign lease must refuse acquisition")
      assert(hs.compareAndPut(root, "t", None, 1L, Some("txn1")),
        "the holder's own put passes")
      hs.unlease(root, "t", "txn1")
      val h1 = hs.read(root, "t")
      assert(hs.compareAndPut(root, "t", h1, 2L, None),
        "after release, un-leased puts flow again")
      // TTL takeover + fencing
      assert(hs.tryLease(root, "t", "slow", 1L))
      Thread.sleep(10L)
      assert(hs.tryLease(root, "t", "usurper", 60000L),
        "an expired lease is broken by the next acquirer")
      val h2 = hs.read(root, "t")
      assert(!hs.compareAndPut(root, "t", h2, 3L, Some("slow")),
        "the broken holder is fenced while the usurper holds")
      hs.unlease(root, "t", "usurper")
      assert(!hs.compareAndPut(root, "t", h2, 3L, Some("slow")),
        "fencing is PERMANENT — a resumed holder can never put again")
      assert(hs.compareAndPut(root, "t", h2, 3L, None),
        "un-leased committers are unaffected after release")
      // delete forgets everything, including fencing (a new table life)
      hs.delete(root, "t")
      assert(hs.read(root, "t").isEmpty)
    } finally graft.core.MockObjectHeadStore.clear(root)
  }

  test("conditional-put head: racing VIEW MAINTAINERS vs source appenders — every delta folds exactly once") {
    // The r19 maintained-view contract on the OBJECT-STORE protocol:
    // refreshers land deltas through appendBucketedIfHead (a lock-free
    // conditional append), source appenders advance the edges chain
    // concurrently, and the view must end EXACTLY equal to the
    // transform of the final source snapshot — no delta folded twice
    // (a blind relink would double-count), none dropped (a lost CAS
    // must re-derive, not give up), horizons strictly ascending.
    val prior = SnapshotStore.headStoreFactory
    SnapshotStore.headStoreFactory = () => new graft.core.MockObjectHeadStore
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-viewfuzz").toString
      val store = new SnapshotStore(spark, root)
      store.commit("edges", Seq(("s0", "d0")).toDF("src", "dst"))
      val appenders = 3
      val batches = 4
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(appenders + 2)
      try {
        val writerTasks = (0 until appenders).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit =
              try {
                val st = new SnapshotStore(spark, root)
                (1 to batches).foreach { i =>
                  st.append("edges",
                    Seq((s"s$w-$i", s"d$w-$i")).toDF("src", "dst"))
                  graft.graph.AdjacencyStore.refresh(st, "edges", "adj",
                    buckets = 4, maxRetries = 64)
                }
              } catch { case t: Throwable => failures.add(t) }
          })
        }
        val maintainerTasks = (0 until 2).map { _ =>
          pool.submit(new Runnable {
            override def run(): Unit =
              try {
                val st = new SnapshotStore(spark, root)
                (1 to batches).foreach { _ =>
                  graft.graph.AdjacencyStore.refresh(st, "edges", "adj",
                    buckets = 4, maxRetries = 64)
                }
              } catch { case t: Throwable => failures.add(t) }
          })
        }
        (writerTasks ++ maintainerTasks).foreach(_.get())
      } finally pool.shutdown()
      if (!failures.isEmpty) {
        val f = failures.peek(); f.printStackTrace()
        fail(s"maintainer/appender failed under the conditional head: $f")
      }
      // one final catch-up fold, then exact equality with the recompute
      graft.graph.AdjacencyStore.refresh(store, "edges", "adj", buckets = 4)
      val e = store.read("edges")
      val expected = e.select(col("src").as("node")).unionByName(
        e.select(col("dst").as("node")))
        .groupBy("node").count().as[(String, Long)].collect().toSet
      val got = store.read("adj").groupBy("node")
        .agg((sum("o") + sum("i")).as("count")).as[(String, Long)]
        .collect().toSet
      assert(got == expected,
        s"racing maintainers must fold every delta exactly once")
      // horizons strictly ascend along the view history
      val horizons = store.history("adj").map(v =>
        store.resolvedProps("adj", v).get(graft.graph.AdjacencyStore.HorizonProp)
          .map(_.toLong))
      assert(horizons.forall(_.isDefined))
      val hs = horizons.flatten
      assert(hs == hs.sorted && hs.distinct == hs,
        s"view horizons must strictly ascend: $hs")
    } finally SnapshotStore.headStoreFactory = prior
  }
}
