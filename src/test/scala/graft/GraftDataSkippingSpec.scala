package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{FileStats, SnapshotStore}

/** Manifest data skipping (`_stats.json` zone maps) through the graft
  * connector's FileIndex: files that provably cannot match the pushed
  * predicates are dropped before listing/footer I/O; everything else about
  * the scan is Spark's parquet path. Correctness contract: pruning NEVER
  * changes results — every case cross-checks rows against an unprunable
  * recompute. */
class GraftDataSkippingSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("skipspec").toString

  private def graftRead(root: String, table: String): DataFrame =
    spark.read.format("graft").option("root", root).option("table", table).load()

  test("clustered appends: point and range predicates skip whole files") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    // Three chain links with disjoint id ranges; clusterBy keeps each
    // file's [min, max] tight inside its link.
    store.commitClustered("t",
      spark.range(0, 300).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(300, 600).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(600, 900).select(col("id"), (col("id") % 5).as("grp")),
      clusterBy = Seq("id"))

    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    assert(total >= 3, "each chain link contributes at least one file")

    val point = base.filter(col("id") === 450)
    assert(scannedFiles(point).size < total, "point lookup prunes files")
    assert(point.count() === 1)

    val range = base.filter(col("id") >= 600)
    assert(scannedFiles(range).size < total, "range predicate prunes files")
    assert(range.count() === 300)

    val nothing = base.filter(col("id") > 10000)
    assert(scannedFiles(nothing).isEmpty, "impossible predicate prunes ALL files")
    assert(nothing.count() === 0)

    val in = base.filter(col("id").isin(10L, 20L))
    assert(in.count() === 2)
    assert(scannedFiles(in).size < total, "IN list prunes to covering files")
  }

  test("pruning survives a metadata RENAME: stats resolve under the physical name") {
    // Pre-rename chain files' zone maps are keyed by the OLD column name.
    // The scan's per-version logical→physical map (physicalNamesByVersion
    // → GraftFileIndex) must (a) keep PRUNING those files on predicates
    // over the new name, and (b) never infer absent-means-null from the
    // new name's absence — the r15 bug class where a renamed column
    // PRUNED files that matched.
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t",
      spark.range(0, 300).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("v"))
    store.appendClustered("t",
      spark.range(300, 600).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("v"))
    store.renameColumns("t", Map("v" -> "weight")) // data-less link
    store.appendClustered("t", // post-rename link: stats under NEW name
      spark.range(600, 900).select(col("id"), (col("id") * 2).as("weight")),
      clusterBy = Seq("weight"))
    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    assert(total >= 3)
    // predicate over the NEW name hitting only a PRE-rename range: the
    // old files' stats (keyed "v") must prune, and the matching file scan
    val low = base.filter(col("weight") < 100)
    assert(scannedFiles(low).size < total,
      "pre-rename zone maps must keep pruning under the renamed column")
    assert(low.count() === 50)
    // a post-rename-only range: pre-rename files all pruned away
    val high = base.filter(col("weight") >= 1200)
    assert(high.count() === 300)
    assert(scannedFiles(high).size < total)
    // impossible predicate prunes EVERYTHING across both name eras
    val none = base.filter(col("weight") > 100000)
    assert(scannedFiles(none).isEmpty)
    assert(none.count() === 0)
    // and a mid-range spanning the rename reads exactly
    assert(base.filter(col("weight") >= 590 && col("weight") <= 610)
      .count() === 11)
  }

  test("pruning never changes results vs the manifest-less read") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t",
      spark.range(0, 500).select(col("id"),
        concat(lit("doc-"), format_string("%04d", col("id"))).as("name")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(500, 1000).select(col("id"),
        concat(lit("doc-"), format_string("%04d", col("id"))).as("name")),
      clusterBy = Seq("id"))

    val preds = Seq(
      col("id") === 750L, col("id") < 100L, col("id") >= 990L,
      col("name") === "doc-0042", col("name").startsWith("doc-09"),
      col("name") < "doc-0100", col("id").isNull, col("id").isNotNull)
    val pruned = preds.map(p => graftRead(root, "t").filter(p).count())

    // Destroy the manifests: same store, now unprunable.
    for (v <- new SnapshotStore(spark, root).history("t"))
      Files.deleteIfExists(Paths.get(root, "t", s"v=$v", FileStats.StatsFileName))
    graft.core.SnapshotStore.dropCachesForTests()
    val flat = preds.map(p => graftRead(root, "t").filter(p).count())
    assert(pruned === flat, "zone-map pruning must be invisible in results")
  }

  test("schema evolution: predicate on a later-added column prunes old chain files") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commit("t", spark.range(0, 100).select(col("id")))
    store.append("t",
      spark.range(100, 200).select(col("id"), lit("fresh").as("tag")))

    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    // Old files lack `tag` entirely → read as NULL → `tag = 'fresh'`
    // cannot match them; the manifest's leaf-set check prunes them.
    val tagged = base.filter(col("tag") === "fresh")
    assert(scannedFiles(tagged).size < total)
    assert(tagged.count() === 100)
    // And IsNull must NOT prune them.
    assert(base.filter(col("tag").isNull).count() === 100)
  }

  test("SQL catalog face prunes too (same GraftTable under kg.*)") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("evs",
      spark.range(0, 400).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("id"))
    store.appendClustered("evs",
      spark.range(400, 800).select(col("id"), (col("id") * 2).as("v")),
      clusterBy = Seq("id"))
    spark.conf.set("spark.sql.catalog.kgskip",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.kgskip.root", root)

    val all = spark.sql("SELECT * FROM kgskip.evs")
    val hit = spark.sql("SELECT * FROM kgskip.evs WHERE id = 600")
    assert(scannedFiles(hit).size < scannedFiles(all).size)
    assert(hit.count() === 1)
  }

  test("timestamp zone maps prune through the micros domain") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    // Two links with disjoint time ranges.
    store.commitClustered("t",
      spark.range(0, 100).select(col("id"),
        to_timestamp(lit("2026-01-05 00:00:00")).as("ts")), Seq("ts"))
    store.appendClustered("t",
      spark.range(100, 200).select(col("id"),
        to_timestamp(lit("2026-03-05 00:00:00")).as("ts")), Seq("ts"))
    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    val feb = base.filter(col("ts") > lit("2026-02-01").cast("timestamp"))
    assert(scannedFiles(feb).size < total)
    assert(feb.count() === 100)
  }

  test("manifest JSON round-trips exactly") {
    import FileStats._
    val fs = Map(
      "part-0.parquet" -> FileStat(42L, 1234L, 99L,
        Map(
          "id" -> ColStats(Some(LongVal(-3)), Some(LongVal(900)), Some(0L)),
          "score" -> ColStats(Some(DoubleVal(0.25)), Some(DoubleVal(Double.PositiveInfinity)), Some(2L)),
          "name" -> ColStats(Some(StringVal("a")), Some(StringVal("zz")), None),
          "flag" -> ColStats(Some(BoolVal(false)), Some(BoolVal(true)), Some(41L)),
          "allnull" -> ColStats(None, None, Some(42L))),
        Set("id", "score", "name", "flag", "allnull")),
      "part-1.parquet" -> FileStat(0L, 10L, 98L, Map.empty, Set.empty))
    assert(FileStats.fromJson(FileStats.toJson(fs)) === fs)
  }

  test("Z-ordered commit prunes on BOTH cluster columns; lexical only on the first") {
    // A 100×100 grid: x and y are independent uniform dimensions — the
    // adversarial case for lexical clustering, where every file spans y's
    // whole domain.
    def grid = spark.range(0, 10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"),
      col("id").as("payload"))

    val lexRoot = tmpRoot()
    val lex = new SnapshotStore(spark, lexRoot)
    lex.commitClustered("g", grid, clusterBy = Seq("x", "y"), targetPartitions = 16)
    val zRoot = tmpRoot()
    val zed = new SnapshotStore(spark, zRoot)
    zed.commitZOrdered("g", grid, zorderBy = Seq("x", "y"), targetPartitions = 16)

    val lexAll = scannedFiles(graftRead(lexRoot, "g")).size
    val zAll = scannedFiles(graftRead(zRoot, "g")).size
    // Range-partitioner sampling may merge a boundary; near-16 is enough.
    assert(lexAll >= 12 && zAll >= 12)

    val px = col("x") === 42L
    val py = col("y") === 87L
    // Lexical: x (leading) prunes, y (trailing) cannot.
    assert(scannedFiles(graftRead(lexRoot, "g").filter(px)).size < lexAll)
    assert(scannedFiles(graftRead(lexRoot, "g").filter(py)).size === lexAll,
      "lexical clustering must NOT prune on the trailing column (the gap z-order closes)")
    // Z-order: BOTH columns prune, each to well under half the files.
    val zx = scannedFiles(graftRead(zRoot, "g").filter(px)).size
    val zy = scannedFiles(graftRead(zRoot, "g").filter(py)).size
    assert(zx <= zAll / 2, s"x predicate scanned $zx of $zAll z-ordered files")
    assert(zy <= zAll / 2, s"y predicate scanned $zy of $zAll z-ordered files")
    // And pruning is invisible in results.
    assert(graftRead(zRoot, "g").filter(px).count() === 100)
    assert(graftRead(zRoot, "g").filter(py).count() === 100)
    assert(graftRead(zRoot, "g").filter(px && py).count() === 1)

    // Two-predicate queries compose: the conjunction scans no more files
    // than either single-column predicate alone.
    val zxy = scannedFiles(graftRead(zRoot, "g").filter(px && py)).size
    assert(zxy <= math.min(zx, zy))
  }

  test("compaction regenerates the manifest and pruning survives it (+ vacuum)") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t",
      spark.range(0, 300).select(col("id"), (col("id") % 7).as("w")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(300, 600).select(col("id"), (col("id") % 7).as("w")),
      clusterBy = Seq("id"))
    store.appendClustered("t",
      spark.range(600, 900).select(col("id"), (col("id") % 7).as("w")),
      clusterBy = Seq("id"))

    val cv = store.compact("t", targetPartitions = 6, clusterBy = Seq("id"))
    // The rewritten (self-contained) version has its own fresh manifest …
    assert(Files.exists(Paths.get(root, "t", s"v=$cv", FileStats.StatsFileName)),
      "compact must regenerate _stats.json for the rewritten version")
    assert(store.fileStats("t", cv).exists(_.nonEmpty))
    // … and pruning still works on the compacted layout.
    val base = graftRead(root, "t")
    val total = scannedFiles(base).size
    assert(total > 1, "compacted rewrite keeps multiple prunable files")
    val hit = base.filter(col("id") === 450)
    assert(scannedFiles(hit).size < total, "point lookup prunes post-compact")
    assert(hit.count() === 1)

    // Vacuum away the superseded chain: pruning (and results) unaffected.
    store.vacuum("t", keepLast = 1)
    assert(store.history("t") === Seq(cv))
    val hit2 = graftRead(root, "t").filter(col("id") === 450)
    assert(scannedFiles(hit2).size < total)
    assert(hit2.count() === 1)
    assert(graftRead(root, "t").count() === 900)
  }

  test("delete parity through the connector: read-after-delete equals the rewrite") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t",
      spark.range(0, 600).select(col("id"), (col("id") % 7).as("w")),
      clusterBy = Seq("id"), targetPartitions = 6)
    val preDelete = store.latestVersion("t").get

    // the oracle: a full filtered REWRITE into a sibling table
    store.commit("oracle", store.read("t").filter(!col("id").between(200, 299)))
    val dv = store.delete("t", col("id").between(200, 299))

    // store face and connector face both equal the rewrite
    val viaStore = store.read("t")
    val viaConnector = graftRead(root, "t")
    val oracle = graftRead(root, "oracle")
    assert(viaStore.exceptAll(oracle).isEmpty && oracle.exceptAll(viaStore).isEmpty)
    assert(viaConnector.exceptAll(oracle).isEmpty &&
      oracle.exceptAll(viaConnector).isEmpty)

    // tombstoned files never reach the scan, and zone-map pruning still
    // works on the survivors
    val total = scannedFiles(viaConnector).size
    val removed = store.removedAt("t", dv)
    assert(removed.nonEmpty)
    val removedNames = removed.map(_.split('/').last).toSet
    assert(scannedFiles(viaConnector).forall(f =>
      !removedNames.contains(f.split('/').last)),
      "tombstoned files excluded from the file index")
    val hit = viaConnector.filter(col("id") === 450)
    assert(scannedFiles(hit).size < total, "pruning survives tombstones")
    assert(hit.count() === 1)

    // connector time travel to the pre-delete version still sees all rows
    val tt = spark.read.format("graft").option("root", root)
      .option("table", "t").option("version", preDelete.toString).load()
    assert(tt.count() === 600)
  }

  test("mixed-domain manifest bounds disable pruning, never prune (corrupt-manifest parity)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import FileStats._
    // A corrupt-but-parseable manifest: `id` is a LONG column but its bound
    // landed as a STRING. compare()'s old mixed-domain "equal" would make
    // strict < / > prove non-overlap and DROP the file; the contract is the
    // same as a corrupt manifest — keep it.
    val fs = FileStat(100L, 1000L, 0L,
      Map("id" -> ColStats(Some(StringVal("oops")), Some(StringVal("oops")), Some(0L))),
      Set("id"))
    val id = AttributeReference("id", LongType)()
    for (pred <- Seq[Expression](
        LessThan(id, Literal(5L)), GreaterThan(id, Literal(5L)),
        EqualTo(id, Literal(5L)), LessThanOrEqual(id, Literal(5L)),
        GreaterThanOrEqual(id, Literal(5L))))
      assert(graft.sources.DataSkipping.mayMatch(pred, fs),
        s"mixed-domain bound must keep the file for $pred")
    // Sanity: a genuine same-domain miss still prunes.
    val good = FileStat(100L, 1000L, 0L,
      Map("id" -> ColStats(Some(LongVal(10)), Some(LongVal(20)), Some(0L))),
      Set("id"))
    assert(!graft.sources.DataSkipping.mayMatch(LessThan(id, Literal(5L)), good))
  }

  test("a missing manifest is not cached for versions above the pointer") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t", spark.range(0, 100).toDF("id"), Seq("id"))
    // Simulate the cross-process commit window: v=2 has data + _SUCCESS but
    // its (best-effort, post-_SUCCESS) stats write hasn't landed and the
    // pointer hasn't moved. A reader probing stats now must not memoize
    // "no manifest" forever.
    val v1 = Paths.get(root, "t", "v=1")
    val v2 = Paths.get(root, "t", "v=2")
    Files.createDirectories(v2)
    val w = Files.walk(v1)
    try w.iterator().asScala.filter(Files.isRegularFile(_)).foreach { p =>
      Files.copy(p, v2.resolve(v1.relativize(p).toString))
    } finally w.close()
    Files.deleteIfExists(v2.resolve(FileStats.StatsFileName))
    graft.core.SnapshotStore.dropCachesForTests()

    assert(store.fileStats("t", 2L).isEmpty, "no manifest yet")
    // The stats write lands (still before any pointer move) …
    FileStats.writeStatsFile(spark.sparkContext.hadoopConfiguration, v2)
    // … and the same JVM must now see it — the old behavior returned the
    // memoized None here and lost pruning for v=2 permanently.
    assert(store.fileStats("t", 2L).exists(_.nonEmpty),
      "late-landing manifest must become visible (None not cached above pointer)")
    // At/below the pointer a missing manifest IS final and may cache.
    Files.deleteIfExists(v1.resolve(FileStats.StatsFileName))
    graft.core.SnapshotStore.dropCachesForTests()
    assert(store.fileStats("t", 1L).isEmpty)
  }

  test("a corrupt manifest disables pruning but not reading") {
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    store.commitClustered("t", spark.range(0, 100).toDF("id"), Seq("id"))
    Files.writeString(Paths.get(root, "t", "v=1", FileStats.StatsFileName),
      "{ not json ]")
    graft.core.SnapshotStore.dropCachesForTests()
    val df = graftRead(root, "t").filter(col("id") === 5)
    assert(df.count() === 1)
  }

  test("signed zeros: runtime join-key pruning never drops -0.0 rows for a 0.0 key") {
    // SQL joins compare doubles with -0.0 == 0.0 TRUE, and join keys are
    // never pushed into parquet row-group filters — so a fact file whose
    // bounds are [-0.0, -0.0] MUST survive a runtime IN(0.0) filter to
    // meet the join, or rows silently vanish vs the DPP-off plan.
    // FileStats.canonDouble canonicalizes every StatVal zero; this pins
    // the unit comparison and the end-to-end join.
    // (The STATIC-filter path is different and stock-Spark-dominated:
    // parquet's own row-group eq() uses Double.compare and drops -0.0
    // rows for a 0.0 literal even via plain spark.read.parquet — our
    // zone map agreeing with SQL there changes nothing observable.)
    import graft.core.FileStats
    import graft.sources.DataSkipping
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types.DoubleType
    // unit: an OLD manifest carrying the raw "-0.0" string canonicalizes
    // at parse, so the eq-vs-bounds check agrees with SQL equality
    val json = """{"files":{"f.parquet":{"rows":2,"bytes":10,"mtime":1,""" +
      """"leaves":["x"],"cols":{"x":{"min":{"d":"-0.0"},"max":{"d":"-0.0"},"nulls":0}}}}}"""
    val stats = FileStats.fromJson(json)
    val fs = stats("f.parquet")
    val x = AttributeReference("x", DoubleType)()
    assert(DataSkipping.mayMatch(EqualTo(x, Literal(0.0d)), fs),
      "-0.0 bounds overlap a +0.0 literal under SQL equality")
    assert(DataSkipping.mayMatchIn(fs, "x",
      DataSkipping.statValOf(0.0d, DoubleType).toArray),
      "runtime IN(0.0) must keep the -0.0 file")
    // end-to-end: runtime-filtered join equals the DPP-off join
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    import spark.implicits._
    store.commit("zf", (Seq((1L, -0.0d), (2L, -0.0d)) ++
      (10L to 2000L).map(i => (i, i.toDouble))).toDF("id", "x")
      .repartitionByRange(4, col("x")))
    store.commit("zd", Seq((0.0d, "zero")).toDF("dx", "tag"))
    val q = graftRead(root, "zf")
      .join(graftRead(root, "zd"), col("x") === col("dx"))
    val n = q.count()
    val off = withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      graftRead(root, "zf")
        .join(graftRead(root, "zd"), col("x") === col("dx")).count()
    }
    assert(n == off, s"runtime pruning changed the join: $n vs $off")
    assert(n == 2L, "-0.0 rows match the 0.0 dim key")
  }

  test("pruner soundness fuzz: mayMatch/mayMatchIn never prune a satisfiable file") {
    // The one-sided contract under seeded random workloads: for every
    // (random file, random predicate), if ANY row satisfies the predicate
    // under SQL semantics, the zone map must answer true. False positives
    // are allowed (pruning is best-effort); a single false NEGATIVE is
    // silent row loss. Covers the full predicate zoo — comparisons both
    // orientations, IN / runtime-IN, null checks, prefix — over longs,
    // doubles (signed zeros, extremes), and ASCII strings with nulls.
    import graft.sources.DataSkipping
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
      In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, StartsWith}
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val rnd = new scala.util.Random(4217)
    val root = tmpRoot()
    val store = new SnapshotStore(spark, root)
    val la = AttributeReference("l", LongType)()
    val da = AttributeReference("d", DoubleType)()
    val sa = AttributeReference("s", StringType)()

    def randLong(): java.lang.Long = rnd.nextInt(5) match {
      case 0 => null
      case 1 => Long.box(rnd.nextInt(10).toLong)
      case _ => Long.box(rnd.nextInt(2000).toLong - 1000L)
    }
    def randDouble(): java.lang.Double = rnd.nextInt(8) match {
      case 0 => null
      case 1 => Double.box(-0.0d)
      case 2 => Double.box(0.0d)
      case 3 => Double.box(rnd.nextInt(5).toDouble)
      case _ => Double.box((rnd.nextInt(2000) - 1000) / 7.0)
    }
    def randString(): String = rnd.nextInt(6) match {
      case 0 => null
      case 1 => ""
      case _ => (0 until (1 + rnd.nextInt(4)))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }

    (1 to 12).foreach { batch =>
      val rows = (1 to (1 + rnd.nextInt(40)))
        .map(_ => (randLong(), randDouble(), randString()))
      store.commit("fz", rows.toDF("l", "d", "s").repartition(1))
      val stats = store.fileStats("fz", store.latestVersion("fz").get).get
      assert(stats.size == 1, "one file per batch")
      val fs = stats.values.head

      // local SQL-semantics evaluation (null comparisons never satisfy;
      // -0.0 == 0.0 true via primitive comparison)
      def anyRow(p: ((java.lang.Long, java.lang.Double, String)) => Boolean) =
        rows.exists(p)
      def cmpL(v: Long, op: Int => Boolean) =
        anyRow { case (l, _, _) => l != null && op(java.lang.Long.compare(l, v)) }
      def cmpD(v: Double, op: Int => Boolean) =
        anyRow { case (_, d, _) => d != null &&
          op(if (d.doubleValue == v) 0 else if (d.doubleValue < v) -1 else 1) }
      def cmpS(v: String, op: Int => Boolean) =
        anyRow { case (_, _, x) => x != null && op(x.compareTo(v)) }

      def checkExpr(e: Expression, satisfiable: Boolean, what: String): Unit =
        if (satisfiable)
          assert(DataSkipping.mayMatch(e, fs),
            s"batch $batch: pruned a satisfiable file: $what ($e) rows=$rows")

      (1 to 60).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 =>
            val v = rnd.nextInt(2200) - 1100L
            checkExpr(EqualTo(la, Literal(v)), cmpL(v, _ == 0), s"l = $v")
          case 1 =>
            val v = rnd.nextInt(2200) - 1100L
            checkExpr(LessThan(la, Literal(v)), cmpL(v, _ < 0), s"l < $v")
            checkExpr(GreaterThanOrEqual(la, Literal(v)), cmpL(v, _ >= 0), s"l >= $v")
          case 2 =>
            val v = randDouble()
            if (v != null) {
              checkExpr(EqualTo(da, Literal(v.doubleValue)),
                cmpD(v.doubleValue, _ == 0), s"d = $v")
              checkExpr(LessThanOrEqual(Literal(v.doubleValue), da),
                cmpD(v.doubleValue, _ >= 0), s"$v <= d")
            }
          case 3 =>
            val v = randString()
            if (v != null) {
              checkExpr(EqualTo(sa, Literal(UTF8String.fromString(v), StringType)),
                cmpS(v, _ == 0), s"s = '$v'")
              checkExpr(GreaterThan(sa, Literal(UTF8String.fromString(v), StringType)),
                cmpS(v, _ > 0), s"s > '$v'")
            }
          case 4 =>
            checkExpr(IsNull(la), anyRow(_._1 == null), "l IS NULL")
            checkExpr(IsNotNull(da), anyRow(_._2 != null), "d IS NOT NULL")
          case 5 =>
            val pfx = randString()
            if (pfx != null)
              checkExpr(StartsWith(sa, Literal(UTF8String.fromString(pfx), StringType)),
                anyRow { case (_, _, x) => x != null && x.startsWith(pfx) },
                s"s LIKE '$pfx%'")
          case 6 =>
            val vs = (1 to 1 + rnd.nextInt(5)).map(_ => rnd.nextInt(2200) - 1100L)
            checkExpr(In(la, vs.map(Literal(_))),
              vs.exists(v => cmpL(v, _ == 0)), s"l IN $vs")
          case 7 => // runtime-IN twin over longs
            val vs = (1 to 1 + rnd.nextInt(6)).map(_ => rnd.nextInt(2200) - 1100L)
            val sat = vs.exists(v => cmpL(v, _ == 0))
            val sv = vs.flatMap(v => DataSkipping.statValOf(v, LongType))
              .sortWith(FileStats.compare(_, _) < 0).toArray
            if (sat) assert(DataSkipping.mayMatchIn(fs, "l", sv),
              s"batch $batch: runtime IN pruned a satisfiable file: $vs rows=$rows")
          case 8 => // runtime-IN over doubles (signed zeros in range)
            val vs = (1 to 1 + rnd.nextInt(4)).map(_ => randDouble())
              .filter(_ != null).map(_.doubleValue)
            if (vs.nonEmpty) {
              val sat = vs.exists(v => cmpD(v, _ == 0))
              val sv = vs.flatMap(v => DataSkipping.statValOf(v, DoubleType))
                .sortWith(FileStats.compare(_, _) < 0).toArray
              if (sat) assert(DataSkipping.mayMatchIn(fs, "d", sv),
                s"batch $batch: runtime IN pruned a satisfiable d-file: $vs rows=$rows")
            }
          case _ => // runtime-IN over strings
            val vs = (1 to 1 + rnd.nextInt(4)).map(_ => randString())
              .filter(_ != null)
            if (vs.nonEmpty) {
              val sat = vs.exists(v => cmpS(v, _ == 0))
              val sv = vs.flatMap(v =>
                DataSkipping.statValOf(UTF8String.fromString(v), StringType))
                .sortWith(FileStats.compare(_, _) < 0).toArray
              if (sat) assert(DataSkipping.mayMatchIn(fs, "s", sv),
                s"batch $batch: runtime IN pruned a satisfiable s-file: $vs rows=$rows")
            }
        }
      }
    }
  }
}
