package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.graftbridge.GraftRuntimeFiltering

import graft.core.SnapshotStore
import graft.sources.GraftCatalog

/** Connector-level RUNTIME filtering (SupportsRuntimeV2Filtering): a
  * selective dim-side predicate must prune snapshot-store FILES at
  * runtime through Spark's dynamic partition pruning — the optimizer
  * plants the DPP subquery, BatchScanExec feeds the broadcast build-side
  * keys into the graft scan, and the scan drops files (and, on bucketed
  * chains, whole buckets) whose zone maps prove no key can match. Values
  * must be EXACT vs the same join with DPP disabled. */
class RuntimeFilteringSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-rf").toString
    val st = new SnapshotStore(spark, r)
    // fact: 40k rows range-partitioned by k into 8 files with DISJOINT
    // key ranges — the layout a Z-ordered / sorted 100 TB fact chain has,
    // which makes per-file zone maps selective on the join key.
    st.commit("fact", spark.range(0, 40000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartitionByRange(8, col("k")))
    // dim: 200 rows; cat = which fact FILE its key falls in, so one
    // cat value concentrates all surviving keys into one file's range.
    st.commit("dim", spark.range(0, 200)
      .select((col("id") * 200).as("dk"),
        ((col("id") * 200) / 5000).cast("long").as("cat")))
    // bucketed twin of fact for bucket-id runtime pruning
    st.commitBucketed("bfact", spark.range(0, 40000)
      .select(col("id").as("k"), (col("id") % 97).as("v")), "k", 8)
    spark.conf.set("spark.sql.catalog.rf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rf.root", r)
    r
  }

  /** Execute and return every graft scan of the final adaptive plan —
    * descending through AQE query stages (LeafExecNodes that hide their
    * plan from collect) and subqueries. */
  private def graftScans(df: DataFrame): Seq[GraftRuntimeFiltering] = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }) ++ p.subqueries
      p +: kids.flatMap(all)
    }
    all(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftRuntimeFiltering] =>
        b.scan.asInstanceOf[GraftRuntimeFiltering]
    }
  }

  private val q =
    "SELECT f.k, f.v FROM rf.fact f JOIN rf.dim d ON f.k = d.dk WHERE d.cat = 3"

  test("dim-side filter prunes fact files at runtime; values exact") {
    root
    val expected = withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      spark.sql(q).collect().map(_.toSeq).sortBy(_.toString)
    }
    val df = spark.sql(q)
    val got = df.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == expected.toSeq, "runtime pruning changed the answer")
    assert(got.length == 25, "cat=3 covers dk 15000..19800 step 200")
    val reports = graftScans(df).flatMap(_.runtimeFilterReport)
    assert(reports.nonEmpty,
      "no graft scan received a runtime filter — DPP did not fire")
    val (total, kept) = reports.head
    assert(total == 8, s"fact chain has 8 manifest files, saw $total")
    assert(kept <= 2,
      s"cat=3 keys live in ONE file's range; zone maps kept $kept of $total")
  }

  test("bucketed chain prunes whole BUCKETS from runtime keys; claim intact") {
    root
    val qb = "SELECT f.k, f.v FROM rf.bfact f JOIN rf.dim d ON f.k = d.dk " +
      "WHERE d.dk IN (0, 200, 400)"
    val expected = withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      spark.sql(qb).collect().map(_.toSeq).sortBy(_.toString)
    }
    val df = spark.sql(qb)
    val got = df.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == expected.toSeq)
    assert(got.length == 3)
    val scans = graftScans(df)
    val buckets = scans.flatMap(_.runtimeBucketReport)
    assert(buckets.nonEmpty,
      "bucketed graft scan received no runtime bucket filter")
    assert(buckets.head.size <= 3,
      s"3 runtime keys can hit at most 3 of 8 buckets, got ${buckets.head}")
  }

  test("NON-UNIFORM composite layout prunes per DIGIT from runtime keys") {
    // (16, 4) dims: a runtime IN on the SUB-key column constrains only
    // its own mixed-radix digit — at most |values| of the 4 sub-buckets
    // survive, each crossed with all 16 leading buckets. The leading
    // column's digit is untouched (nothing provable about it), so the
    // report shows ≤ 16·|values| of 64 — per-digit, never over-pruned.
    val r2 = java.nio.file.Files.createTempDirectory("graft-rf-nu").toString
    val st = new SnapshotStore(spark, r2)
    st.commitBucketed("nufact", spark.range(0, 40000)
      .select((col("id") % 2000).as("k1"),
        expr("id DIV 4000").as("k2"), (col("id") % 97).as("v")),
      Seq("k1", "k2"), Seq(16, 4), None)
    st.commit("nudim", spark.range(0, 10)
      .select(col("id").as("dk"), (col("id") % 3).as("cat")))
    spark.conf.set("spark.sql.catalog.rfnu", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rfnu.root", r2)
    val qd = "SELECT f.k1, f.v FROM rfnu.nufact f JOIN rfnu.nudim d " +
      "ON f.k2 = d.dk WHERE d.dk IN (0, 1)"
    val expected = withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      spark.sql(qd).collect().map(_.toSeq).sortBy(_.toString)
    }
    val df = spark.sql(qd)
    val got = df.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == expected.toSeq, "digit pruning changed the answer")
    val buckets = graftScans(df).flatMap(_.runtimeBucketReport)
    assert(buckets.nonEmpty,
      "composite graft scan received no runtime bucket filter")
    assert(buckets.head.size <= 32,
      s"2 sub-key values constrain digit 2 to ≤2 of 4 ids (≤32 of 64 " +
        s"buckets), got ${buckets.head.size}")
  }

  test("empty build side prunes everything; result empty and exact") {
    root
    val qe = "SELECT f.k FROM rf.fact f JOIN rf.dim d ON f.k = d.dk " +
      "WHERE d.cat = 999"
    assert(spark.sql(qe).collect().isEmpty)
  }

  test("runtime filter never over-prunes: full-key join unchanged") {
    root
    // every dim key survives the (non-)filter: pruning may keep all
    // files, must never drop a matching one
    val qf = "SELECT count(*) AS n, sum(f.v) AS sv FROM rf.fact f " +
      "JOIN rf.dim d ON f.k = d.dk"
    val withDpp = spark.sql(qf).head()
    val without = withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      spark.sql(qf).head()
    }
    assert(withDpp == without)
  }

  test("runtime RANGE predicates prune files against the zone maps, never over-prune") {
    // DPP sends IN lists today, but SupportsRuntimeV2Filtering's contract
    // admits arbitrary V2 predicates — a band-join build side arrives as
    // `lo <= col AND col < hi` conjuncts. Drive the scan's filter()
    // directly with the predicates BatchScanExec would pass.
    root
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.graftbridge.Bridge.{v2Literal => vlit}
    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Predicate => VPredicate}
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val st = new SnapshotStore(spark, root)
    val t = graft.sources.GraftTable.forSnapshot(spark, st, "fact", None)
    def freshScan() = t.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val scan = freshScan()
    val rf = scan.asInstanceOf[GraftRuntimeFiltering]
    // fact: 40k rows range-partitioned into 8 files with DISJOINT ~5k key
    // ranges; [10000, 15000) covers at most 2 files' ranges
    rf.filter(Array(new VAnd(
      new VPredicate(">=", Array(Expressions.column("k"),
        vlit(10000L, LongType))),
      new VPredicate("<", Array(Expressions.column("k"),
        vlit(15000L, LongType))))))
    val (total, kept) = rf.runtimeFilterReport.get
    assert(total == 8 && kept >= 1 && kept <= 2,
      s"band [10000, 15000) must keep 1-2 of 8 disjoint-range files: $kept/$total")
    // never over-prunes: the surviving files hold EVERY in-range row
    val survivors = scan.toBatch.planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
    }.distinct
    val inRange = spark.read.parquet(survivors: _*)
      .where(col("k") >= 10000L && col("k") < 15000L).count()
    assert(inRange == 5000L, s"surviving files must hold all 5000 in-range rows: $inRange")
    // a flipped literal-on-the-left bound parses too (lit > col = upper)
    val scan2 = freshScan()
    val rf2 = scan2.asInstanceOf[GraftRuntimeFiltering]
    rf2.filter(Array(new VPredicate(">", Array(
      vlit(4000L, LongType), Expressions.column("k")))))
    val (_, kept2) = rf2.runtimeFilterReport.get
    assert(kept2 == 1, s"k < 4000 keeps exactly the first file: $kept2")
    // a null bound proves nothing and prunes nothing (best-effort skip)
    val scan3 = freshScan()
    val rf3 = scan3.asInstanceOf[GraftRuntimeFiltering]
    rf3.filter(Array(new VPredicate(">=", Array(Expressions.column("k"),
      vlit(null, LongType)))))
    assert(rf3.runtimeFilterReport.isEmpty, "null bound must not prune")
  }

  test("CATALYST-PLANNED band join injects runtime range bounds; fact files prune; values exact") {
    // End-to-end: `fact.k >= dim.lo AND fact.k < dim.hi` plans a
    // BroadcastNestedLoopJoin; GraftBandJoinPruning (AQE stage-optimizer
    // rule, extension-built session) reads the MATERIALIZED broadcast's
    // rows, folds them to [min(lo), max(hi)), and delivers the two range
    // predicates to the graft scan through the same filter() entry point
    // DPP uses — no spec-fed predicates anywhere in this test.
    root
    import spark.implicits._
    val dim = Seq((10000L, 12000L), (12000L, 13500L), (14000L, 15000L))
      .toDF("lo", "hi")
    dim.createOrReplaceTempView("band_dim")
    val q = """SELECT f.k, f.v FROM rf.fact f JOIN band_dim d
              |ON f.k >= d.lo AND f.k < d.hi""".stripMargin
    val expected = withSQLConf(
      org.apache.spark.sql.graftbridge.GraftBandJoinPruning.EnabledKey -> "false") {
      val off = spark.sql(q)
      val scans = graftScans(off)
      assert(scans.nonEmpty && scans.forall(_.runtimeFilterReport.isEmpty),
        "disabled band pruning must deliver nothing")
      (off.count(), off.agg(sum("v")).head().getLong(0))
    }
    val on = spark.sql(q)
    val scans = graftScans(on) // collect()s, then walks the final plan
    assert(scans.nonEmpty, "the probe side must still be a graft scan")
    val (total, kept) = scans.head.runtimeFilterReport.getOrElse(
      fail("a Catalyst-planned band join must inject the runtime filter"))
    // [10000, 15000) spans at most 2 of the 8 disjoint ~5000-key files
    assert(total == 8 && kept <= 2,
      s"band bounds must prune the fact scan: kept $kept/$total")
    assert(on.count() == expected._1 && expected._1 > 0,
      "pruned band join loses no rows")
    assert(on.agg(sum("v")).head().getLong(0) == expected._2,
      "pruned band join values match the unpruned run")
  }

  test("SCATTERED windows prune per-window (OR-of-bands), not to the hull") {
    // Two narrow windows at opposite ends of the key domain: the hull
    // [2000, 34500) keeps ~7 of 8 files, the per-window disjunction the
    // rule ships for a small build side keeps only the file under each
    // window. This is the decisive interval-join case at 100 TB — a
    // year of scattered 1-day windows over a time-clustered fact must
    // not read the whole year.
    root
    import spark.implicits._
    Seq((2000L, 2500L), (34000L, 34500L)).toDF("lo", "hi")
      .createOrReplaceTempView("band_dim_scattered")
    val q = """SELECT f.k, f.v FROM rf.fact f JOIN band_dim_scattered d
              |ON f.k >= d.lo AND f.k < d.hi""".stripMargin
    val expected = withSQLConf(
      org.apache.spark.sql.graftbridge.GraftBandJoinPruning.EnabledKey -> "false") {
      val off = spark.sql(q)
      (off.count(), off.agg(sum("v")).head().getLong(0))
    }
    val on = spark.sql(q)
    val scans = graftScans(on)
    assert(scans.nonEmpty)
    val (total, kept) = scans.head.runtimeFilterReport.getOrElse(
      fail("scattered band join must inject the runtime filter"))
    assert(total == 8 && kept <= 2,
      s"per-window bands must beat the hull: kept $kept/$total (hull would keep 7)")
    assert(on.count() == expected._1 && expected._1 == 1000L,
      "per-window pruning loses no rows")
    assert(on.agg(sum("v")).head().getLong(0) == expected._2)
  }

  test("band pruning join-type guard: LEFT ANTI keeps every fact file") {
    // Anti join OUTPUTS exactly the probe rows with NO band match —
    // pruning 'can't-match' files would delete the answer. The rule must
    // refuse; values must equal the pruning-disabled run.
    root
    import spark.implicits._
    Seq((10000L, 15000L)).toDF("lo", "hi")
      .createOrReplaceTempView("band_dim_anti")
    val q = """SELECT f.k FROM rf.fact f LEFT ANTI JOIN band_dim_anti d
              |ON f.k >= d.lo AND f.k < d.hi""".stripMargin
    val on = spark.sql(q)
    val scans = graftScans(on)
    assert(scans.nonEmpty && scans.forall(_.runtimeFilterReport.isEmpty),
      "LEFT ANTI band join must not prune the probe side")
    val expected = withSQLConf(
      org.apache.spark.sql.graftbridge.GraftBandJoinPruning.EnabledKey -> "false") {
      spark.sql(q).count()
    }
    assert(on.count() == expected && expected == 35000L,
      "anti-join semantics intact under the rule")
  }

  test("bloom-style runtime predicates are counted-and-ignored, never mis-pruned") {
    // Spark's InjectRuntimeFilter can synthesize bloom MEMBERSHIP
    // predicates for large joins; membership of individual values proves
    // nothing about a file's [min, max] interval, so the scan's explicit
    // decision is ignore-and-count (sound: runtime filters are row-
    // superset reductions the join re-checks). Pinned so the ignoring
    // stays a decision, not an accident of the parser.
    root
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.graftbridge.Bridge.{v2Literal => vlit}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
    import org.apache.spark.sql.types.{BinaryType, LongType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val st = new SnapshotStore(spark, root)
    val t = graft.sources.GraftTable.forSnapshot(spark, st, "fact", None)
    val scan = t.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val rf = scan.asInstanceOf[GraftRuntimeFiltering]
    rf.filter(Array(
      new VPredicate("BLOOM_FILTER_MIGHT_CONTAIN",
        Array(vlit(Array[Byte](1, 2, 3), BinaryType),
          Expressions.column("k"))),
      new VPredicate(">=", Array(Expressions.column("k"),
        vlit(20000L, LongType)))))
    assert(rf.runtimeIgnoredPredicateCount == 1,
      "the bloom predicate is counted as recognized-and-ignored")
    val (total, kept) = rf.runtimeFilterReport.get
    assert(total == 8 && kept <= 4,
      s"the RANGE conjunct beside it still prunes: $kept/$total")
  }
}
