package graft

import org.apache.spark.sql.functions._
import graft.core.SnapshotStore
import graft.sources.GraftCatalog

/** Column-level statistics to Spark's CBO: the store's `_ndv.json` HLL
  * sketches (written by the commit's own write job via Observation) and
  * `_stats.json` bounds surface through the scan's
  * `Statistics.columnStats()`, giving the optimizer per-column
  * NDV/min/max/nullCount — enough for JoinEstimation to size equi-joins
  * and CostBasedJoinReorder to reorder a multi-table store join. */
class CboStatsSpec extends SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-cbo").toString
    val st = new SnapshotStore(spark, r)
    // big: 100k rows, unique k, wide payload
    st.commit("big", spark.range(0, 100000)
      .select(col("id").as("k"), (col("id") % 1000).as("j"),
        lpad(col("id").cast("string"), 64, "x").as("payload")))
    // mid: 5k rows keyed into big, j spread over 1000 values
    st.commit("mid", spark.range(0, 5000)
      .select((col("id") * 20).as("k"), (col("id") % 1000).as("j")))
    // small: 5 rows on 5 j values — the selective side
    st.commit("small", spark.range(0, 5)
      .select(col("id").as("j"), (col("id") * 7).as("w")))
    spark.conf.set("spark.sql.catalog.cbo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbo.root", r)
    r
  }

  test("chain NDV sketches: union across appends, exact-ish estimates") {
    val r = java.nio.file.Files.createTempDirectory("graft-ndv").toString
    val st = new SnapshotStore(spark, r)
    st.commit("t", spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") % 10).as("c")))
    // append overlaps half the key domain: true NDV = 1500, sum = 2000
    st.append("t", spark.range(500, 1500)
      .select(col("id").as("k"), (col("id") % 10).as("c")))
    val ndv = st.chainNdv("t", st.latestVersion("t").get)
    assert(ndv.contains("k") && ndv.contains("c"), s"ndv=$ndv")
    val k = ndv("k")
    assert(k > 1350 && k < 1650,
      s"chain NDV must be the UNION estimate (~1500, never the 2000 sum): $k")
    assert(ndv("c") >= 9 && ndv("c") <= 11, s"c has 10 distinct: ${ndv("c")}")
  }

  test("scan reports column stats: ndv + min/max + nullCount reach the logical plan") {
    root
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.table("cbo.big")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(100000)))
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("k"), s"attributeStats=$byName")
      val kStat = byName("k")
      assert(kStat.distinctCount.exists(d =>
        d > BigInt(95000) && d < BigInt(105000)),
        s"k NDV ~100k: ${kStat.distinctCount}")
      assert(kStat.min.contains(0L) && kStat.max.contains(99999L),
        s"k bounds: ${kStat.min}..${kStat.max}")
      assert(kStat.nullCount.contains(BigInt(0)))
    }
  }

  test("3-table store join REORDERS under CBO with stats, not without") {
    root
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    // leaf tables in join-tree order (left-deep: innermost first)
    def leafOrder(p: LogicalPlan): Seq[String] = p.collect {
      case r: DataSourceV2ScanRelation => r.relation.table.name()
    }.map(_.replaceAll("@v\\d+$", "").stripPrefix("graft:"))
    val q =
      """SELECT b.payload, s.w
        |FROM cbo.big b
        |JOIN cbo.mid m ON b.k = m.k
        |JOIN cbo.small s ON m.j = s.j""".stripMargin
    val plain = withSQLConf("spark.sql.cbo.enabled" -> "false") {
      leafOrder(spark.sql(q).queryExecution.optimizedPlan)
    }
    assert(plain == Seq("big", "mid", "small"),
      s"as-written order without CBO: $plain")
    val reordered = withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val d = spark.sql(q)
      val order = leafOrder(d.queryExecution.optimizedPlan)
      // values must be identical to the unreordered plan
      val rows = d.collect().map(_.toSeq).sortBy(_.toString)
      val base = withSQLConf("spark.sql.cbo.enabled" -> "false") {
        spark.sql(q).collect().map(_.toSeq).sortBy(_.toString)
      }
      assert(rows.toSeq == base.toSeq, "reorder changed the answer")
      order
    }
    assert(reordered != plain,
      s"CBO with column stats must reorder the join (mid⋈small is 25 rows, " +
        s"big⋈mid is 5000): still $reordered")
  }

  test("chain NDV follows renames: pre-rename sketches count under the new name") {
    // Pre-rename links' _ndv.json sidecars key the OLD column name; the
    // chain union must resolve them through the same logical→physical
    // maps the zone-map pruner uses, or a renamed column's NDV counts
    // only post-rename links (understated NDV → overstated selectivity).
    val r = java.nio.file.Files.createTempDirectory("graft-ndv-ren").toString
    val st = new SnapshotStore(spark, r)
    st.commit("t", spark.range(0, 1000)
      .select(col("id").as("a"), (col("id") % 7).as("c")))
    st.renameColumns("t", Map("a" -> "b"))
    st.append("t", spark.range(1000, 1010)
      .select(col("id").as("b"), (col("id") % 7).as("c")))
    val ndv = st.chainNdv("t", st.latestVersion("t").get)
    assert(ndv.get("b").exists(n => n > 900 && n < 1100),
      s"b's NDV must union the pre-rename link's 1000 keys: $ndv")
  }

  test("equi-height histograms: skewed-equality estimates become bin counts and SURVIVE append chains") {
    val r = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val st = new SnapshotStore(spark, r)
    // 90% of rows carry c = 0; the rest are distinct — the shape where
    // the 1/ndv uniform guess is off by three orders of magnitude
    def skewed(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("c"),
        col("id").as("payload"))
    st.commit("skew", skewed(0, 20000))
    spark.conf.set("spark.sql.catalog.hist", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.hist.root", r)
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      def estimate(): Option[BigInt] = {
        val q = spark.table("hist.skew").where(col("c") === 0L)
        q.queryExecution.optimizedPlan.stats.rowCount
      }
      val withHist = estimate()
      assert(withHist.exists(_ >= BigInt(10000)),
        s"histogram must estimate the hot key near its true 18000 rows: $withHist")
      // r19: appends no longer drop the histogram — each link's sidecar
      // carries its non-null row weight, and the chain reports the
      // weighted-CDF merge of the links' boundaries. Build a 5-link
      // chain (the r18 gap: the append-heavy steady state fell back to
      // 1/ndv exactly when tables were hottest) with NO compact.
      (1 to 4).foreach { i =>
        st.append("skew", skewed(20000L * i, 20000L * (i + 1)))
      }
      val merged = estimate()
      assert(merged.exists(_ >= BigInt(50000)),
        s"the 5-link merged histogram must keep the hot key near its true " +
          s"90000 rows, not fall back to 1/ndv: $merged")
      // compact still works and stays bin-resolution
      st.compact("skew")
      val restored = estimate()
      assert(restored.exists(_ >= BigInt(50000)),
        s"compact re-observes a single exact histogram: $restored")
    }
  }

  test("merged histograms keep POINT MASSES: the weighted-CDF inversion lands hot values on singleton bins") {
    import graft.core.NdvStats
    // two links, both dominated by the value 5.0 (a point bin in each):
    // the merge must keep 5.0 as repeated boundaries (singleton bins →
    // FilterEstimation bin-NDV 1), not smear it across a span
    val a = Array.fill(33)(5.0); a(0) = 0.0; a(32) = 100.0 // ~94% mass at 5
    val b = Array.fill(33)(5.0); b(0) = -10.0; b(32) = 50.0
    val merged = NdvStats.mergeEquiHeight(Seq((a, 10000L), (b, 30000L)), 32)
    assert(merged.isDefined)
    val m = merged.get
    assert(m.length == 33)
    assert(m.head == -10.0 && m.last == 100.0, s"range is the union: ${m.toSeq}")
    assert(m.count(_ == 5.0) >= 28,
      s"~94% of union mass sits AT 5.0 — most boundaries must equal it: ${m.toSeq}")
    assert(m.toSeq == m.toSeq.sorted, "boundaries ascend")
    // and a uniform+uniform merge stays roughly uniform over the union
    val u1 = (0 to 32).map(i => i * 1.0).toArray        // U[0, 32]
    val u2 = (0 to 32).map(i => 32.0 + i * 1.0).toArray // U[32, 64]
    val mu = NdvStats.mergeEquiHeight(Seq((u1, 5000L), (u2, 5000L)), 32).get
    assert(math.abs(mu(16) - 32.0) < 2.0,
      s"equal-weight disjoint uniforms: the median boundary is ~32: ${mu(16)}")
  }

  test("chain CMS: string frequencies union exactly across appends") {
    val r = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val st = new SnapshotStore(spark, r)
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(when(col("id") % 10 < 7, lit("supports"))
        .when(col("id") % 10 < 9, lit("contradicts"))
        .otherwise(concat(lit("rare_"), col("id"))).as("rel_type"),
        col("id").as("payload"))
    st.commit("edges", batch(0, 10000))
    st.append("edges", batch(10000, 20000))
    st.append("edges", batch(20000, 30000))
    val cms = st.chainCms("edges", st.latestVersion("edges").get)
    assert(cms.contains("rel_type"), s"string column sketched: ${cms.keySet}")
    val s = cms("rel_type")
    assert(s.totalCount() == 30000L, s"chain total: ${s.totalCount()}")
    val hot = s.estimateCount("supports".getBytes("UTF-8"))
    // CMS over-counts by ≤ eps·n one-sided: true 21000, eps 0.5% of 30k
    assert(hot >= 21000L && hot <= 21600L,
      s"hot value frequency ~21000 across the chain: $hot")
    val absent = s.estimateCount("never_seen".getBytes("UTF-8"))
    assert(absent <= 300L, s"absent value estimates ~0 (+eps·n): $absent")
  }

  test("CMS join sizing picks the right build side for hot AND absent string filters") {
    graft.GraftExtensions.register(spark)
    val r = java.nio.file.Files.createTempDirectory("graft-cms-join").toString
    val st = new SnapshotStore(spark, r)
    // 95% of edges are 'supports'; ndv(rel_type) ≈ 1000 — the uniform
    // guess says a rel_type filter keeps ~0.1% when the hot value keeps
    // 95% and an absent value keeps 0%: both directions wrong
    st.commit("edgesj", spark.range(0, 40000)
      .select(when(col("id") % 20 =!= 0, lit("supports"))
        .otherwise(concat(lit("rare_"), col("id") % 2000)).as("rel_type"),
        (col("id") % 100).as("jk"),
        lpad(col("id").cast("string"), 48, "x").as("payload")))
    st.commit("dimj", spark.range(0, 100)
      .select(col("id").as("jk"), (col("id") * 2).as("mv")))
    spark.conf.set("spark.sql.catalog.cj", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cj.root", r)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(all)
    }
    def broadcastCols(q: org.apache.spark.sql.DataFrame): Set[String] = {
      q.collect()
      all(q.queryExecution.executedPlan).collectFirst {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.output.map(_.name).toSet
      }.getOrElse(Set.empty)
    }
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin,
      BROADCAST, NO_BROADCAST_HASH}
    def factHint(q: org.apache.spark.sql.DataFrame) =
      q.queryExecution.optimizedPlan.collectFirst {
        case j: LJoin => j.hint.leftHint
      }.flatten.flatMap(_.strategy)
    // HOT value: naive rows/ndv ≈ 400 rows × 56 B ≈ 22 KB (≤ threshold)
    // looks broadcastable; CMS says 38000 rows ≈ 2.1 MB ≫ 4×threshold →
    // the rule pins NO_BROADCAST_HASH on the fact; dim broadcasts.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "65536") {
      val hot = spark.table("cj.edgesj").where(col("rel_type") === "supports")
        .join(spark.table("cj.dimj"), "jk")
      assert(factHint(hot).contains(NO_BROADCAST_HASH),
        s"the rule must pin NO_BROADCAST_HASH on the hot-filtered fact: " +
          s"${factHint(hot)}\n${hot.queryExecution.optimizedPlan}")
      val cols = broadcastCols(hot)
      assert(cols.contains("mv") && !cols.contains("payload"),
        s"CMS says the hot-filtered fact is BIG — dim must broadcast: $cols")
    }
    // ABSENT value: naive ≈ 22 KB over a 2 KB threshold refuses
    // broadcast; CMS says ~0 rows → the rule pins BROADCAST on the
    // filtered fact.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "2048") {
      val cold = spark.table("cj.edgesj").where(col("rel_type") === "nosuch")
        .join(spark.table("cj.dimj"), "jk")
      assert(factHint(cold).contains(BROADCAST),
        s"the rule must pin BROADCAST on the absent-value fact: ${factHint(cold)}")
      // executed: the hinted broadcast never degrades to a sort-merge
      // join (AQE may go further and propagate the empty build side into
      // an empty relation — also shuffle-free, also correct)
      cold.collect()
      val smj = all(cold.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
      assert(!smj,
        s"an absent-value probe must never pay a sort-merge join:\n" +
          s"${cold.queryExecution.executedPlan}")
      assert(cold.count() == 0L)
    }
  }

  test("histograms pick the RIGHT broadcast side of a skew-filtered join") {
    val r = java.nio.file.Files.createTempDirectory("graft-hist-join").toString
    val st = new SnapshotStore(spark, r)
    st.commit("skewj", spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("c"),
        (col("id") % 100).as("jk"), col("id").as("payload")))
    st.commit("mid", spark.range(0, 100)
      .select(col("id").as("jk"), (col("id") * 2).as("mv")))
    spark.conf.set("spark.sql.catalog.hj", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.hj.root", r)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(all)
    }
    // with the histogram, the filtered skew side estimates ~18000 rows —
    // far over a tight broadcast threshold — so the planner must
    // broadcast MID, never the filtered fact
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536") {
      val q = spark.table("hj.skewj").where(col("c") === 0L)
        .join(spark.table("hj.mid"), "jk")
      q.collect()
      val bcast = all(q.queryExecution.executedPlan).collectFirst {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(bcast.nonEmpty, "tight threshold still broadcasts the true small side")
      val bcastCols = bcast.get.output.map(_.name).toSet
      assert(bcastCols.contains("mv") && !bcastCols.contains("payload"),
        s"histogram says the filtered fact is BIG — mid must broadcast, got $bcastCols")
    }
  }

  test("NDV observation is best-effort under case-colliding column names") {
    // caseSensitive frames can carry "K" and "k" as distinct columns;
    // their observe metric names collide after Locale.ROOT lowercasing —
    // a duplicate alias would fail the observe ANALYSIS and with it the
    // whole commit. The dedup keeps the first; the commit must succeed.
    withSQLConf("spark.sql.caseSensitive" -> "true") {
      val df = spark.range(0, 100).selectExpr(
        "id AS K", "id % 3 AS k", "id * 2 AS v")
      val (observed, harvest) = graft.core.NdvStats.observed(df)
      val names = harvest.map(_._2).getOrElse(Nil)
      assert(names == names.distinct, s"metric names must be unique: $names")
      assert(names.count(_ == "k") == 1)
      observed.collect() // the observe node analyzes and runs
      // and the full commit path stays green on such a frame
      val r = java.nio.file.Files.createTempDirectory("graft-ndv-case").toString
      val st = new SnapshotStore(spark, r)
      st.commit("cc", df)
      assert(st.read("cc").count() == 100)
    }
  }
}
