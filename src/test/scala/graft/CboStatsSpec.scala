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

  test("equi-height histograms: skewed-equality estimates become bin counts; append drops, compact restores") {
    val r = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val st = new SnapshotStore(spark, r)
    // 90% of rows carry c = 0; the rest are distinct — the shape where
    // the 1/ndv uniform guess is off by three orders of magnitude
    st.commit("skew", spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("c"),
        col("id").as("payload")))
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
      // an append makes the chain multi-link: the histogram is withheld
      // (it doesn't union losslessly) and the estimate falls back to
      // the uniform 1/ndv guess
      st.append("skew", spark.range(1)
        .select(lit(7L).as("c"), lit(99999L).as("payload")))
      val without = estimate()
      assert(without.exists(_ < BigInt(2000)),
        s"without a histogram the uniform guess is ~rows/ndv: $without")
      // compact collapses to one data link: histogram restored
      st.compact("skew")
      val restored = estimate()
      assert(restored.exists(_ >= BigInt(10000)),
        s"compact re-observes and restores the histogram: $restored")
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
