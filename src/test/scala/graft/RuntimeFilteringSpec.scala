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
}
