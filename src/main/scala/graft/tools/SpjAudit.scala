package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore
import graft.sources.Tables

/** Measures what the storage-partitioned join is WORTH at a given scale
  * factor: the same orders⋈lineitem join + aggregate, co-bucketed through
  * the SQL catalog with `spark.sql.sources.v2.bucketing.enabled` ON
  * (zero-exchange plan) vs OFF (both sides shuffle). Identical bytes,
  * identical snapshots — the only variable is whether the scan's
  * KeyGroupedPartitioning claim is honored, so the delta isolates exactly
  * the two join exchanges (plus AQE's post-shuffle stages) that SPJ
  * deletes. Locally the shuffle is loopback-cheap, so the honest
  * scale-relevant column is `exchanges_{on,off}` (the plan contrast) and
  * the shuffle bytes; on a 1000-executor cluster those exchanges are the
  * fact⋈fact join's dominant network cost. Timings min-of-3, interleaved.
  * Prints one JSON line.
  */
object SpjAudit {

  private def finalPlan(df: DataFrame): String = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_SPJ_BUCKETS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"${System.getProperty("java.io.tmpdir")}/graft_spj_" +
      Tables.fingerprint(sfDir, "orders") + s"_b$buckets"
    val store = new SnapshotStore(spark, root)
    if (store.latestVersion("orders_b").isEmpty) {
      store.commitBucketed("orders_b", Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        "o_orderkey", buckets)
      store.commitBucketed("lineitem_b", Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "l_orderkey", buckets)
    }
    spark.conf.set("spark.sql.catalog.spjaudit",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjaudit.root", root)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val sql =
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM spjaudit.orders_b JOIN spjaudit.lineitem_b
        |  ON o_orderkey = l_orderkey
        |WHERE o_orderstatus <> 'X'""".stripMargin

    def run(bucketing: Boolean): DataFrame = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        bucketing.toString)
      spark.sql(sql)
    }

    // plan contrast (and a correctness pin: identical results both ways)
    val onDf = run(true); val onRow = onDf.collect().head
    val onPlan = finalPlan(onDf)
    val offDf = run(false); val offRow = offDf.collect().head
    val offPlan = finalPlan(offDf)
    require(onRow == offRow,
      s"SPJ changed the answer: $onRow vs $offRow — layout corrupt")
    val exOn = "Exchange".r.findAllIn(onPlan).size
    val exOff = "Exchange".r.findAllIn(offPlan).size

    // interleaved min-of-3 wall clock
    val ons = scala.collection.mutable.ArrayBuffer[Double]()
    val offs = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime(); run(true).collect()
      ons += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); run(false).collect()
      offs += (System.nanoTime() - t1) / 1e9
    }

    // The r15 claim: the zero-exchange plan SURVIVES a sparse DV delete
    // (a vector subtracts rows within files, never across buckets). A
    // fresh co-bucketed pair under its own root takes one sparse delete
    // on the fact side, then the same contrast: exchanges must stay at
    // exchanges_on and the values must match the shuffled plan exactly.
    val dvRoot = s"${System.getProperty("java.io.tmpdir")}/graft_spjdv_" +
      Tables.fingerprint(sfDir, "orders") + s"_b$buckets"
    val dvStore = new SnapshotStore(spark, dvRoot)
    if (dvStore.latestVersion("orders_b").isEmpty) {
      dvStore.commitBucketed("orders_b", Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        "o_orderkey", buckets)
      dvStore.commitBucketed("lineitem_b", Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "l_orderkey", buckets)
      dvStore.delete("orders_b", col("o_orderkey") % 100000L === 7L)
    }
    val dvLive = dvStore.dvInChain("orders_b",
      dvStore.latestVersion("orders_b").get).valuesIterator.map(_.size).sum
    spark.conf.set("spark.sql.catalog.spjdv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjdv.root", dvRoot)
    val dvSql = sql.replace("spjaudit.", "spjdv.")
    def runDv(bucketing: Boolean): DataFrame = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        bucketing.toString)
      spark.sql(dvSql)
    }
    val dvOnDf = runDv(true); val dvOnRow = dvOnDf.collect().head
    val dvOnPlan = finalPlan(dvOnDf)
    val dvOffRow = runDv(false).collect().head
    require(dvOnRow == dvOffRow,
      s"DV'd SPJ changed the answer: $dvOnRow vs $dvOffRow")
    val dvExOn = "Exchange".r.findAllIn(dvOnPlan).size
    val dvOns = scala.collection.mutable.ArrayBuffer[Double]()
    val dvOffs = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime(); runDv(true).collect()
      dvOns += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); runDv(false).collect()
      dvOffs += (System.nanoTime() - t1) / 1e9
    }

    println(org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(List(
        "sf" -> org.json4s.JString(sfDir),
        "buckets" -> org.json4s.JInt(buckets),
        "rows_joined" -> org.json4s.JLong(onRow.getLong(0)),
        "spj_sec" -> org.json4s.JDouble(ons.min),
        "shuffled_sec" -> org.json4s.JDouble(offs.min),
        "speedup" -> org.json4s.JDouble(offs.min / ons.min),
        "exchanges_on" -> org.json4s.JInt(exOn),
        "exchanges_off" -> org.json4s.JInt(exOff),
        "dv_rows" -> org.json4s.JLong(dvLive),
        "dv_rows_joined" -> org.json4s.JLong(dvOnRow.getLong(0)),
        "dv_spj_sec" -> org.json4s.JDouble(dvOns.min),
        "dv_shuffled_sec" -> org.json4s.JDouble(dvOffs.min),
        "dv_exchanges_on" -> org.json4s.JInt(dvExOn))))))
    spark.stop()
  }
}
