package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SnapshotStore
import graft.sources.Tables

/** Measures what the manifest data-skipping layer is WORTH at a given
  * scale factor (VERDICT r10 #1: "q97/q98 should get relatively faster
  * than unpruned reads as file count grows — record that ratio").
  *
  * Two read shapes, each timed pruned vs unpruned over the SAME files:
  *
  *  - q97 shape: point-band read (`o_orderkey BETWEEN 1000 AND 2000`) of
  *    a clustered `orders` store. Pruned = the graft connector (manifest
  *    zone maps drop non-covering files before listing/footer I/O);
  *    unpruned = `spark.read.parquet` over the version's own data files
  *    (identical bytes — parquet row-group skipping still applies, so
  *    the delta isolates exactly the manifest layer's contribution).
  *  - q98 shape: IVF probe read (`cell IN (2 nearest)`) of the at-rest
  *    index vs the same predicate over the raw files.
  *
  * Timings are min-of-3, pruned/unpruned interleaved so page-cache and
  * JIT drift hit both sides equally. File counts come from the executed
  * plan's FilePartitions — the number of files the scan actually opened,
  * not a manifest-side estimate. Prints one JSON line.
  */
object SkippingAudit {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectWithSubqueries {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.collect {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.urlEncodedPath).toSeq
        }.flatten
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files.map(_.getPath.toString))
    }.flatten

  private def timeMin3(mk: () => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().count()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- q97 shape: clustered orders point-band ----
    val root97 = s"${System.getProperty("java.io.tmpdir")}/graft_q97_" +
      Tables.fingerprint(sfDir, "orders")
    val store97 = new SnapshotStore(spark, root97)
    // fixture caches persist across builds: stamp pre-sentinel stores
    store97.migrateLegacyTable("orders")
    if (store97.latestVersion("orders").isEmpty)
      store97.commitClustered("orders", Tables.orders(spark, sfDir),
        clusterBy = Seq("o_orderkey"))
    val (v97, dirs97) = store97.resolveVersionPaths("orders", None)
    def pruned97() = spark.read.format("graft")
      .option("root", root97).option("table", "orders").load()
      .filter(col("o_orderkey").between(1000L, 2000L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def raw97() = spark.read.parquet(dirs97.map(_.toString): _*)
      .filter(col("o_orderkey").between(1000L, 2000L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val total97 = scannedFiles(spark.read.format("graft")
      .option("root", root97).option("table", "orders").load()).size
    val scan97 = scannedFiles(pruned97()).size
    // Interleave the timed runs: pruned, raw, pruned, raw, ...
    val (t97p, t97r) = {
      val ps = scala.collection.mutable.ArrayBuffer[Double]()
      val rs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); pruned97().count()
        ps += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); raw97().count()
        rs += (System.nanoTime() - t1) / 1e9
      }
      (ps.min, rs.min)
    }

    // ---- q98 shape: IVF probe read ----
    val root98 = s"${System.getProperty("java.io.tmpdir")}/graft_q98_" +
      Tables.fingerprint(sfDir, "embeddings")
    val store98 = new SnapshotStore(spark, root98)
    // fixture caches persist across builds: stamp pre-sentinel stores
    store98.migrateLegacyTable("ivf")
    val cents: Seq[Seq[Double]] = Tables.embeddings(spark, sfDir)
      .where(col("vec_id").between(1, 8))
      .orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    if (store98.latestVersion("ivf").isEmpty)
      graft.similarity.AnnIndex.build(store98, "ivf",
        Tables.embeddings(spark, sfDir).where(col("vec_id") > 8)
          .select(col("vec_id"), col("label"), col("embedding").as("v")),
        "vec_id", "v", cents)
    val q = Tables.embeddings(spark, sfDir).where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val probes = graft.similarity.Ann.nearestCells(cents, q, nprobe = 2)
    val (_, dirs98) = store98.resolveVersionPaths("ivf", None)
    def pruned98() = spark.read.format("graft")
      .option("root", root98).option("table", "ivf").load()
      .where(col("cell").isin(probes: _*))
    def raw98() = spark.read.parquet(dirs98.map(_.toString): _*)
      .where(col("cell").isin(probes: _*))
    val total98 = scannedFiles(spark.read.format("graft")
      .option("root", root98).option("table", "ivf").load()).size
    val scan98 = scannedFiles(pruned98()).size
    val (t98p, t98r) = {
      val ps = scala.collection.mutable.ArrayBuffer[Double]()
      val rs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); pruned98().count()
        ps += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); raw98().count()
        rs += (System.nanoTime() - t1) / 1e9
      }
      (ps.min, rs.min)
    }

    println(
      s"""{"sf_dir":"$sfDir",""" +
      s""""q97":{"files_total":$total97,"files_scanned":$scan97,""" +
      f""""pruned_sec":$t97p%.4f,"unpruned_sec":$t97r%.4f,""" +
      f""""speedup":${t97r / math.max(t97p, 1e-9)}%.2f},""" +
      s""""q98":{"files_total":$total98,"files_scanned":$scan98,""" +
      f""""pruned_sec":$t98p%.4f,"unpruned_sec":$t98r%.4f,""" +
      f""""speedup":${t98r / math.max(t98p, 1e-9)}%.2f}}""")
    spark.stop()
  }
}
