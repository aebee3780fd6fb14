package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.queries.TextQueries
import graft.sources.Tables

/** Measures what the corpus-card SKETCH TWINS save at a given scale
  * (VERDICT r11 #4: "a SCALE.md note on shuffle bytes saved at sf10"):
  * the exact vocabulary count shuffles one row per DISTINCT TOKEN (the
  * whole vocabulary crosses the wire to be deduplicated), while
  * `approx_count_distinct` shuffles one HLL++ sketch per partition —
  * constant in vocabulary size.
  *
  * Reports, for `vocabSize` exact vs sketch on the same documents table:
  * wall seconds (min-of-2, interleaved), total shuffle WRITE bytes and
  * records summed over the job's stages (a stage-completion listener on a
  * quiet session — each measurement runs alone), and the relative error
  * of the sketch. One JSON line.
  *
  * Usage: `runMain graft.tools.SketchAudit <sfDir>`.
  */
object SketchAudit {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      records.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      ()
    }
  }

  /** (seconds, shuffleBytes, shuffleRecords, result) of one measured run. */
  private def measured(spark: SparkSession)(body: => Long)
      : (Double, Long, Long, Long) = {
    val m = new ShuffleMeter
    spark.sparkContext.addSparkListener(m)
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    // stage-completion events arrive async on the listener bus (no public
    // drain API): give the final stage's event a beat to land before
    // detaching
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(m)
    (sec, m.bytes.get(), m.records.get(), r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.limit(1).count() // warm footers/JIT outside the timings

    // The real distinct-cardinality stressor in the card is n_unique
    // (content fingerprints: ~one distinct per document, corpus-scale);
    // the synthetic docs' word vocabulary is templated-small, so vocab
    // alone would not exercise the shuffle. Measure both.
    import org.apache.spark.sql.functions._
    def fpDistinct(exact: Boolean): Long = {
      val fp = docs.select(graft.dedup.Dedup.fingerprint(col("text")).as("fp"))
      val agg =
        if (exact) fp.select(countDistinct(col("fp")))
        else fp.select(approx_count_distinct(col("fp"), 0.01))
      agg.head().getLong(0)
    }
    // interleaved min-of-2 so cache/JIT drift hits both sides equally
    def minOf2(body: => Long) = {
      val r1 = measured(spark)(body); val r2 = measured(spark)(body)
      if (r1._1 <= r2._1) r1 else r2
    }
    def one(label: String, exactRun: => Long, sketchRun: => Long): String = {
      val (exSec, exB, exR, exV) = minOf2(exactRun)
      val (apSec, apB, apR, apV) = minOf2(sketchRun)
      val relErr = math.abs(apV - exV).toDouble / exV
      s""""$label":{"exact":{"sec":${f"$exSec%.3f"},"shuffle_bytes":$exB,""" +
        s""""shuffle_records":$exR,"n":$exV},""" +
        s""""sketch":{"sec":${f"$apSec%.3f"},"shuffle_bytes":$apB,""" +
        s""""shuffle_records":$apR,"n":$apV},""" +
        s""""bytes_ratio":${f"${exB.toDouble / math.max(apB, 1)}%.1f"},""" +
        s""""records_ratio":${f"${exR.toDouble / math.max(apR, 1)}%.1f"},""" +
        s""""rel_err":${f"$relErr%.5f"}}"""
    }
    val fpJson = one("fingerprint_distinct", fpDistinct(true), fpDistinct(false))
    val vocabJson = one("vocab",
      TextQueries.vocabSize(docs, exact = true),
      TextQueries.vocabSize(docs, exact = false))
    println(s"""{"dir":"$sfDir",$fpJson,$vocabJson}""")
    spark.stop()
  }
}
