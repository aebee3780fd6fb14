package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorOps

/** Diagnostic for q92_quantized_rerank's bimodal sf10 wall time (r14
  * verdict: 0.63-0.80 s in six of nine canary-valid runs, 3.48-4.04 s in
  * three — same code and data). Times the query's three jobs SEPARATELY,
  * many times in one JVM, so the slow mode — when it strikes — names the
  * stage that carries it: (a) the driver-side query-vector head() (a
  * CollectLimit whose scan waves grow 1→4→16 partitions if the pushed
  * vec_id=0 filter doesn't prune to the first wave), (b) the quantized
  * coarse pass (scan + per-row HOF transforms + TakeOrderedAndProject),
  * (c) the full query (adds the broadcast join-back re-scan). Usage:
  * SPARK_GRAFT_SF_DIR=/tmp/sf10 tools/runjava.sh graft.tools.Q92Probe [n]
  */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    for (i <- 1 to rounds) {
      val (tHead, qSeq) = time {
        Tables.embeddings(spark, dir).where(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>"))
          .head().getSeq[Double](0)
      }
      val qScale = qSeq.map(math.abs).max / 127.0
      val qQuant =
        if (qScale == 0) qSeq.map(_ => 0.0)
        else qSeq.map { x =>
          val d = x / qScale
          if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)
        }
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val qz = e.where(col("vec_id") > 0)
        .withColumn("scale",
          array_max(transform(col("v"), x => abs(x))) / lit(127.0))
        .withColumn("qv", transform(col("v"), x => {
          val d = x / col("scale")
          when(col("scale").isNull || col("scale") === 0, lit(0.0))
            .when(d >= 0, floor(d + lit(0.5)).cast("double"))
            .otherwise(ceil(d - lit(0.5)).cast("double"))
        }))
      val coarse = qz
        .withColumn("coarse_sim",
          round(VectorOps.cosine(col("qv"), VectorOps.vecLit(qQuant)), 6))
        .orderBy(col("coarse_sim").desc, col("vec_id").asc)
        .limit(30)
        .select("vec_id", "label", "coarse_sim")
      val (tCoarse, _) = time { coarse.count() }
      val full = broadcast(coarse).join(e.select(col("vec_id"), col("v")), "vec_id")
        .withColumn("exact_sim",
          round(VectorOps.cosine(col("v"), VectorOps.vecLit(qSeq)), 6))
        .orderBy(col("exact_sim").desc, col("vec_id").asc)
        .limit(10)
        .select("vec_id", "label", "coarse_sim", "exact_sim")
      val (tFull, _) = time { full.count() }
      val (tWhole, _) = time {
        graft.SparkEntry.queries("q92_quantized_rerank")(spark, dir).count()
      }
      println(f"[q92probe] round $i%2d head $tHead%6.2f coarse $tCoarse%6.2f " +
        f"full $tFull%6.2f whole $tWhole%6.2f")
      if (tWhole > 3.0 || tFull > 2.5) {
        println("[q92probe] SLOW MODE plan:")
        println(full.queryExecution.executedPlan.toString.take(4000))
      }
    }
    spark.stop()
  }
}
