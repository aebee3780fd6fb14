package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiling harness for hot queries: times labeled
  * sub-plans so optimization targets the measured bottleneck, not a guess.
  * Usage: sbt "runMain graft.Tune <sfDir>" */
object Tune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[tune] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
      val t1 = System.nanoTime(); val n2 = f
      println(f"[tune] $label%-28s ${(System.nanoTime() - t1) / 1e9}%6.2f s  (rows=$n2, warm)")
    }

    // --- q52 bigrams stages ---
    val docs = graft.sources.Tables.documents(spark, dir)
    time("q52 docs scan") { docs.select(col("text")).count() }
    val tk = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
    time("q52 tokenize") {
      docs.select(size(tk).as("n")).agg(sum(col("n"))).collect().head.getLong(0)
    }
    time("q52 tokenize+bigram+count") {
      docs.select(tk.as("tk")).where(size(col("tk")) >= 2)
        .select(explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc).limit(20).count()
    }

    // --- q36 minhash stages ---
    val d120 = docs.where(col("doc_id") < 120)
    val sh = d120.select(col("doc_id").as("id"),
      graft.dedup.Dedup.charShingles(col("text"), 4).as("sh"))
    time("q36 shingles") {
      sh.select(size(col("sh")).as("n")).agg(sum(col("n"))).collect().head.getLong(0)
    }
    time("q36 signatures") {
      graft.dedup.Dedup.portableMinhashSignatures(sh, 32).count()
    }
    time("q36 full") {
      graft.dedup.Dedup.minhashNearDups(d120, "doc_id", "text",
        shingleK = 4, numHashes = 32, bands = 16, minJaccard = 0.35,
        portable = true).count()
    }

    // --- q57 feature histogram ---
    time("q57 full") { SparkEntry.queries("q57_feature_histogram")(spark, dir).count() }

    spark.stop()
  }
}
