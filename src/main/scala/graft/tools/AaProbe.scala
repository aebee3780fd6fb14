package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch stage-split probe for the q87 Adamic-Adar pipeline: times the
  * postings aggregate in its old (distinct + degree join + collect_list)
  * and new (fused capped-set) forms, and the pair stage, so the rewrite
  * targets the measured bottleneck. Usage: runMain graft.tools.AaProbe <sfDir> */
object AaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"[aa] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n, run$i)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val ceiling = graft.queries.GraphQueries.AdamicAdarDegreeCeiling
    def raw = Tables.lineitem(spark, dir)
      .where(col("l_linenumber") === 1)
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
    def e = raw.distinct()
    val sk = expr("substring(src, 2)").cast("long")

    def postingsOld: DataFrame = {
      val deg = e.groupBy(col("dst")).agg(count(lit(1)).as("deg"))
      e.join(deg, "dst")
        .where(col("deg") >= 2 && col("deg") <= ceiling)
        .select(col("dst"), col("deg"), sk.as("sk"))
        .groupBy(col("dst"), col("deg"))
        .agg(array_sort(collect_list(col("sk"))).as("ids"))
    }
    def postingsSet: DataFrame = raw
      .select(col("dst"), sk.as("sk"))
      .groupBy(col("dst"))
      .agg(collect_set(col("sk")).as("ids0"))
      .select(col("dst"), size(col("ids0")).cast("long").as("deg"), col("ids0"))
      .where(col("deg") >= 2 && col("deg") <= ceiling)
      .select(col("dst"), col("deg"), array_sort(col("ids0")).as("ids"))
    def postingsCap: DataFrame =
      graft.queries.GraphQueries.postingsForTest(spark, dir)

    def pairsOf(p: DataFrame): DataFrame = {
      val pairs = p
        .select(round(round(lit(1.0) / log(col("deg").cast("double")), 6) *
            lit(1e6)).cast("long").as("w_micro"),
          col("ids"), posexplode(col("ids")))
        .select(col("w_micro"), col("col").as("a_k"),
          explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("b_k"))
      pairs.groupBy(col("a_k"), col("b_k"))
        .agg((sum(col("w_micro")).cast("double") / lit(1e6)).as("aa_score"),
          count(lit(1)).as("common_parts"))
        .orderBy(col("aa_score").desc, col("a_k").asc, col("b_k").asc)
        .limit(100)
    }

    time("full capSet") { pairsOf(postingsCap).count() }
    time("full collect_set") { pairsOf(postingsSet).count() }
    time("full OLD") { pairsOf(postingsOld).count() }
    time("postings capSet udaf") { postingsCap.write.format("noop").mode("overwrite").save(); 0L }
    time("postings collect_set (no cap)") { postingsSet.write.format("noop").mode("overwrite").save(); 0L }
    time("postings OLD (join)") { postingsOld.write.format("noop").mode("overwrite").save(); 0L }
    spark.stop()
  }
}
