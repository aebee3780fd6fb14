package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.SnapshotStore

/** Layer isolation for the renamed-column pushdown loss (r15). */
object RenameProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = java.nio.file.Files.createTempDirectory("renprobe").toString
    val st = new SnapshotStore(spark, r)
    st.commit("t", spark.range(0, 2000)
      .select(col("id").as("k"), (col("id") * 2).as("v")))
    st.append("t", spark.range(2000, 2100)
      .select(col("id").as("k"), (col("id") * 2).as("v")))
    st.renameColumns("t", Map("v" -> "weight"))
    println("OP: " + st.commitProps("t", st.latestVersion("t").get))
    val df = st.read("t")
    println("STORE-READ-ALL: " + df.count())
    println("STORE-READ-FILTER: " + df.where(col("weight") >= 4000).count())
    println("STORE-READ-FILTER-LOW: " + df.where(col("weight") < 4000).count())
    spark.conf.set("spark.sql.catalog.rp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rp.root", r)
    println("CAT-ALL: " + spark.sql("SELECT count(*) FROM rp.t").collect()(0))
    println("CAT-FILTER: " + spark.sql(
      "SELECT count(*) FROM rp.t WHERE weight >= 4000").collect()(0))
    println(spark.sql("SELECT * FROM rp.t WHERE weight >= 4000")
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("Scan"))
      .mkString("\n").take(1200))
    spark.stop()
  }
}
