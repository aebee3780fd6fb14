package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ParquetTableShim
import graft.core.SnapshotStore

/** Isolates why a pre-rename _changes file read NULL under the renamed
  * head schema through the feed path (r15). */
object FeedRenameProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("feedren").toString
    val st = new SnapshotStore(spark, root)
    import spark.implicits._
    st.append("t", Seq(("a", 1.0)).toDF("k", "v"))
    st.renameColumns("t", Map("v" -> "weight"))
    val head = st.latestVersion("t").get
    val pinned = st.snapshotSchema(table = "t", Some(head))
    println("PINNED: " + pinned.map(f => s"${f.name}:${f.metadata}").mkString(" | "))
    val chDir = root + "/t/v=1/_changes"
    println("CONF: " + spark.conf.get("spark.sql.parquet.fieldId.read.enabled"))
    // way 1: DataFrameReader (V1 path)
    val v1 = spark.read.schema(pinned).parquet(chDir).collect().toSeq
    println("V1-READ: " + v1.mkString(","))
    // way 2: the feed's DSv2 tableWithSchema path
    val batch = ParquetTableShim.unfilteredBatch(
      ParquetTableShim.tableWithSchema("probe", spark, Seq(chDir), pinned))
    val parts = batch.planInputPartitions()
    val rf = batch.createReaderFactory()
    val rows = parts.flatMap { p =>
      val r = rf.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (r.next()) {
        val row = r.get()
        buf += s"(${row.getUTF8String(0)}, ${if (row.isNullAt(1)) "NULL" else row.getDouble(1)})"
      }
      r.close(); buf
    }
    println("V2-READ: " + rows.mkString(","))
    spark.stop()
  }
}
