package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Throwaway mechanism probe for the field-ID rename design (r15):
  * does Spark 4.1 resolve parquet columns BY ID when the read schema
  * carries `parquet.field.id` metadata and fieldId.read is enabled?
  * And how does an id-less legacy file behave under an id'd schema? */
object FieldIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def meta(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    val dir = java.nio.file.Files.createTempDirectory("fid").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
      .select(col("a").as("a", meta(1)), col("b").as("b", meta(2)))
    df.write.mode("overwrite").parquet(dir)
    val readSchema = StructType(Seq(
      StructField("z", LongType, true, meta(1)),
      StructField("b", StringType, true, meta(2))))
    val back = spark.read.schema(readSchema).parquet(dir)
    println("RENAMED-READ: " + back.collect().toSeq.sortBy(_.getLong(0)).mkString(","))
    println("FILTERED: " + back.where(col("z") === 2L).collect().toSeq.mkString(","))
    println("PLAN: " + back.where(col("z") === 2L).queryExecution.executedPlan
      .toString.linesIterator.filter(_.contains("PushedFilters")).mkString(" | "))
    val dir2 = java.nio.file.Files.createTempDirectory("fid2").toString
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    Seq((9L, "q")).toDF("z", "b").write.mode("overwrite").parquet(dir2)
    try {
      val mixed = spark.read.schema(readSchema).parquet(dir2)
      println("NOIDFILE: " + mixed.collect().toSeq.mkString(","))
    } catch { case e: Throwable =>
      println("NOIDFILE-ERR: " + Option(e.getMessage).getOrElse("").linesIterator.next()) }
    // nested types with TOP-LEVEL-ONLY ids: arrays and structs
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dir3 = java.nio.file.Files.createTempDirectory("fid3").toString
    val nested = Seq((1L, Seq(1.0, 2.0), ("s1", 5L)))
      .toDF("k", "arr", "st")
      .select(col("k").as("k", meta(1)), col("arr").as("arr", meta(2)),
        col("st").as("st", meta(3)))
    nested.write.mode("overwrite").parquet(dir3)
    val nestedRead = StructType(Seq(
      StructField("k2", LongType, true, meta(1)),
      StructField("vec", ArrayType(DoubleType), true, meta(2)),
      StructField("st", StructType(Seq(
        StructField("_1", StringType), StructField("_2", LongType))), true, meta(3))))
    try {
      val b3 = spark.read.schema(nestedRead).parquet(dir3)
      println("NESTED: " + b3.collect().toSeq.mkString(","))
    } catch { case e: Throwable =>
      println("NESTED-ERR: " + Option(e.getMessage).getOrElse("").linesIterator.next()) }
    // conf OFF: does the id'd schema fall back to name matching?
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
    try {
      val off = spark.read.schema(readSchema).parquet(dir)
      println("CONF-OFF: " + off.collect().toSeq.mkString(","))
    } catch { case e: Throwable =>
      println("CONF-OFF-ERR: " + Option(e.getMessage).getOrElse("").linesIterator.next()) }
    spark.stop()
  }
}
// appended swap probe lives in FieldIdProbe2
object FieldIdProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println("WRITE-DEFAULT: " + spark.conf.get("spark.sql.parquet.fieldId.write.enabled"))
    println("READ-DEFAULT: " + spark.conf.get("spark.sql.parquet.fieldId.read.enabled"))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    def meta(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    val dir = java.nio.file.Files.createTempDirectory("fidswap").toString
    Seq((1L, 2.5)).toDF("id", "w")
      .select(col("id").as("id", meta(1)), col("w").as("w", meta(2)))
      .write.mode("overwrite").parquet(dir)
    // footer check
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(conf)
    val f = fs.listStatus(new HPath(dir)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val footer = ParquetFileReader.readFooter(conf, f)
    println("FOOTER: " + footer.getFileMetaData.getSchema.toString.linesIterator.mkString(" | "))
    // SWAP read: id<->w names with swapped ids
    val swapped = StructType(Seq(
      StructField("w", LongType, true, meta(1)),
      StructField("id", DoubleType, true, meta(2))))
    try println("SWAP: " + spark.read.schema(swapped).parquet(dir).collect().toSeq.mkString(","))
    catch { case e: Throwable => println("SWAP-ERR: " + Option(e.getMessage).getOrElse("").linesIterator.next()) }
    spark.stop()
  }
}
