package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Pins the temporal contract of the events loader: whatever physical type
  * the parquet writer chose for `ts` — TIMESTAMP (UTC-adjusted),
  * TIMESTAMP_NTZ (Spark 4.x infers `isAdjustedToUTC=false` micros as NTZ),
  * or TIMESTAMP(NANOS) (surfaced as long nanos under the legacy flag) —
  * `Tables.events` must yield a plain microsecond `TimestampType` column
  * with identical `unix_micros` values.
  *
  * Round 9 regression this guards: a Spark runtime bump silently switched
  * the testdata inference to NTZ, and `unix_micros` rejects NTZ at analysis
  * time, crashing q39/q65/q81. The loader owns normalization so the next
  * runtime bump cannot re-break downstream temporal call sites.
  */
class TemporalContractSpec extends SparkSpec {

  // Known instants (micros since epoch), including a sub-second component
  // so lossy normalization would show up in the comparison.
  private val micros = Seq(0L, 1234567890123456L, 1700000000000001L)

  private def writeVariant(name: String)(write: DataFrame => String): String = {
    import spark.implicits._
    val base = micros.toDF("us")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(7L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    write(base)
  }

  private def freshDir(): String =
    Files.createTempDirectory("temporal-contract").toString

  test("events loader normalizes TIMESTAMP, TIMESTAMP_NTZ and long-nanos to identical TimestampType") {
    val tzDir = writeVariant("tz") { base =>
      val d = freshDir()
      base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    val ntzDir = writeVariant("ntz") { base =>
      val d = freshDir()
      base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
        .drop("us")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    // TIMESTAMP(NANOS) reaches the loader as LongType under
    // spark.sql.legacy.parquet.nanosAsLong; writing a plain int64 column
    // named ts exercises the same loader arm.
    val nanosDir = writeVariant("nanos") { base =>
      val d = freshDir()
      base.withColumn("ts", col("us") * lit(1000L)).drop("us")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }

    // Sanity: the NTZ variant really is NTZ on disk (guards against the
    // writer silently changing type and this spec testing nothing).
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)

    val loaded = Seq(tzDir, ntzDir, nanosDir).map(Tables.events(spark, _))
    loaded.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType,
        s"loader must normalize to TimestampType, got ${df.schema("ts").dataType}")
    }

    val values = loaded.map { df =>
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(values(0) == values(1),
      "TIMESTAMP and TIMESTAMP_NTZ variants must decode to identical micros")
    assert(values(0) == values(2),
      "TIMESTAMP and long-nanos variants must decode to identical micros")
    assert(values(0).map(_._2).sorted == micros.sorted)
  }

  test("streaming watermark path tolerates TIMESTAMP_NTZ event-time input") {
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps

    val hourUs = 3600L * 1000000L
    val eventMicros = Seq(5L * 60 * 1000000L, 20L * 60 * 1000000L, hourUs + 1L)
    import spark.implicits._
    val d = freshDir()
    eventMicros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .drop("us")
      .write.mode("overwrite").parquet(d)

    val ntzSchema = StructType(StreamOps.eventSchema.map {
      case f if f.name == "ts" => f.copy(dataType = TimestampNTZType)
      case f                   => f
    })
    val stream = spark.readStream.schema(ntzSchema).parquet(d)
    // The watermark + window aggregate must analyze and run on NTZ event
    // time, not crash the way unix_micros did on the batch side.
    val out = StreamOps.runToMemory(spark,
      StreamOps.windowedCounts(stream, watermark = "0 seconds"), "wc_ntz",
      OutputMode.Complete)
    val clickTotal = out.where(col("event_type") === "click")
      .agg(sum(col("n"))).as[Long].head()
    assert(clickTotal == 3L)
    assert(out.select(countDistinct(col("window"))).as[Long].head() == 2L,
      "events an hour apart must land in two distinct windows")
  }
}
