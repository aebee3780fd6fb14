package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.core.SnapshotStore

/** The `graft` DataSource V2 connector: `spark.read.format("graft")` over a
  * SnapshotStore root must pin the committed snapshot at load time, time
  * travel via the `version` option, keep parquet pushdown/pruning intact,
  * and refuse writes (version directories are immutable). */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv2").toString

  test("reads the latest committed snapshot; version option time-travels") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("docs", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    st.commit("docs", Seq((3L, "c")).toDF("id", "s"))

    val latest = spark.read.format("graft")
      .option("root", root).option("table", "docs").load()
    assert(latest.select("id").as[Long].collect().toSet == Set(3L))

    val v1 = spark.read.format("graft")
      .option("root", root).option("table", "docs").option("version", "1").load()
    assert(v1.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a chained snapshot reads through the connector (chain + added column)") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("docs", Seq((1L, "a")).toDF("id", "s"))
    st.append("docs", Seq((2L, "b")).toDF("id", "s"))
    st.append("docs", Seq((3L, "c", 0.9)).toDF("id", "s", "score"))

    // latest = the whole chain under the pinned (evolved) snapshot schema
    val latest = spark.read.format("graft")
      .option("root", root).option("table", "docs").load()
    assert(latest.columns.toSeq == Seq("id", "s", "score"))
    assert(latest.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(latest.where(col("score").isNull).count() == 2L)

    // time travel to a mid-chain version assembles only its prefix,
    // under THAT version's pinned schema (no score column yet)
    val v2 = spark.read.format("graft")
      .option("root", root).option("table", "docs").option("version", "2").load()
    assert(v2.columns.toSeq == Seq("id", "s"))
    assert(v2.select("id").as[Long].collect().toSet == Set(1L, 2L))

    // SQL catalog face sees the same chain
    spark.conf.set("spark.sql.catalog.kgchain",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.kgchain.root", root)
    assert(spark.sql("SELECT count(*) FROM kgchain.docs").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM kgchain.docs VERSION AS OF 2")
      .head().getLong(0) == 2L)
  }

  test("a loaded frame is pinned: a later commit never changes its rows") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("t", Seq(10).toDF("x"))
    val pinned = spark.read.format("graft")
      .option("root", root).option("table", "t").load()
    st.commit("t", Seq(20).toDF("x"))
    assert(pinned.as[Int].collect().toSet == Set(10))
    assert(spark.read.format("graft").option("root", root).option("table", "t")
      .load().as[Int].collect().toSet == Set(20))
  }

  test("filter pushdown and column pruning reach the parquet scan") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("wide", (1 to 100).map(i => (i.toLong, s"s$i", i * 2, i % 7))
      .toDF("id", "s", "a", "b"))
    val q = spark.read.format("graft")
      .option("root", root).option("table", "wide").load()
      .where(col("id") > 90L).select("id", "a")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed id filter in:\n$plan")
    assert(!plan.contains("ReadSchema") || !plan.matches("(?s).*ReadSchema:[^\\n]*\\bs\\b.*"),
      s"pruned-out column 's' still in ReadSchema:\n$plan")
    assert(q.as[(Long, Int)].collect().toSet ==
      (91 to 100).map(i => (i.toLong, i * 2)).toSet)
  }

  test("aggregate pushdown reaches the parquet footers through the connector") {
    // the layering proof that matters at 100 TB: a COUNT/MIN/MAX over a
    // snapshot must come from parquet footer statistics (PushedAggregation
    // in the scan), not a full scan — delegation to Spark's parquet table
    // keeps this intact through the graft source
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("m", (1 to 1000).map(i => (i.toLong, i % 5)).toDF("id", "g"))
    val agg = spark.read.format("graft")
      .option("root", root).option("table", "m").load()
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), s"no PushedAggregation in:\n$plan")
    assert(agg.as[(Long, Long, Long)].collect().head == ((1000L, 1L, 1000L)))
  }

  test("deletion vectors filter rows through the connector scan") {
    // A sparse delete records a row vector instead of rewriting the file;
    // the DSv2 scan must drop exactly those rows — in plain reads, under
    // pushed filters, and in aggregates (which must NOT push to footer
    // statistics: the footers still count the vectored rows). Time travel
    // to the pre-delete version reads the file whole, same connector.
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("docs", spark.range(0, 1000)
      .selectExpr("id", "id * 3 as v").coalesce(1))
    st.delete("docs", col("id").isin(5L, 500L, 999L))
    assert(st.removedAt("docs", st.latestVersion("docs").get).isEmpty,
      "precondition: the delete was vectored, not a rewrite")
    def load(version: Option[Long]) = {
      val r = spark.read.format("graft").option("root", root).option("table", "docs")
      version.fold(r)(v => r.option("version", v.toString)).load()
    }
    // plain read: exactly the 997 survivors
    assert(load(None).count() == 997L)
    assert(load(None).where(col("id").isin(5L, 500L, 999L)).count() == 0L)
    // pushed filter over a vectored region still excludes the vectored row
    val band = load(None).where(col("id").between(498L, 502L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(band == Seq(498L, 499L, 501L, 502L))
    // aggregates are computed from surviving rows, not footer counts
    assert(load(None).agg(sum(col("v"))).head().getLong(0) ==
      (0L until 1000L).filterNot(Set(5L, 500L, 999L)).map(_ * 3).sum)
    // time travel: the pre-delete snapshot reads whole
    assert(load(Some(1L)).count() == 1000L)
    // SQL catalog face over the same DV'd table
    spark.conf.set("spark.sql.catalog.kgdv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.kgdv.root", root)
    assert(spark.sql("SELECT count(*) FROM kgdv.docs").head().getLong(0) == 997L)
    // a SECOND stacked vector delete composes
    st.delete("docs", col("id") === 7L)
    assert(load(None).count() == 996L)
    // compaction folds the vectors; the scan returns to the plain path
    st.compact("docs")
    assert(load(None).count() == 996L)
    assert(load(None).where(col("id") === 7L).count() == 0L)
  }

  test("writes through the connector land as store commits (V1 write fallback)") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("t", Seq(1).toDF("x"))
    // mode("append") = the store's OCC chain-link append, feed-visible
    Seq(2).toDF("x").write.format("graft")
      .option("root", root).option("table", "t").mode("append").save()
    assert(st.read("t").as[Int].collect().toSet == Set(1, 2))
    val v = st.latestVersion("t").get
    assert(st.changesAt("t", v).exists(_.count() == 1),
      "a connector append records its change set")
    // mode("overwrite") = self-contained rewrite; history stays readable
    Seq(9).toDF("x").write.format("graft")
      .option("root", root).option("table", "t").mode("overwrite").save()
    assert(st.read("t").as[Int].collect().toSeq == Seq(9))
    assert(st.readAt("t", v).as[Int].collect().toSet == Set(1, 2))
    // a version-pinned resolution refuses writes (head-mutation mismatch)
    val e = intercept[Exception] {
      Seq(3).toDF("x").write.format("graft")
        .option("root", root).option("table", "t").option("version", "1")
        .mode("append").save()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("pinned")), e.toString)
  }

  test("type-widening matrix: lossless numeric widening across the chain, no rewrite") {
    // Each supported (narrow, wide) pair, BOTH directions of arrival:
    //   A) base narrow, delta wide  -> pinned schema widens; the base's
    //      narrow files read widened under it
    //   B) base wide, delta narrow  -> pinned schema stays wide; the
    //      delta's narrow files read widened
    // Values must round-trip exactly (lossless matrix only), through the
    // store face AND the connector face.
    import org.apache.spark.sql.types._
    val pairs: Seq[(DataType, DataType, Seq[Any], Seq[Any])] = Seq(
      (ByteType, LongType, Seq(1.toByte, 2.toByte), Seq(300000000000L)),
      (ShortType, IntegerType, Seq(7.toShort), Seq(70000)),
      (IntegerType, LongType, Seq(5, 6), Seq(6000000000L)),
      (IntegerType, DoubleType, Seq(9), Seq(2.5)),
      (FloatType, DoubleType, Seq(1.5f), Seq(2.25))
    )
    for (((narrow, wide, nVals, wVals), i) <- pairs.zipWithIndex) {
      val root = freshRoot()
      val st = new SnapshotStore(spark, root)
      def df(t: DataType, vals: Seq[Any]) = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          vals.map(v => org.apache.spark.sql.Row(v)).asJava),
        StructType(Seq(StructField("x", t))))
      def asDoubles(d: org.apache.spark.sql.DataFrame): Set[Double] =
        d.select(col("x").cast("double")).as[Double].collect().toSet
      val expect = (nVals ++ wVals)
        .map(v => v.toString.toDouble).toSet

      // A: narrow base, wide delta
      st.append("a", df(narrow, nVals))
      st.append("a", df(wide, wVals))
      assert(st.snapshotSchema("a").fields.head.dataType == wide,
        s"pair $i: pinned schema widened")
      assert(asDoubles(st.read("a")) == expect, s"pair $i dir A store")
      val connA = spark.read.format("graft").option("root", root)
        .option("table", "a").load()
      assert(connA.schema.fields.head.dataType == wide)
      assert(asDoubles(connA) == expect, s"pair $i dir A connector")

      // B: wide base, narrow delta
      st.append("b", df(wide, wVals))
      st.append("b", df(narrow, nVals))
      assert(st.snapshotSchema("b").fields.head.dataType == wide,
        s"pair $i: pinned schema stays wide")
      assert(asDoubles(st.read("b")) == expect, s"pair $i dir B store")
      val connB = spark.read.format("graft").option("root", root)
        .option("table", "b").load()
      assert(asDoubles(connB) == expect, s"pair $i dir B connector")
    }
  }

  test("unsupported retypes still refuse loudly (the non-widening matrix)") {
    import org.apache.spark.sql.types._
    val bad: Seq[(DataType, Any, DataType, Any)] = Seq(
      (LongType, 1L, DoubleType, 2.5),   // lossy: long does not fit double
      (DoubleType, 1.5, FloatType, 2.5f), // control: this IS allowed (narrow delta)
      (IntegerType, 1, StringType, "s"),  // cross-kind
      (StringType, "s", IntegerType, 1)
    )
    for (((bt, bv, dt, dv), i) <- bad.zipWithIndex) {
      val root = freshRoot()
      val st = new SnapshotStore(spark, root)
      def df(t: DataType, v: Any) = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          Seq(org.apache.spark.sql.Row(v)).asJava),
        StructType(Seq(StructField("x", t))))
      st.append("t", df(bt, bv))
      if (bt == DoubleType && dt == FloatType) {
        st.append("t", df(dt, dv)) // lossless direction: allowed
        assert(st.snapshotSchema("t").fields.head.dataType == DoubleType)
      } else intercept[IllegalArgumentException] {
        st.append("t", df(dt, dv))
      }
    }
  }

  test("missing table and uncommitted version fail loudly") {
    val root = freshRoot()
    val st = new SnapshotStore(spark, root)
    st.commit("t", Seq(1).toDF("x"))
    intercept[Exception] {
      spark.read.format("graft").option("root", root).option("table", "nope").load()
    }
    intercept[Exception] {
      spark.read.format("graft").option("root", root).option("table", "t")
        .option("version", "99").load()
    }
  }
}
