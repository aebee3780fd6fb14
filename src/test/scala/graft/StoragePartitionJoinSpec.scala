package graft

import org.apache.spark.sql.functions._
import graft.core.SnapshotStore
import graft.sources.GraftCatalog

/** Storage-partitioned joins over the snapshot store: two tables written
  * with `commitBucketed` on the same (column, count) must join through the
  * SQL catalog with NO shuffle exchange on either side — the scan reports
  * `KeyGroupedPartitioning(bucket(n, col), n)`, the catalog resolves the
  * bucket transform as a V2 function, and EnsureRequirements matches the
  * two sides' partition keys. The shuffle this deletes is the dominant
  * cost of a fact⋈fact join at warehouse scale. */
class StoragePartitionJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-spj").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("fa", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("fb", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.root", r)
    r
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes stages only on execution
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("co-bucketed tables join with zero exchanges; values exact") {
    root
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spj.fa a JOIN spj.fb b ON a.k = b.k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // value parity against the shuffled join of the same snapshots
      val plain = spark.sql(
        "SELECT a.k AS k, va, vb FROM spj.fa a JOIN spj.fb b ON a.k = b.k")
      assert(j.count() == 10000)
      assert(j.agg(sum("va"), sum("vb")).head() ==
        plain.agg(sum("va"), sum("vb")).head())
    }
  }

  test("bucketed appends keep the layout; a plain append breaks the claim safely") {
    // Own root: this test deliberately DESTROYS a table's bucket claim,
    // which must not leak into the shared fixture's later tests.
    val r = java.nio.file.Files.createTempDirectory("graft-spj-mut").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("ma", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("mb", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spjm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjm.root", r)
    st.appendBucketed("ma", spark.range(10000, 12000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spjm.ma a JOIN spjm.mb b ON a.k = b.k")
      assert(!finalPlan(j).contains("Exchange"),
        "a bucketed append must keep the co-partition claim")
      assert(j.count() == 10000, "mb has no keys >= 10000")
    }
    // mismatched layout refused loudly
    val bad = intercept[IllegalArgumentException](
      st.appendBucketed("ma", Seq((1L, 2L)).toDF("k", "va"), "k", 16))
    assert(bad.getMessage.contains("mixed layouts"))
    // a PLAIN append's files are not bucket-attributed: the claim must
    // drop (correctness over speed), so the join shuffles again
    st.append("ma", Seq((20000L, 40000L)).toDF("k", "va"))
    assert(st.bucketSpecOf("ma", st.latestVersion("ma").get).isEmpty)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spjm.ma a JOIN spjm.mb b ON a.k = b.k")
      assert(finalPlan(j).contains("Exchange"),
        "an unbucketed chain must not claim co-partitioning")
      assert(j.count() == 10000)
    }
  }

  test("a sparse DV delete keeps the claim: join stays zero-exchange, values exact") {
    // The r14 gap closed: ANY deletion vector used to drop the
    // KeyGroupedPartitioning claim until compact, so a mutation-heavy
    // bucketed fact table lost its zero-exchange joins. A vector only
    // subtracts rows within a file — it cannot move a row across buckets
    // — so the claim is retained and the readers DV-filter in place.
    val r = java.nio.file.Files.createTempDirectory("graft-spj-dv").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("da", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("db", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spjdv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjdv.root", r)
    // sparse delete: a handful of keys out of 1250/file -> deletion vector
    st.delete("da", col("k").isin(3L, 1007L, 4242L, 9999L))
    val v = st.latestVersion("da").get
    assert(st.dvInChain("da", v).nonEmpty, "precondition: the delete vectored")
    assert(st.bucketSpecOf("da", v).contains(("k", 8)),
      "a pure-vector link must re-stamp the bucket claim")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spjdv.da a JOIN spjdv.db b ON a.k = b.k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"DV'd co-bucketed join must stay zero-exchange:\n$plan")
      // values EXACT vs the shuffled plan over the same snapshots
      val shuffled = withSQLConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(
          "SELECT a.k AS k, va, vb FROM spjdv.da a JOIN spjdv.db b ON a.k = b.k")
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == 9996L, "4 vectored keys drop from the join")
      assert(shuffled._1 == 9996L)
      assert(j.agg(sum("va"), sum("vb")).head() == shuffled._2)
      // and the per-key content survives the keyed readers exactly
      assert(j.where(col("k").isin(3L, 1007L, 4242L, 9999L)).count() == 0)
      assert(j.where(col("k") === 4241L).select("va", "vb")
        .as[(Long, Long)].head() == ((8482L, 4248L)))
    }
    // a DENSE delete copy-on-writes survivor files — which since r16 are
    // REPARTITIONED by the bucket spec at write (part index = bucket id),
    // so the claim survives the rewrite and the join stays zero-exchange
    st.delete("da", col("k") < 5000L)
    val v2 = st.latestVersion("da").get
    assert(st.bucketSpecOf("da", v2).contains(("k", 8)),
      "a COW delete's bucket-attributed survivors must keep the claim")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spjdv.da a JOIN spjdv.db b ON a.k = b.k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"a COW-mutated bucketed chain must stay zero-exchange:\n$plan")
      assert(j.count() == 4999L, "survivors: 5000..9998, nothing below")
      val shuffled = withSQLConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(
          "SELECT a.k AS k, va, vb FROM spjdv.da a JOIN spjdv.db b ON a.k = b.k")
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(shuffled._1 == 4999L)
      assert(j.agg(sum("va"), sum("vb")).head() == shuffled._2)
    }
  }

  test("UPDATE keeps the claim — even one that moves rows across buckets") {
    val r = java.nio.file.Files.createTempDirectory("graft-spj-upd").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("ua", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("ub", spark.range(0, 20000)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spju", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spju.root", r)
    // a value update (bucket key untouched): post-images repartition into
    // their unchanged buckets
    st.update("ua", col("k") < 3000L, Map("va" -> (col("va") + 1000000L)))
    assert(st.bucketSpecOf("ua", st.latestVersion("ua").get)
      .contains(("k", 8)),
      "an UPDATE's bucket-attributed rewrite must keep the claim")
    // a KEY update: rows physically move to their new key's bucket file —
    // the layout rule (bucket b's files hold only bucket-b rows) must
    // still hold, which only the write-side repartition guarantees
    st.update("ua", col("k") >= 9000L && col("k") < 9100L,
      Map("k" -> (col("k") + 10000L)))
    val v = st.latestVersion("ua").get
    assert(st.bucketSpecOf("ua", v).contains(("k", 8)),
      "a bucket-column UPDATE must keep the claim (rows re-bucketed at write)")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spju.ua a JOIN spju.ub b ON a.k = b.k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"an updated bucketed chain must stay zero-exchange:\n$plan")
      val shuffled = withSQLConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(
          "SELECT a.k AS k, va, vb FROM spju.ua a JOIN spju.ub b ON a.k = b.k")
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == shuffled._1)
      assert(j.agg(sum("va"), sum("vb")).head() == shuffled._2)
      // the moved keys joined under their NEW values: 9000 -> 19000
      assert(j.where(col("k") === 19000L).select("va").as[Long].head() ==
        18000L, "moved row must be found in its new bucket")
      assert(j.where(col("k") === 9000L).count() == 0,
        "the old key must be gone")
      assert(j.agg(count(lit(1))).head().getLong(0) == 10000L)
    }
  }

  test("MERGE keeps the claim: upserted fact joins zero-exchange, values exact") {
    val r = java.nio.file.Files.createTempDirectory("graft-spj-mrg").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("fa", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("fb", spark.range(0, 12000)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spjmg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjmg.root", r)
    // upsert: update a band, insert 2000 new keys
    val src = spark.range(8000, 12000)
      .select(col("id").as("k"), (col("id") * 100).as("va"))
    st.merge("fa", src, col("target.k") === col("source.k"),
      matchedUpdate = Some(Map("va" -> col("source.va"))))
    assert(st.bucketSpecOf("fa", st.latestVersion("fa").get)
      .contains(("k", 8)),
      "a MERGE's bucket-attributed writes must keep the claim")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vb FROM spjmg.fa a JOIN spjmg.fb b ON a.k = b.k")
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"a merged bucketed chain must stay zero-exchange:\n$plan")
      assert(j.count() == 12000L, "10000 originals + 2000 inserts all match")
      assert(j.where(col("k") === 9000L).select("va").as[Long].head() ==
        900000L, "updated row must carry the post-image")
      assert(j.where(col("k") === 11000L).select("va").as[Long].head() ==
        1100000L, "inserted row must land in its key's bucket")
      val shuffled = withSQLConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        spark.sql(
          "SELECT a.k AS k, va, vb FROM spjmg.fa a JOIN spjmg.fb b ON a.k = b.k")
          .agg(sum("va"), sum("vb")).head()
      }
      assert(j.agg(sum("va"), sum("vb")).head() == shuffled)
    }
  }

  test("default compact and the DV fold preserve the layout; explicit layouts drop it") {
    val r = java.nio.file.Files.createTempDirectory("graft-spj-cpt").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("ca", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    st.appendBucketed("ca", spark.range(10000, 12000)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 8)
    // sparse delete -> deletion vector; the fold rewrites bucket-attributed
    st.delete("ca", col("k").isin(5L, 10001L))
    assert(st.dvInChain("ca", st.latestVersion("ca").get).nonEmpty)
    st.compactVectored("ca")
    val vf = st.latestVersion("ca").get
    assert(st.dvInChain("ca", vf).isEmpty, "the fold must clear the vectors")
    assert(st.bucketSpecOf("ca", vf).contains(("k", 8)),
      "the DV fold must keep the bucket claim")
    // default compact: chain collapses to ONE self-contained bucketed
    // version — small per-link files merge WITHIN buckets
    st.compact("ca")
    val vc = st.latestVersion("ca").get
    assert(st.bucketSpecOf("ca", vc).contains(("k", 8)),
      "a default compact of a bucketed chain must keep the layout")
    val snap = spark.read.format("graft")
      .option("root", r).option("table", "ca").load()
    assert(snap.count() == 11998L)
    assert(snap.where(col("k") === 11000L).select("va").as[Long].head()
      == 22000L)
    // an explicit layout request is a request to CHANGE layout: claim drops
    st.compact("ca", targetPartitions = 3)
    assert(st.bucketSpecOf("ca", st.latestVersion("ca").get).isEmpty,
      "an explicit targetPartitions compact must drop the claim")
  }

  test("groupBy on the bucket column aggregates without a shuffle") {
    root
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val agg = spark.sql(
        "SELECT k, sum(vb) AS s FROM spj.fb GROUP BY k")
      val plan = finalPlan(agg)
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy must be exchange-free:\n$plan")
      assert(agg.count() == 10000)
    }
  }

  test("a selective filter prunes inside buckets; the join stays exchange-free") {
    root
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        """SELECT a.k AS k, va, vb FROM spj.fa a JOIN spj.fb b ON a.k = b.k
          |WHERE a.k < 100""".stripMargin)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"filters must not break the co-partition claim:\n$plan")
      assert(j.count() == 100)
    }
  }

  test("bucketed vs unbucketed: only the unbucketed side shuffles (V2 function runs)") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled lets Spark shuffle a
    // NON-bucketed side into the bucketed side's KeyGroupedPartitioning by
    // EVALUATING the catalog's bucket function — the path that exercises
    // BoundBucket.produceResult for real, and the reason its hash must
    // equal the writer's.
    root
    val plainRoot = java.nio.file.Files.createTempDirectory("graft-spj-plain").toString
    val st = new SnapshotStore(spark, plainRoot)
    st.commit("pu", spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 97).as("vu")))
    spark.conf.set("spark.sql.catalog.spjp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjp.root", plainRoot)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(
        "SELECT a.k AS k, va, vu FROM spj.fa a JOIN spjp.pu u ON a.k = u.k")
      val plan = finalPlan(j)
      assert(j.count() == 10000)
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"exactly the unbucketed side must shuffle:\n$plan")
      // the shuffled rows landed in the RIGHT buckets (produceResult
      // parity with the writer), or this equality would drop matches
      assert(j.where(col("k") === 96).select("vu").as[Long].head() == 96L)
    }
  }

  test("addColumns keeps the bucket claim (no row moved, layout still valid)") {
    val r = java.nio.file.Files.createTempDirectory("graft-spj-alter").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("t", spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 3).as("v")), "k", 4)
    st.addColumns("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType))))
    assert(st.bucketSpecOf("t", st.latestVersion("t").get).contains(("k", 4)),
      "a schema-only link must not drop the co-partition claim")
    val snap = spark.read.format("graft")
      .option("root", r).option("table", "t").load()
    assert(snap.where(col("w").isNull).count() == 1000)
    // duplicate name refuses case-insensitively
    val dup = intercept[IllegalArgumentException](st.addColumns("t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("K",
          org.apache.spark.sql.types.IntegerType)))))
    assert(dup.getMessage.contains("already exist"))
  }

  test("bucketId equals Spark's hash-partitioning id across column types") {
    // The function must replicate pmod(murmur3(col, 42), n) for ANY
    // bucketable type, not just the longs the fixtures use — compare
    // against Spark's own hash() + pmod for ints, longs, strings, dates
    // and nulls (hash(null) folds the bare seed through, like the
    // HashExpression).
    import org.apache.spark.sql.types._
    val fn = org.apache.spark.sql.graftbridge.GraftBucketFunction
    val n = 16
    def sparkSide(df: org.apache.spark.sql.DataFrame): Seq[(Any, Int)] =
      df.select(col("v"), pmod(hash(col("v")), lit(n)).as("b"))
        .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    sparkSide(spark.range(-50, 50).select(col("id").as("v")))
      .foreach { case (v, b) =>
        assert(fn.bucketId(v, LongType, n) == b, s"long $v") }
    sparkSide(spark.range(0, 100)
      .select(col("id").cast("int").as("v")))
      .foreach { case (v, b) => assert(fn.bucketId(v, IntegerType, n) == b, s"int $v") }
    sparkSide(spark.range(0, 100)
      .select(concat(lit("k"), col("id")).as("v")))
      .foreach { case (v, b) =>
        assert(fn.bucketId(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString),
          StringType, n) == b, s"string $v") }
    sparkSide(spark.range(0, 50)
      .select(date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        col("id").cast("int")).as("v")))
      .foreach { case (v, b) =>
        val days = v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
        assert(fn.bucketId(days, DateType, n) == b, s"date $v") }
    val nullBucket = spark.sql(s"SELECT pmod(hash(CAST(NULL AS BIGINT)), $n)")
      .head().getInt(0)
    assert(fn.bucketId(null, LongType, n) == nullBucket, "null")
  }

  test("writer bucket ids equal the V2 function's (shuffle-side parity)") {
    // The file a row landed in (its part index) must equal what the bound
    // bucket function computes — the contract that lets Spark shuffle a
    // NON-bucketed side to match a bucketed one.
    val st = new SnapshotStore(spark, root)
    val snap = spark.read.parquet(s"$root/fb/v=1")
      .select(col("k"), col("_metadata.file_path").as("fp"))
      .collect()
    val fn = org.apache.spark.sql.graftbridge.GraftBucketFunction
    snap.foreach { r =>
      val fileBucket = "part-(\\d+)-".r.findFirstMatchIn(
        r.getString(1).split('/').last).get.group(1).toInt
      val expected = fn.bucketId(r.getLong(0),
        org.apache.spark.sql.types.LongType, 8)
      assert(fileBucket == expected,
        s"k=${r.getLong(0)} landed in bucket $fileBucket, function says $expected")
    }
    assert(st.bucketSpecOf("fb", st.latestVersion("fb").get)
      .contains(("k", 8)))
  }

  test("sorted buckets: SMJ skips its sorts too; an append drops only the ordering claim") {
    // commitBucketed writes each bucket sortWithinPartitions(key), and a
    // single-file-per-bucket chain reports per-partition ORDERING on top
    // of the KeyGroupedPartitioning — so the co-bucketed join runs with
    // neither exchanges NOR sorts (sorted once at write, not per query).
    val r = java.nio.file.Files.createTempDirectory("graft-spj-sort").toString
    val st = new SnapshotStore(spark, r)
    st.commitBucketed("sa", spark.range(0, 10000)
      .select((col("id") * 7919 % 10000).as("k"), (col("id") * 2).as("va")), "k", 8)
    st.commitBucketed("sb", spark.range(0, 10000)
      .select((col("id") * 104729 % 10000).as("k"), (col("id") + 7).as("vb")), "k", 8)
    spark.conf.set("spark.sql.catalog.spjs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjs.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = "SELECT a.k AS k, va, vb FROM spjs.sa a JOIN spjs.sb b ON a.k = b.k"
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"), s"still zero-exchange:\n$plan")
      assert(!plan.contains("Sort "), s"sorted buckets must skip SMJ sorts:\n$plan")
      // values exact vs the claim-free shuffled join
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == base._1)
      assert(j.agg(sum("va"), sum("vb")).head() == base._2)
      // an append makes buckets multi-file: each file is still one sorted
      // RUN, so the reader MERGES runs and the ordering claim SURVIVES —
      // the sortless SMJ holds through append chains (r17 dropped it
      // until compact). Values must be exact through the merge.
      st.appendBucketed("sa", spark.range(20000, 22000)
        .select((col("id") % 10000).as("k"), (col("id") * 3).as("va")), "k", 8)
      val j2 = spark.sql(q)
      val plan2 = finalPlan(j2)
      assert(!plan2.contains("Exchange"),
        s"bucketed append keeps the zero-exchange claim:\n$plan2")
      assert(!plan2.contains("Sort "),
        s"sorted-run buckets MERGE at read — append keeps the sortless SMJ:\n$plan2")
      val base2 = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j2.count() == base2._1 && j2.agg(sum("va"), sum("vb")).head() == base2._2,
        "merged-run join values must be exact vs the shuffled baseline")
      // several more appends: deeper merges, still exact and sortless
      st.appendBucketed("sa", spark.range(30000, 31000)
        .select((col("id") % 10000).as("k"), (col("id") * 5).as("va")), "k", 8)
      st.appendBucketed("sb", spark.range(40000, 41000)
        .select((col("id") % 10000).as("k"), (col("id") * 7).as("vb")), "k", 8)
      val j3 = spark.sql(q)
      assert(!finalPlan(j3).contains("Sort "), "3-run merge stays sortless")
      val base3 = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j3.count() == base3._1 &&
        j3.agg(sum("va"), sum("vb")).head() == base3._2,
        "multi-append merged join values must be exact")
    }
  }

  test("sorted claim is per-link truth: folds never inherit it, compact restores it") {
    // The inheritance hole: compact/compact-dv carry the chain's
    // resolvedProps forward, and graft.bucket.sorted riding that
    // inheritance onto UNSORTED rewrite files would let the scan claim
    // per-partition ordering the data doesn't have — an SMJ skipping its
    // sorts over unsorted buckets silently mis-joins. The prop is
    // per-link truth now: subtracted from every inheritance, re-stamped
    // only by a write that actually sorted.
    val r = java.nio.file.Files.createTempDirectory("graft-spj-inh").toString
    val st = new SnapshotStore(spark, r)
    // keys deliberately NOT in file order after the DV fold's survivor
    // rewrite would matter; sorted at commit
    st.commitBucketed("ia", spark.range(0, 4000)
      .select((col("id") * 2654435761L % 4096).as("k"), col("id").as("va")), "k", 4)
    st.commitBucketed("ib", spark.range(0, 4000)
      .select((col("id") * 2654435761L % 4096).as("k"), col("id").as("vb")), "k", 4)
    spark.conf.set("spark.sql.catalog.spji", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spji.root", r)
    assert(st.bucketSortedOf("ia", st.latestVersion("ia").get))
    // sparse delete vectors a few rows, then fold the vectors: the fold's
    // survivor rewrite does NOT sort — the sorted claim must not survive
    st.delete("ia", col("va").isin(3L, 777L, 2048L))
    st.compactVectored("ia")
    assert(!st.bucketSortedOf("ia", st.latestVersion("ia").get),
      "a compact-dv survivor rewrite must not inherit the sorted claim")
    val q = "SELECT a.k AS k, va, vb FROM spji.ia a JOIN spji.ib b ON a.k = b.k"
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q); (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      val j1 = spark.sql(q)
      assert(j1.count() == base._1 &&
        j1.agg(sum("va"), sum("vb")).head() == base._2,
        "post-fold join values must be exact (no false ordering claim)")
      // a DEFAULT compact re-buckets AND re-sorts: the claim is restored
      st.compact("ia")
      assert(st.bucketSortedOf("ia", st.latestVersion("ia").get),
        "the layout-preserving compact restores the sorted claim")
      val j2 = spark.sql(q)
      val plan2 = finalPlan(j2)
      assert(!plan2.contains("Exchange") && !plan2.contains("Sort "),
        s"post-compact co-bucketed join runs sortless again:\n$plan2")
      assert(j2.count() == base._1 &&
        j2.agg(sum("va"), sum("vb")).head() == base._2)
    }
  }

  test("q113 shape: star join's fact⋈fact leg zero-exchange under dim chain + agg") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    root
    // dim: a small decorated side joined ABOVE the fact join, then a
    // group-by — q113_star_join_spj's shape. The aggregate may shuffle
    // (tiny, one row per group); the fact join must not.
    val dim = spark.range(0, 100)
      .select((col("id") * 100).as("dk"), (col("id") % 5).as("cat"))
    dim.createOrReplaceTempView("spj_dim")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // the tiny fixture would broadcast a fact side; q113's sf10 facts
      // are SMJ-sized, so pin that regime and hint the dim broadcast
      // exactly as q113 does with broadcast()
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = spark.sql(
        """SELECT /*+ BROADCAST(d) */ cat, count(*) AS n, sum(va + vb) AS s
          |FROM spj.fa a JOIN spj.fb b ON a.k = b.k
          |JOIN spj_dim d ON a.k = d.dk
          |GROUP BY cat ORDER BY cat""".stripMargin)
      q.collect()
      def all(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case other => other.children
        }
        p +: kids.flatMap(all)
      }
      val nodes = all(q.queryExecution.executedPlan)
      // the fact⋈fact join is the SMJ (or keyed hash join) on k=k whose
      // subtree must be exchange-free; broadcast dims sit above it
      val factJoin = nodes.collectFirst {
        case j: SortMergeJoinExec => j: SparkPlan
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j: SparkPlan
      }
      assert(factJoin.nonEmpty, s"no fact join found:\n${q.queryExecution}")
      val inside = all(factJoin.get).collect { case e: Exchange => e }
      assert(inside.isEmpty,
        s"fact⋈fact leg must be zero-exchange:\n${factJoin.get}")
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "dim decorates via broadcast above the SPJ")
      assert(q.count() == 5)
    }
  }

  test("COMPOSITE bucket keys: two-column co-bucketed join plans zero-exchange, sortless, exact") {
    // The scan reports one single-reference bucket(n, colᵢ) transform
    // PER COLUMN (Spark's SPJ machinery refuses multi-reference
    // transforms), each column hashed INDEPENDENTLY with murmur3, and
    // the per-column ids compose into a MIXED-RADIX partition index
    // (BucketLayout — there is no tuple-fold hash on disk). A fact⋈fact
    // join covering the compound key then needs no exchange AND no sort
    // on either side; a single-key layout can't serve this join.
    val r = java.nio.file.Files.createTempDirectory("graft-spj-comp").toString
    val st = new SnapshotStore(spark, r)
    // integer keys: a float/double join key gets wrapped in Spark's
    // NaN/zero normalization, which never matches a transform's raw
    // column reference — floats shuffle regardless of layout
    def mk(vcol: String, off: Int) = spark.range(0, 20000)
      .select((col("id") % 500).as("k1"), expr("id DIV 500").as("k2"),
        (col("id") + off).as(vcol))
    st.commitBucketed("pa", mk("va", 0), Seq("k1", "k2"), 8)
    st.commitBucketed("pb", mk("vb", 7), Seq("k1", "k2"), 8)
    spark.conf.set("spark.sql.catalog.spjc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjc.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = """SELECT a.k1 AS k1, a.k2 AS k2, va, vb
                |FROM spjc.pa a JOIN spjc.pb b
                |ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"composite co-bucketed join must not shuffle either side:\n$plan")
      assert(!plan.contains("Sort "),
        s"tuple-sorted single-file buckets skip the SMJ sorts too:\n$plan")
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == base._1 && base._1 == 20000L)
      assert(j.agg(sum("va"), sum("vb")).head() == base._2)
      // a bucketed append under the SAME composite spec keeps the layout
      st.appendBucketed("pa", Seq((9999L, 9999L, 1L)).toDF("k1", "k2", "va"),
        Seq("k1", "k2"), 8)
      val j2 = spark.sql(q)
      assert(!finalPlan(j2).contains("Exchange"),
        "composite bucketed append keeps the zero-exchange claim")
      assert(j2.count() == base._1, "the appended key has no pb match")
      // column-order mismatch is a DIFFERENT layout: refused loudly
      val bad = intercept[IllegalArgumentException](
        st.appendBucketed("pa", Seq((1L, 1L, 1L)).toDF("k1", "k2", "va"),
          Seq("k2", "k1"), 8))
      assert(bad.getMessage.contains("mixed layouts"))
      // a JOIN ON ONE column of the tuple cannot use the layout (the
      // hash needs both): it must still be CORRECT, just shuffled
      val partial = spark.sql(
        "SELECT count(*) AS n FROM spjc.pa a JOIN spjc.pb b ON a.k1 = b.k1")
      val partialBase = withSQLConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        spark.sql(
          "SELECT count(*) AS n FROM spjc.pa a JOIN spjc.pb b ON a.k1 = b.k1")
          .head().getLong(0)
      }
      assert(partial.head().getLong(0) == partialBase,
        "partial-key join must stay exact (claim unusable, never wrong)")
      // a sparse DV delete rides the composite claim (a vector only
      // subtracts rows within a file): join stays zero-exchange, exact
      st.delete("pa", col("va") === 42L)
      val j3 = spark.sql(q)
      assert(!finalPlan(j3).contains("Exchange"),
        "a DV delete keeps the composite zero-exchange claim")
      assert(j3.count() == base._1 - 1)
      // a KEY-moving UPDATE re-routes survivors through the composite
      // router (bucketClaimOf → mixed-radix token): the claim survives
      // only if the rewrite re-attributes rows to their NEW tuple bucket
      st.update("pa", col("k1") === 7L && col("k2") === 0L,
        Map("k1" -> lit(123456L)))
      assert(st.bucketLayoutOf("pa", st.latestVersion("pa").get)
        .contains((Seq("k1", "k2"), Seq(8, 8))),
        "a composite-key UPDATE must keep the full layout claim")
      val j4 = spark.sql(q)
      assert(!finalPlan(j4).contains("Exchange"),
        "composite claim survives the key-moving UPDATE")
      // the moved key has no pb match; the DV'd row stays gone
      assert(j4.count() == base._1 - 2)
    }
  }

  test("NON-UNIFORM composite dims (16, 4): zero-exchange sortless join, claim-guarded appends, restore keeps the layout") {
    // r19: per-column bucket counts follow per-column CARDINALITY — the
    // hot leading key gets 16 buckets, the low-card sub-key 4, instead
    // of n^k uniform fan-out. Everything the uniform composite claim
    // provides must hold unchanged: exchange-free sortless compound-key
    // join, appends validated against the exact dims vector, and a
    // backup/restore cycle that re-buckets with the same (16, 4).
    val r = java.nio.file.Files.createTempDirectory("graft-spj-nu").toString
    val st = new SnapshotStore(spark, r)
    // k1: ~2000 distinct (hot, 16 buckets); k2: 10 distinct (4 buckets)
    def mk(vcol: String, off: Int) = spark.range(0, 20000)
      .select((col("id") % 2000).as("k1"), expr("id DIV 2000").as("k2"),
        (col("id") + off).as(vcol))
    st.commitBucketed("nua", mk("va", 0), Seq("k1", "k2"), Seq(16, 4), None)
    st.commitBucketed("nub", mk("vb", 7), Seq("k1", "k2"), Seq(16, 4), None)
    assert(st.bucketLayoutOf("nua", st.latestVersion("nua").get)
      .contains((Seq("k1", "k2"), Seq(16, 4))))
    spark.conf.set("spark.sql.catalog.spjnu", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjnu.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = """SELECT a.k1 AS k1, a.k2 AS k2, va, vb
                |FROM spjnu.nua a JOIN spjnu.nub b
                |ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"non-uniform co-bucketed join must not shuffle either side:\n$plan")
      assert(!plan.contains("Sort "),
        s"tuple-sorted single-file buckets skip the SMJ sorts too:\n$plan")
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == base._1 && base._1 == 20000L)
      assert(j.agg(sum("va"), sum("vb")).head() == base._2)
      // an append must match the exact DIMS VECTOR, not just the columns:
      // uniform 16 on both columns is a DIFFERENT layout — refused
      val bad = intercept[IllegalArgumentException](
        st.appendBucketed("nua", Seq((1L, 1L, 1L)).toDF("k1", "k2", "va"),
          Seq("k1", "k2"), 16))
      assert(bad.getMessage.contains("mixed layouts"))
      // the matching (16, 4) append keeps the claim
      st.appendBucketed("nua", Seq((99999L, 0L, 1L)).toDF("k1", "k2", "va"),
        Seq("k1", "k2"), Seq(16, 4))
      val j2 = spark.sql(q)
      assert(!finalPlan(j2).contains("Exchange"),
        "non-uniform bucketed append keeps the zero-exchange claim")
      assert(j2.count() == base._1, "the appended key has no nub match")
      // backup → restore into a fresh store: the (16, 4) layout claim
      // survives the cycle (r18 refused non-uniform dims at restore)
      val out = java.nio.file.Files.createTempDirectory("graft-spj-nu-bk").toString
      graft.sources.Sinks.backupStore(spark, st, Seq("nua"), out)
      val dstRoot = java.nio.file.Files.createTempDirectory("graft-spj-nu-dst").toString
      val dst = new SnapshotStore(spark, dstRoot)
      graft.sources.Sinks.restoreStore(spark, dst, out)
      assert(dst.bucketLayoutOf("nua", dst.latestVersion("nua").get)
        .contains((Seq("k1", "k2"), Seq(16, 4))),
        "restore must re-bucket with the same non-uniform dims")
      assert(dst.read("nua").count() == 20001L)
    }
  }

  test("merge fan-in cap: a chain past MaxSortedRunsPerBucket drops the claim, stays exact") {
    // an unbounded append chain would hold one open reader per run in
    // the merge — past the cap the ordering claim yields to a plain
    // sort (cheaper than executor memory), the LAYOUT claim stays.
    // The AUTO-FOLD (r19) would normally collapse the chain before the
    // cap is ever crossed — raise its seam so this test can still pin
    // the scan-side safety net the cap provides.
    val r = java.nio.file.Files.createTempDirectory("graft-spj-cap").toString
    val st = new SnapshotStore(spark, r)
    st.sortedRunFoldCap = Int.MaxValue // pin the claim-drop path itself
    st.commitBucketed("ca2", spark.range(0, 800)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 2)
    st.commitBucketed("cb2", spark.range(0, 800)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 2)
    // 800 keys over 2 buckets: every append lands runs in both buckets
    (1 to graft.sources.GraftTable.MaxSortedRunsPerBucket).foreach { i =>
      st.appendBucketed("ca2", spark.range(800L + i * 10, 810L + i * 10)
        .select(col("id").as("k"), (col("id") * 3).as("va")), "k", 2)
    }
    spark.conf.set("spark.sql.catalog.spjcap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjcap.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = "SELECT a.k AS k, va, vb FROM spjcap.ca2 a JOIN spjcap.cb2 b ON a.k = b.k"
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"the LAYOUT claim survives any append count:\n$plan")
      assert(plan.contains("Sort "),
        s"past the fan-in cap the ordering claim must drop (SMJ sorts):\n$plan")
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        spark.sql(q).count()
      }
      assert(j.count() == base)
      // compact collapses the runs: the sortless path returns
      st.compact("ca2")
      val j2 = spark.sql(q)
      assert(!finalPlan(j2).contains("Sort "),
        "compact restores the sortless SMJ")
      assert(j2.count() == base)
    }
  }

  test("AUTO-FOLD on run fan-in: the over-cap append compacts first, the claim never lapses, appenders can't starve it") {
    // r19: appendBucketed folds the chain BEFORE its delta would cross
    // MaxSortedRunsPerBucket — the fold is IN the append path, so the
    // sortless claim needs no manual graft_compact and a sustained
    // appender cannot starve it (every over-cap appender is a folder).
    val r = java.nio.file.Files.createTempDirectory("graft-spj-afold").toString
    val st = new SnapshotStore(spark, r)
    st.sortedRunFoldCap = 4 // cheap trigger; semantics identical at 32
    st.commitBucketed("fa", spark.range(0, 400)
      .select(col("id").as("k"), (col("id") * 2).as("va")), "k", 2)
    st.commitBucketed("fb", spark.range(0, 400)
      .select(col("id").as("k"), (col("id") + 7).as("vb")), "k", 2)
    // appends 1..3 bring the fullest bucket to the cap of 4 runs; the
    // 4th append must fold first (history gains a compact link) and the
    // chain stays at ≤ 2 runs after it
    (1 to 3).foreach { i =>
      st.appendBucketed("fa", spark.range(400L + i * 10, 410L + i * 10)
        .select(col("id").as("k"), (col("id") * 3).as("va")), "k", 2)
    }
    val histBefore = st.history("fa").size
    st.appendBucketed("fa", spark.range(900L, 910L)
      .select(col("id").as("k"), (col("id") * 3).as("va")), "k", 2)
    assert(st.history("fa").size >= histBefore + 2,
      "the over-cap append must land a fold link AND its delta link")
    spark.conf.set("spark.sql.catalog.spjaf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjaf.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = "SELECT a.k AS k, va, vb FROM spjaf.fa a JOIN spjaf.fb b ON a.k = b.k"
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"), s"layout claim intact:\n$plan")
      assert(!plan.contains("Sort "),
        s"auto-fold keeps the chain under the cap — SMJ stays sortless:\n$plan")
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        spark.sql(q).count()
      }
      assert(j.count() == base && base == 400L)
    }
    // RACING appenders: two threads append past the cap repeatedly; the
    // fold happens inside whoever crosses it, nobody throws, every row
    // lands exactly once, and the final chain is back under the cap
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (0 until 2).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val mine = new SnapshotStore(spark, r)
            mine.sortedRunFoldCap = 4
            (1 to 6).foreach { i =>
              val lo = 10000L + w * 1000L + i * 10L
              mine.appendBucketed("fa", spark.range(lo, lo + 5)
                .select(col("id").as("k"), (col("id") * 3).as("va")), "k", 2)
            }
          } catch { case t: Throwable => failures.add(t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(failures.isEmpty, s"racing bucketed appenders must never fail " +
      s"on the fold: ${Option(failures.peek())}")
    assert(st.read("fa").count() == 400L + 4 * 10L + 2 * 6 * 5L,
      "every append landed exactly once through the folds")
    val head = st.latestVersion("fa").get
    assert(st.bucketLayoutOf("fa", head).contains((Seq("k"), Seq(2))),
      "the layout claim survived the racing folds")
  }

  test("q115 shape: edge-store Adamic-Adar keeps ONE exchange (the pair aggregate)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(all)
    }
    def exchanges(q: org.apache.spark.sql.DataFrame): Int = {
      q.collect()
      all(q.queryExecution.executedPlan).count(_.isInstanceOf[Exchange])
    }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // the store twin: degree agg, degree join, postings collect all ride
      // the dst bucket layout — only the supplier-pair aggregate (a
      // different key by nature) may shuffle
      val store = exchanges(
        SparkEntry.queries("q115_adamic_adar_store")(spark, sf0001))
      assert(store == 1,
        s"store-bucketed Adamic-Adar must shuffle ONLY the pair stream, got $store exchanges")
      // the raw-parquet original pays the edge-stream shuffles the layout deletes
      val raw = exchanges(SparkEntry.queries("q87_adamic_adar")(spark, sf0001))
      assert(raw > store, s"q87 over raw parquet shuffles more ($raw) than the store twin ($store)")
      // value parity between the two layouts
      val a = SparkEntry.queries("q115_adamic_adar_store")(spark, sf0001).collect()
      val b = SparkEntry.queries("q87_adamic_adar")(spark, sf0001).collect()
      assert(a.toSeq == b.toSeq, "the two layouts must agree row for row")
      // q117: degree over the node-bucketed adjacency store — ZERO
      // exchanges (partial sums per bucket, TakeOrdered on top)
      val deg = exchanges(SparkEntry.queries("q117_degree_store")(spark, sf0001))
      assert(deg == 0,
        s"adjacency-store degree must aggregate with NO shuffle, got $deg")
      val da = SparkEntry.queries("q117_degree_store")(spark, sf0001).collect()
      val db = SparkEntry.queries("q21_degree")(spark, sf0001).collect()
      assert(da.toSeq == db.toSeq, "degree layouts must agree row for row")
    }
  }

  test("q116 shape: composite-key fact join leg is exchange-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(all)
    }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = SparkEntry.queries("q116_composite_spj")(spark, sf0001)
      q.collect()
      val nodes = all(q.queryExecution.executedPlan)
      val factJoin = nodes.collectFirst {
        case j: SortMergeJoinExec => j: SparkPlan
        case j: ShuffledHashJoinExec => j: SparkPlan
      }
      assert(factJoin.nonEmpty, s"no fact join found:\n${q.queryExecution}")
      val inside = all(factJoin.get).collect { case e: Exchange => e }
      assert(inside.isEmpty,
        s"composite-key fact join must be zero-exchange:\n${factJoin.get}")
    }
  }

  test("ordering claim survives FILE SPLITS: multi-split bucket files read in offset order") {
    // A bucket file larger than maxPartitionBytes arrives as multiple
    // PartitionedFiles; FileScan packs splits length-descending, so
    // encounter order is not guaranteed to be offset order. The keyed
    // scan re-sorts each bucket's splits by (path, start) — under the
    // bucketSorted claim, anything else would hand the sort-skipping SMJ
    // out-of-order rows (silent wrong joins on any Spark packing change).
    val r = java.nio.file.Files.createTempDirectory("graft-spj-split").toString
    val st = new SnapshotStore(spark, r)
    val hc = spark.sparkContext.hadoopConfiguration
    val savedBlock = Option(hc.get("parquet.block.size"))
    hc.set("parquet.block.size", "32768") // many row groups per bucket file
    try {
      st.commitBucketed("xa", spark.range(0, 100000)
        .select((col("id") * 7919 % 100000).as("k"), (col("id") * 2).as("va")),
        "k", 2)
      st.commitBucketed("xb", spark.range(0, 100000)
        .select((col("id") * 104729 % 100000).as("k"), (col("id") + 7).as("vb")),
        "k", 2)
    } finally savedBlock match {
      case Some(v) => hc.set("parquet.block.size", v)
      case None => hc.unset("parquet.block.size")
    }
    spark.conf.set("spark.sql.catalog.spjx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjx.root", r)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "65536", // force splits
      "spark.sql.files.openCostInBytes" -> "0") {
      val q = "SELECT a.k AS k, va, vb FROM spjx.xa a JOIN spjx.xb b ON a.k = b.k"
      val j = spark.sql(q)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange") && !plan.contains("Sort "),
        s"split files keep the sortless SPJ:\n$plan")
      // the planned keyed partitions must (a) actually contain multi-split
      // files — or the test exercises nothing — and (b) be offset-ordered
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.SparkPlan
      def all(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case other => other.children
        }
        p +: kids.flatMap(all)
      }
      val parts = all(j.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[
              org.apache.spark.sql.graftbridge.GraftRuntimeFiltering] =>
          b.inputPartitions
      }.flatten.collect {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp
      }
      assert(parts.nonEmpty, "keyed graft scans must plan FilePartitions")
      val splitCounts = parts.flatMap(_.files.groupBy(_.filePath.toString)
        .values.map(_.length))
      assert(splitCounts.exists(_ > 1),
        s"fixture must produce multi-split files (got $splitCounts) — " +
          "shrink maxPartitionBytes if parquet sizing changed")
      parts.foreach { fp =>
        val keys = fp.files.map(f => (f.filePath.toString, f.start)).toSeq
        assert(keys == keys.sorted,
          s"bucket partition splits must be (path, offset)-ordered: $keys")
      }
      // values exact vs the claim-free shuffled join
      val base = withSQLConf("spark.sql.sources.v2.bucketing.enabled" -> "false") {
        val p = spark.sql(q)
        (p.count(), p.agg(sum("va"), sum("vb")).head())
      }
      assert(j.count() == base._1)
      assert(j.agg(sum("va"), sum("vb")).head() == base._2)
    }
  }
}
