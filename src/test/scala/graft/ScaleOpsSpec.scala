package graft

import org.apache.spark.sql.functions._
import graft.functions.TopK
import graft.operators.RuntimeFilter

/** The two explicit scale-path operators: Bloom runtime-filter join
  * (semantics-preserving semi-join reduction) and the bounded top-k
  * aggregate (map-side-combinable replacement for window top-k). Both are
  * checked for exact equality against the naive formulation they replace,
  * plus the approximate-sketch scale aids (HLL distinct, approx quantile)
  * for bounded error against exact answers. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin returns exactly the plain join's rows") {
    // 1000 fact rows over 100 keys; dim keeps a 7-key sliver. Low
    // expectedKeys + high fpp force real false positives through the
    // filter, which the exact join behind it must absorb.
    val fact = (0 until 1000).map(i => (i.toLong, i.toLong % 100, i * 1.5))
      .toDF("row_id", "k", "v")
    val dim = Seq(3L, 17L, 31L, 55L, 68L, 77L, 94L)
      .map(k => (k, s"dim$k")).toDF("dk", "name")
    val pruned = RuntimeFilter.bloomPrunedJoin(fact, dim, "k", "dk",
      expectedKeys = 8, fpp = 0.3)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(pruned.select("row_id", "k", "dk", "name").except(
      plain.select("row_id", "k", "dk", "name")).isEmpty)
    assert(plain.select("row_id", "k", "dk", "name").except(
      pruned.select("row_id", "k", "dk", "name")).isEmpty)
    assert(pruned.count() === plain.count())
  }

  test("bloomPrunedJoin passes no null-key fact rows and prunes the rest") {
    val fact = Seq(Some(1L), None, Some(2L), Some(99L))
      .toDF("k").withColumn("row_id", monotonically_increasing_id())
    val dim = Seq(1L).toDF("dk")
    val out = RuntimeFilter.bloomPrunedJoin(fact, dim, "k", "dk")
    assert(out.select("k").as[Long].collect().toSeq === Seq(1L))
  }

  test("bloomPrunedJoin on an empty build side returns empty without crashing") {
    // stat.bloomFilter NPEs on zero rows; the operator must detect the
    // empty dim up front and return the (empty) exact join result.
    val fact = (1L to 100L).toDF("k")
    val dim = Seq(1L).toDF("dk").where($"dk" > 100)
    assert(RuntimeFilter.bloomPrunedJoin(fact, dim, "k", "dk").isEmpty)
  }

  test("topK aggregate equals the window row_number formulation") {
    // Scores engineered with ties (i % 7) so the key tiebreak is exercised.
    val df = (0 until 500).map(i => (s"g${i % 5}", (i % 7).toDouble, f"k$i%03d"))
      .toDF("g", "score", "key")
    val topk = TopK.topK(3)
    val viaAgg = df.groupBy($"g").agg(topk($"score", $"key").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rn"),
        $"col.score".as("score"), $"col.key".as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"key".asc)
    val viaWindow = df.withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" <= 3).select($"g", $"rn", $"score", $"key")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("topK buffer stays bounded and merge keeps the global best") {
    val agg = new graft.functions.TopKAggregator(2)
    val s = (d: Double, k: String) => graft.functions.Scored(d, k)
    val left = List(s(9.0, "a"), s(5.0, "b"))
    val right = List(s(7.0, "c"), s(6.0, "d"))
    assert(agg.merge(left, right) === List(s(9.0, "a"), s(7.0, "c")))
    // reduce on a full buffer with a worse element is a no-op
    assert(agg.reduce(left, s(1.0, "z")) === left)
    // ties break on key ascending
    assert(agg.reduce(left, s(9.0, "A")) === List(s(9.0, "A"), s(9.0, "a")))
  }

  test("pointInInterval equals the theta join, including bucket-boundary hits") {
    // Points sit exactly on bucket edges and interval endpoints (inclusive
    // both ends); intervals span 0, 1, and many buckets, plus an empty
    // lo > hi interval that must vanish.
    val points = Seq(0L, 9L, 10L, 19L, 20L, 25L, 99L, 100L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "pt")
    val intervals = Seq(
      (1L, 0L, 9L),    // exactly bucket 0
      (2L, 5L, 25L),   // spans 3 buckets
      (3L, 20L, 20L),  // degenerate single point
      (4L, 90L, 100L), // ends on a bucket edge
      (5L, 50L, 40L)   // empty: lo > hi
    ).toDF("iid", "lo", "hi")
    val out = graft.operators.RangeJoin.pointInInterval(
      points, intervals, "pt", "lo", "hi", bucketWidth = 10L)
    val theta = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    assert(out.select("pid", "iid").except(theta.select("pid", "iid")).isEmpty)
    assert(theta.select("pid", "iid").except(out.select("pid", "iid")).isEmpty)
    assert(out.count() === theta.count())
  }

  test("pointInInterval equals the theta join on seeded random workloads") {
    val rnd = new scala.util.Random(42L)
    // Negative values exercise the floor-division bucketing; width 7 is
    // deliberately coprime to nothing in the data.
    val points = Seq.tabulate(300)(i => (i.toLong, rnd.between(-500L, 500L)))
      .toDF("pid", "pt")
    val intervals = Seq.tabulate(80) { i =>
      val lo = rnd.between(-500L, 480L)
      (i.toLong, lo, lo + rnd.between(0L, 60L))
    }.toDF("iid", "lo", "hi")
    val out = graft.operators.RangeJoin.pointInInterval(
      points, intervals, "pt", "lo", "hi", bucketWidth = 7L)
    val theta = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    assert(out.count() === theta.count())
    assert(out.select("pid", "iid").except(theta.select("pid", "iid")).isEmpty)
    assert(theta.select("pid", "iid").except(out.select("pid", "iid")).isEmpty)
  }

  test("intervalAggregate bounds a degenerate hot bucket and stays exact") {
    // 10^6 points all landing in ONE bucket: the dedup pre-pass collapses
    // them to 3600 distinct (value, count) entries, and maxBucketRows =
    // 1024 then forces the hot-bucket hash-split into 4 sub-arrays. The
    // split plan must produce results identical to the unsplit plan —
    // counts add (through the prefix-sums arrays), mins min.
    val n = 1000000
    val points = spark.range(n.toLong)
      .select((col("id") % 3600).as("pt")) // all within one 1-hour bucket
    val intervals = Seq(
      (1L, 0L, 3599L),     // whole bucket
      (2L, 100L, 200L),    // interior slice
      (3L, 3599L, 7200L),  // straddles into the empty neighbor bucket
      (4L, 4000L, 5000L)   // fully in the empty neighbor — no points
    ).toDF("iid", "lo", "hi")
    def run(cap: Int) = graft.operators.RangeJoin.intervalAggregate(
        points, intervals, "pt", "lo", "hi", bucketWidth = 3600L,
        maxBucketRows = cap)
      .select($"iid", $"n_points", $"min_pt")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val split = run(1024)
    val unsplit = run(Int.MaxValue)
    assert(split == unsplit)
    // per = n/3600 occurrences of each value in [0, 3600)
    val per = n / 3600L
    val rem = n % 3600L // values < rem occur once more
    def cnt(lo: Long, hi: Long): Long =
      (lo to hi).filter(v => v >= 0 && v < 3600)
        .map(v => per + (if (v < rem) 1L else 0L)).sum
    assert(split == Seq((1L, cnt(0, 3599), 0L), (2L, cnt(100, 200), 100L),
      (3L, cnt(3599, 3599), 3599L)))
  }

  test("intervalAggregate stays exact over identical-valued points") {
    // Every point carries the SAME value — the boilerplate-timestamp
    // degenerate case. With multiplicity carried as a count column the
    // whole pile collapses to ONE dedup row (no split needed, no 200k-long
    // array materialized anywhere), and the count must still be exact.
    val n = 200000
    val same = spark.range(n.toLong).select(lit(1000L).as("pt"))
    val intervals = Seq((1L, 0L, 2000L), (2L, 1500L, 2000L)).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin.intervalAggregate(
        same, intervals, "pt", "lo", "hi", bucketWidth = 3600L,
        maxBucketRows = 8192)
      .select($"iid", $"n_points", $"min_pt")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, n.toLong, 1000L)))
  }

  test("hot-bucket sub assignment is deterministic in the value (retry-safe)") {
    // A partial stage retry recomputes some map tasks while others'
    // outputs survive; the sub key must therefore be a pure function of
    // row content (SPARK-23207 class of bug otherwise). Distinct values
    // must also spread near-evenly so the memory cap actually binds.
    val sizes = spark.range(200000L)
      .select(pmod(hash(col("id")), lit(16)).as("__sub"))
      .groupBy("__sub").count().select("count").as[Long].collect()
    assert(sizes.length == 16, "distinct values must reach every sub")
    assert(sizes.max <= (200000 / 16) * 2,
      s"no sub may hold more than ~2x its fair share (got max ${sizes.max})")
    // Exactness when the split DOES engage on distinct values: 40k
    // distinct points in one bucket, cap 1k → 40 sub-arrays.
    val points = spark.range(40000L).select(col("id").as("pt"))
    val intervals = Seq((1L, 0L, 39999L), (2L, 100L, 199L)).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin.intervalAggregate(
        points, intervals, "pt", "lo", "hi", bucketWidth = 65536L,
        maxBucketRows = 1000)
      .select($"iid", $"n_points", $"min_pt")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 40000L, 0L), (2L, 100L, 100L)))
  }

  test("corpus-card sketch twins land within 2% of exact at sf0.1") {
    // The approx_count_distinct variants behind the dataset-card API: the
    // sketch's shuffle is vocabulary-size-independent (one HLL++ sketch
    // per partition instead of one row per distinct token), so at corpus
    // scale it is the only viable dashboard path — but only if it is
    // actually close. rsd = 0.01 → the 2% bound is ~2 sigma.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def cardMap(exact: Boolean) =
      graft.queries.TextQueries.datasetCard(docs, exact = exact)
        .select($"lang", $"n_unique", $"vocab_size")
        .as[(String, Long, Long)].collect()
        .map { case (l, u, v) => l -> ((u, v)) }.toMap
    val ex = cardMap(exact = true)
    val ap = cardMap(exact = false)
    assert(ex.keySet == ap.keySet)
    for (lang <- ex.keys) {
      val ((eu, ev), (au, av)) = (ex(lang), ap(lang))
      assert(math.abs(au - eu).toDouble / eu <= 0.02, s"$lang n_unique $au vs $eu")
      assert(math.abs(av - ev).toDouble / ev <= 0.02, s"$lang vocab $av vs $ev")
    }
    val vexact = graft.queries.TextQueries.vocabSize(docs, exact = true)
    val vapprox = graft.queries.TextQueries.vocabSize(docs, exact = false)
    assert(math.abs(vapprox - vexact).toDouble / vexact <= 0.02,
      s"global vocab $vapprox vs $vexact")
  }

  test("heavy hitters are exact under forced sketch eviction") {
    // 3 planted heavy tokens (>5% each) in a long tail of 400 distinct
    // rares; phi = 0.02 gives sketch capacity 100 << 403 distinct, so the
    // Misra-Gries eviction path genuinely runs and must still keep every
    // heavy candidate for the exact recount.
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(200)("gamma")
    val tail = (0 until 400).flatMap(i => Seq.fill(8)(s"rare$i"))
    val df = new scala.util.Random(7L).shuffle(heavy ++ tail).toDF("token")
      .repartition(7) // heavy items spread across partitions → merges evict
    val n = heavy.size + tail.size
    val out = graft.operators.HeavyHitters.exact(df, "token", phi = 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = Map("alpha" -> 300L, "beta" -> 250L, "gamma" -> 200L)
      .filter { case (_, c) => c > 0.02 * n }
    assert(out === expected)
  }

  test("heavy hitters stay exact when the grain map flushes mid-partition") {
    // r20 single-pass shape: the bounded exact-count map flushes to the
    // grain when it hits flushEntries, splitting a token's per-partition
    // count across grain rows — the downstream sum must re-merge them
    // exactly. flushEntries = 16 << 403 distinct forces many flushes per
    // partition; the result must be identical to the unflushed run.
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(200)("gamma")
    val tail = (0 until 400).flatMap(i => Seq.fill(8)(s"rare$i"))
    val df = new scala.util.Random(11L).shuffle(heavy ++ tail).toDF("token")
      .repartition(5)
    val n = heavy.size + tail.size
    val flushed = graft.operators.HeavyHitters
      .exact(df, "token", phi = 0.02, flushEntries = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = Map("alpha" -> 300L, "beta" -> 250L, "gamma" -> 200L)
      .filter { case (_, c) => c > 0.02 * n }
    assert(flushed === expected)
  }

  test("misra-gries merge keeps every phi-heavy item across any split") {
    val agg = new graft.operators.MisraGriesAggregator(4)
    // 40% of the stream is "hot": with capacity 4 (ε = 1/5 = 20% < 40%)
    // it must survive both orders of a lopsided merge.
    val part1 = Seq("hot", "a", "b", "hot", "c", "hot", "d", "e")
      .foldLeft(agg.zero)(agg.reduce)
    val part2 = Seq("hot", "f", "hot", "g", "hot", "h", "hot", "i")
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(part1, part2).contains("hot"))
    assert(agg.merge(part2, part1).contains("hot"))
    assert(agg.merge(part1, part2).size <= 4)
  }

  test("approximate sketches land within bounds of exact answers") {
    val df = (0 until 20000).map(i => (i % 1377).toLong).toDF("v")
    val exactD = df.select(countDistinct($"v")).as[Long].head()
    val approxD = df.select(approx_count_distinct($"v", 0.02)).as[Long].head()
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL estimate $approxD vs exact $exactD")
    val exactMedian = df.stat.approxQuantile("v", Array(0.5), 0.0).head
    val approxMedian = df.stat.approxQuantile("v", Array(0.5), 0.01).head
    assert(math.abs(approxMedian - exactMedian) <= 0.02 * 1377)
  }
}
