package graft

import org.apache.spark.sql.functions._
import graft.functions.LowerBound

/** lower_bound semantics (first index ≥ key over a sorted array<long>)
  * across the interpreted and codegen paths, boundaries, duplicates, and
  * null propagation. */
class LowerBoundSpec extends SparkSpec {
  import spark.implicits._

  private def lb(arr: Seq[Long], key: Long): Int =
    Seq((arr, key)).toDF("a", "k")
      .select(LowerBound(col("a"), col("k")).as("i"))
      .head().getInt(0)

  test("first index >= key, duplicates land on the first occurrence") {
    val a = Seq(2L, 4L, 4L, 4L, 9L)
    assert(lb(a, 1) == 0)
    assert(lb(a, 2) == 0)
    assert(lb(a, 3) == 1)
    assert(lb(a, 4) == 1) // first of the duplicate run
    assert(lb(a, 5) == 4)
    assert(lb(a, 9) == 4)
    assert(lb(a, 10) == 5) // size when nothing qualifies
    assert(lb(Seq.empty, 7) == 0)
  }

  test("count-in-range via two probes matches a filter scan on random data") {
    val rnd = new scala.util.Random(7)
    val arr = Seq.fill(500)(rnd.nextInt(1000).toLong).sorted
    for (_ <- 1 to 50) {
      val lo = rnd.nextInt(1100).toLong - 50
      val hi = lo + rnd.nextInt(300)
      val expected = arr.count(x => x >= lo && x <= hi)
      val got = Seq((arr, lo, hi)).toDF("a", "lo", "hi")
        .select((LowerBound(col("a"), col("hi") + 1) -
          LowerBound(col("a"), col("lo"))).as("c"))
        .head().getInt(0)
      assert(got == expected, s"[$lo,$hi]")
    }
  }

  test("interpreted eval equals the codegen path") {
    val df = (1 to 200).map { i =>
      (Seq.tabulate(i % 20)(j => (j * 3).toLong), (i % 60).toLong)
    }.toDF("a", "k")
    val q = df.select(LowerBound(col("a"), col("k")))
    val viaCodegen = q.collect().map(_.getInt(0))
    // Spark's OWN interpreted path (nullSafeEval) — the one constant
    // folding and NO_CODEGEN fall back to — not a scratch Scala
    // reimplementation, so a codegen/eval divergence in the expression
    // itself would fail here.
    val viaInterpreted =
      withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
          "spark.sql.codegen.wholeStage" -> "false") {
        q.collect().map(_.getInt(0))
      }
    assert(viaCodegen.toSeq == viaInterpreted.toSeq)
    // And the reference semantics, for good measure.
    val expected = df.collect().map { r =>
      val arr = r.getSeq[Long](0)
      val key = r.getLong(1)
      arr.indexWhere(_ >= key) match { case -1 => arr.size; case i => i }
    }
    assert(viaCodegen.toSeq == expected.toSeq)
  }

  test("null array or null key yields null") {
    val r = Seq((Some(Seq(1L, 2L)), None: Option[Long]),
        (None: Option[Seq[Long]], Some(1L)))
      .toDF("a", "k")
      .select(LowerBound(col("a"), col("k")).as("i"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }
}

/** prefix_sums semantics (exclusive prefix, n+1 entries) across the
  * interpreted and codegen paths, plus the count-in-range composition with
  * lower_bound that intervalAggregate relies on. */
class PrefixSumsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.PrefixSums

  test("exclusive prefix with total as the last entry") {
    val got = Seq(Tuple1(Seq(3L, 1L, 4L, 1L, 5L))).toDF("a")
      .select(PrefixSums(col("a")).as("p")).head().getSeq[Long](0)
    assert(got == Seq(0L, 3L, 4L, 8L, 9L, 14L))
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("a")
      .select(PrefixSums(col("a")).as("p")).head().getSeq[Long](0)
    assert(empty == Seq(0L))
  }

  test("interpreted eval equals the codegen path") {
    val df = (1 to 100).map(i => Tuple1(Seq.tabulate(i % 13)(j => (i * j % 7).toLong)))
      .toDF("a")
    val q = df.select(PrefixSums(col("a")))
    val viaCodegen = q.collect().map(_.getSeq[Long](0))
    val viaInterpreted =
      withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
          "spark.sql.codegen.wholeStage" -> "false") {
        q.collect().map(_.getSeq[Long](0))
      }
    assert(viaCodegen.toSeq == viaInterpreted.toSeq)
    val expected = df.collect().map(r => r.getSeq[Long](0).scanLeft(0L)(_ + _))
    assert(viaCodegen.toSeq == expected.toSeq)
  }

  test("count-in-range over (distinct values, counts) matches the raw scan") {
    // The intervalAggregate kernel: raw points dedup to sorted distinct
    // values + counts; contained count = prefix[lb(hi+1)] - prefix[lb(lo)].
    val rnd = new scala.util.Random(13)
    val raw = Seq.fill(2000)(rnd.nextInt(80).toLong)
    val grouped = raw.groupBy(identity).toSeq.sortBy(_._1)
    val vals = grouped.map(_._1)
    val cnts = grouped.map(_._2.size.toLong)
    for (_ <- 1 to 40) {
      val lo = rnd.nextInt(100).toLong - 10
      val hi = lo + rnd.nextInt(40)
      val got = Seq((vals, cnts, lo, hi)).toDF("v", "c", "lo", "hi")
        .select((element_at(PrefixSums(col("c")),
            graft.functions.LowerBound(col("v"), col("hi") + 1) + lit(1)) -
          element_at(PrefixSums(col("c")),
            graft.functions.LowerBound(col("v"), col("lo")) + lit(1))).as("n"))
        .head().getLong(0)
      assert(got == raw.count(x => x >= lo && x <= hi), s"[$lo,$hi]")
    }
  }

  test("null array yields null") {
    val r = Seq(Tuple1(None: Option[Seq[Long]])).toDF("a")
      .select(PrefixSums(col("a")).as("p")).collect()
    assert(r.forall(_.isNullAt(0)))
  }
}
