package graft

import org.apache.spark.sql.functions._
import graft.functions.{CapList, CapSetAggregator}

/** Pins the capped-set aggregator behind the r19 single-pass Adamic-Adar
  * postings (q87/q115): cap semantics at the unit level, and the fused
  * pipeline's exactness against the multi-pass form it replaced. */
class CapSetSpec extends SparkSpec {

  test("reduce dedups, skips NULL, and stops growing at the cap") {
    val a = new CapSetAggregator(3)
    var buf = a.zero
    Seq(5L, 5L, 7L, 7L, 5L).foreach(v => buf = a.reduce(buf, v))
    assert(buf === Set(5L, 7L))
    buf = a.reduce(buf, null)
    assert(buf === Set(5L, 7L))
    buf = a.reduce(buf, 9L)
    assert(buf.size === 3)
    buf = a.reduce(buf, 11L) // at cap: must not grow
    assert(buf.size === 3 && !buf.contains(11L))
  }

  test("merge dedups across partials and respects the cap") {
    val a = new CapSetAggregator(4)
    val m = a.merge(Set(1L, 2L, 3L), Set(3L, 4L, 5L))
    assert(m.size === 4 && Set(1L, 2L, 3L).subsetOf(m))
    // under-cap groups merge exactly
    assert(a.merge(Set(1L, 2L), Set(2L, 3L)) === Set(1L, 2L, 3L))
  }

  test("grouped capSet equals collect_set exactly for groups below the cap") {
    import spark.implicits._
    val rows = for {
      k <- 1 to 20; i <- 1 to (k % 7 + 1); _ <- 1 to 2 // duplicates on purpose
    } yield (k, (k * 100 + i).toLong)
    val df = rows.toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(array_sort(CapList.capSet(100)($"v")).as("s"))
      .orderBy($"k").collect().map(_.getSeq[Long](1))
    val want = df.groupBy($"k")
      .agg(array_sort(collect_set($"v")).as("s"))
      .orderBy($"k").collect().map(_.getSeq[Long](1))
    assert(got.toSeq === want.toSeq)
  }

  test("q87 single-pass postings match the multi-pass degree-join replay") {
    val dir = sf0001
    // the replaced shape, replayed literally: distinct edges, degree agg,
    // join, filter, collect — the r18 pipeline
    val e = graft.queries.GraphQueries.edges(spark, dir)
    val deg = e.groupBy(col("dst")).agg(count(lit(1)).as("deg"))
    val sk = expr("substring(src, 2)").cast("long")
    val want = e.join(deg, "dst")
      .where(col("deg") >= 2 &&
        col("deg") <= graft.queries.GraphQueries.AdamicAdarDegreeCeiling)
      .select(col("dst"), col("deg"), sk.as("sk"))
      .groupBy(col("dst"), col("deg"))
      .agg(array_sort(collect_list(col("sk"))).as("ids"))
      .orderBy(col("dst"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    val got = graft.queries.GraphQueries.postingsForTest(spark, dir)
      .orderBy(col("dst"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    assert(got.toSeq === want.toSeq)
  }
}
