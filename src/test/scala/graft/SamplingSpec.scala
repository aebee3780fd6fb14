package graft

import org.apache.spark.sql.functions._
import graft.queries.SamplingQueries

/** Corpus-curation operators: stratified-sample determinism and exact
  * per-stratum counts, quantile interpolation, bigram totals, int8
  * quantization range invariants. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample is deterministic with exact per-stratum counts") {
    val q = SamplingQueries.queries("q50_stratified_sample")
    val a = q(spark, sf0001).collect()
    val b = q(spark, sf0001).collect()
    assert(a.sameElements(b)) // hash order, not RNG: reruns are identical
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ <= 30))
    // ranks are 1..n dense per stratum
    a.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length))
    }
  }

  test("quantile calibration: p50 <= p90, counts cover all docs") {
    val out = SamplingQueries.queries("q51_quantile_calibration")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2)) // p50 <= p90
      assert(r.getLong(3) > 0)
    }
    val total = out.map(_.getLong(3)).sum
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(total == nDocs)
  }

  test("bigram counts: top-20, descending with lexicographic tiebreak") {
    val out = SamplingQueries.queries("q52_bigrams")(spark, sf0001).collect()
    assert(out.length <= 20)
    val pairs = out.map(r => (r.getLong(1), r.getString(0)))
    pairs.sliding(2).foreach {
      case Array((n1, b1), (n2, b2)) =>
        assert(n1 > n2 || (n1 == n2 && b1 < b2))
      case _ =>
    }
  }

  test("plan shapes: top-k never global-sorts, quantization never shuffles," +
      " sampling shuffles only on the stratum key") {
    val bg = SamplingQueries.queries("q52_bigrams")(spark, sf0001)
    assert(bg.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val qz = SamplingQueries.queries("q53_quantize_int8")(spark, sf0001)
    // per-row column math: no hash shuffle anywhere (only the output sort)
    assert(!qz.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    val ss = SamplingQueries.queries("q50_stratified_sample")(spark, sf0001)
    assert(ss.queryExecution.executedPlan.toString.contains("hashpartitioning(lang"))
  }

  test("domain mixture: weights normalize to 1 and upsample small domains") {
    val out = SamplingQueries.queries("q63_domain_mixture")(spark, sf0001)
      .select($"n_tokens", $"weight", $"token_share")
      .as[(Long, Double, Double)].collect()
    assert(out.length > 1)
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-3)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
    // sqrt temperature: every domain below-average in tokens gets
    // weight > token_share (upsampled), every above-average one less
    out.foreach { case (_, w, share) =>
      val avgShare = 1.0 / out.length
      if (share < avgShare * 0.5) assert(w > share)
    }
  }

  test("shard assignment partitions the corpus exactly and reproducibly") {
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    val run1 = SamplingQueries.queries("q64_shard_assign")(spark, sf0001).collect()
    assert(run1.map(_.getLong(1)).sum == total) // every doc in exactly one shard
    assert(run1.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    val run2 = SamplingQueries.queries("q64_shard_assign")(spark, sf0001).collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq) // deterministic
  }

  test("int8 quantization: values within [-127, 127], absmax hits a bound") {
    val out = SamplingQueries.queries("q53_quantize_int8")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qmax, qmin) = (r.getLong(2 + 1), r.getLong(2 + 2))
      assert(qmax <= 127L && qmin >= -127L)
      // the absmax element quantizes to exactly ±127
      assert(qmax == 127L || qmin == -127L)
      assert(r.getDouble(1) > 0.0) // scale
    }
  }
}
