package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Backward as-of join semantics: latest-at-or-before match per key,
  * inclusive equal-timestamp ties, null when nothing precedes — checked
  * against a brute-force per-row max-≤ computation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("matches the latest right row at or before each left row, per key") {
    val left = Seq(
      (1L, 10L, t(10)), // after r@5 -> matches 100
      (2L, 10L, t(30)), // after r@5, r@20 -> matches 101
      (3L, 10L, t(20)), // EQUAL ts to r@20 -> inclusive, matches 101
      (4L, 11L, t(15)), // key 11 has only a later right row -> null
      (5L, 12L, t(40))  // key 12 has no right rows at all -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, t(5)),
      (101L, 10L, t(20)),
      (102L, 11L, t(55))
    ).toDF("click_id", "user_id", "ts")
    val out = AsOfJoin.asofBackward(left, right, "user_id", "ts",
        rightCols = Seq("click_id"))
      .select($"event_id", $"r_click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> Some(101L),
      4L -> None, 5L -> None))
  }

  test("agrees with the brute-force max-ts-≤ join on random event data") {
    val rnd = new scala.util.Random(17)
    val left = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(10) + 1).toLong, t(rnd.nextInt(500))))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 150).map(i =>
      (1000L + i, (rnd.nextInt(10) + 1).toLong, t(rnd.nextInt(500))))
      .toDF("click_id", "user_id", "ts")
    val fast = AsOfJoin.asofBackward(left, right, "user_id", "ts",
        rightCols = Seq("click_id", "ts"))
      .where($"r_click_id".isNotNull)
      .select($"event_id", $"r_click_id")
      .as[(Long, Long)].collect().toMap
    // brute force: theta join, keep max right ts per left row (break ts
    // ties by max click_id — the window's (ts, side) order puts the
    // later-unioned right row last; with random minute-level data ties on
    // (key, ts) across right rows are possible, so align the tiebreak)
    val slow = left.as("l").join(right.as("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts")
      .groupBy($"l.event_id")
      .agg(max(struct($"r.ts", $"r.click_id")).as("m"))
      .select($"event_id", $"m.click_id")
      .as[(Long, Long)].collect().toMap
    assert(fast.keySet == slow.keySet)
    // on tie rows the arbitrary-tie contract allows either; compare only
    // rows whose match is unique by timestamp
    val rightRows = right.select($"user_id", $"ts", $"click_id")
      .as[(Long, Timestamp, Long)].collect()
    val leftRows = left.select($"event_id", $"user_id", $"ts")
      .as[(Long, Long, Timestamp)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    fast.foreach { case (eid, cid) =>
      val (u, lts) = leftRows(eid)
      val best = rightRows.filter(r => r._1 == u && !r._2.after(lts))
        .map(_._2.getTime).max
      val tied = rightRows.count(r => r._1 == u && r._2.getTime == best)
      if (tied == 1) assert(cid == slow(eid), s"event $eid")
    }
  }

  test("intervalAggregate equals the pair join + groupBy on random data") {
    // Random points and intervals with deliberately dense overlap, odd
    // widths NOT aligned to the bucket, duplicate point values, and
    // intervals that contain nothing (must be absent from both results).
    val rnd = new scala.util.Random(42)
    val points = (1 to 4000).map(_ => rnd.nextInt(5000).toLong)
      .toDF("pt")
    val intervals = (1 to 500).map { i =>
      val lo = rnd.nextInt(5200).toLong - 100
      (i.toLong, lo, lo + rnd.nextInt(700).toLong)
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(64L, 250L, 1000L)) {
      val viaPairs = graft.operators.RangeJoin.pointInInterval(
          points, intervals, "pt", "lo", "hi", bucketWidth = width)
        .groupBy($"iid")
        .agg(count(lit(1)).as("n_points"), min($"pt").as("min_pt"))
        .as[(Long, Long, Long)].collect().map { case (k, n, m) => k -> ((n, m)) }.toMap
      val viaAgg = graft.operators.RangeJoin.intervalAggregate(
          points, intervals, "pt", "lo", "hi", bucketWidth = width)
        .select($"iid", $"n_points", $"min_pt")
        .as[(Long, Long, Long)].collect().map { case (k, n, m) => k -> ((n, m)) }.toMap
      assert(viaAgg == viaPairs, s"width=$width")
      // Hot-bucket split path: a cap far below the per-bucket population
      // forces every bucket through the hash-split machinery; counts add
      // and mins min across sub-arrays, so results must be identical.
      val viaSplit = graft.operators.RangeJoin.intervalAggregate(
          points, intervals, "pt", "lo", "hi", bucketWidth = width,
          maxBucketRows = 17)
        .select($"iid", $"n_points", $"min_pt")
        .as[(Long, Long, Long)].collect().map { case (k, n, m) => k -> ((n, m)) }.toMap
      assert(viaSplit == viaPairs, s"width=$width split")
    }
  }

  test("intervalAggregate rejects reserved/output column collisions") {
    val points = Seq(1L).toDF("__pts")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalAggregate(
        points, intervals, "__pts", "lo", "hi", bucketWidth = 10L)
    }
    val clashOut = Seq((1L, 0L, 10L)).toDF("n_points", "lo", "hi")
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalAggregate(
        Seq(1L).toDF("pt"), clashOut, "pt", "lo", "hi", bucketWidth = 10L)
    }
  }

  test("intervalAggregate handles empty points and degenerate intervals") {
    val points = Seq.empty[Long].toDF("pt")
    val intervals = Seq((1L, 0L, 10L), (2L, 5L, 4L)).toDF("iid", "lo", "hi")
    assert(graft.operators.RangeJoin.intervalAggregate(
      points, intervals, "pt", "lo", "hi", bucketWidth = 10L).count() == 0)
    // single point on the boundary: inclusive on both ends
    val p2 = Seq(10L, 20L).toDF("pt")
    val i2 = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val r = graft.operators.RangeJoin.intervalAggregate(
        p2, i2, "pt", "lo", "hi", bucketWidth = 7L)
      .select($"iid", $"n_points", $"min_pt").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L, 10L)))
  }
}
