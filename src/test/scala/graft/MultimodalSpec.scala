package graft

import org.apache.spark.sql.functions._
import graft.ingest.Multimodal

/** Batch-decode plumbing: schema, row preservation, real histogram
  * features from the stub codec, and the per-batch call shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val assets = Seq(
    (1L, "aaaa".getBytes("UTF-8")),
    (2L, "abcdefgh".getBytes("UTF-8")),
    (3L, Array.empty[Byte])
  ).toDF("asset_id", "asset")

  test("decodeFeatures preserves rows and emits fixed-width normalized features") {
    val out = Multimodal.decodeFeatures(assets, "asset_id", "asset",
      Multimodal.StubDecoder)
    assert(out.columns.toSeq == Seq("id", "asset", "features"))
    val rows = out.select($"id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(rows.size == 3)
    assert(rows.values.forall(_.length == 16))
    // 'a' = 0x61 → bucket 6; all mass in one bucket for doc 1
    assert(rows(1L)(6) == 1.0f)
    assert(math.abs(rows(2L).sum - 1.0f) < 1e-6)
    assert(rows(3L).sum == 0.0f) // empty asset → zero vector, no crash
  }

  test("the decoder is invoked per batch, not per row") {
    // The decoder runs inside tasks (closure is serialized), so batch
    // sizes are observed through the OUTPUT: each row's feature is the
    // size of the batch it was decoded in.
    val spy = new Multimodal.Decoder {
      val featureDim = 1
      def decodeBatch(b: Seq[(Long, Array[Byte])]): Seq[Array[Float]] =
        b.map(_ => Array(b.length.toFloat))
    }
    val many = spark.range(10).select($"id",
      lit("x".getBytes("UTF-8")).as("asset")).coalesce(1)
    val observed = Multimodal.decodeFeatures(many, "id", "asset", spy, batchSize = 4)
      .select(element_at($"features", 1)).as[Float].collect().toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // 10 rows in one partition → batches of 4, 4, 2
    assert(observed == Map(4.0f -> 8, 2.0f -> 2))
  }
}
