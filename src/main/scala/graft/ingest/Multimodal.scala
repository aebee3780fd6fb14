package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal batch-decode plumbing (the Scala analog of a Pandas-UDF
  * `mapInPandas` stage): opaque binary assets flow through `mapPartitions`
  * in decoder-defined batches, so a real codec amortizes model/codec init
  * per batch exactly like an Arrow-batched Python UDF would. The codec
  * itself is a pluggable trait — this container has no image/audio libs,
  * so [[StubDecoder]] is the clearly-marked deterministic fake; the
  * partitioning, batch shape, schema, and failure isolation around it are
  * real (reference S9 binary assets, api/app/lib/garage_client.py; asset
  * ingest api/app/lib/ingestion.py).
  */
object Multimodal {

  /** A batch decoder: bytes in, fixed-width feature vector out. */
  trait Decoder extends Serializable {
    def featureDim: Int
    /** Decode one batch of (id, bytes); must return one row per input. */
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Array[Float]]
  }

  /** Deterministic fake decode (STUB — replace with a real codec):
    * "features" are a normalized 16-bucket byte-class histogram, which is
    * computable without any media library yet exercises the exact batch
    * plumbing a real decoder needs. */
  object StubDecoder extends Decoder {
    val featureDim = 16
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Array[Float]] =
      batch.map { case (_, bytes) =>
        val h = new Array[Float](featureDim)
        bytes.foreach(b => h((b & 0xFF) / 16) += 1f)
        val n = math.max(bytes.length, 1).toFloat
        h.map(_ / n)
      }
  }

  /** Run `decoder` over an asset table in per-partition batches of
    * `batchSize`. Input: (id: long, asset: binary); output adds
    * `features: array<float>`. One decoder instance per partition, one
    * decode call per batch — the mapInPandas execution shape. */
  def decodeFeatures(assets: DataFrame, idCol: String, assetCol: String,
      decoder: Decoder, batchSize: Int = 64): DataFrame = {
    val inputSchema = StructType(Seq(
      StructField("id", LongType), StructField("asset", BinaryType)))
    val outSchema = StructType(inputSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    assets
      .select(col(idCol).cast("long").as("id"), col(assetCol).as("asset"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { rows =>
          // NULL assets decode as empty payloads — one bad fetch must not
          // abort the job (per-row isolation, like a failed Arrow batch).
          val batch = rows.map(r => (r.getLong(0),
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])))
          val feats = decoder.decodeBatch(batch)
          require(feats.length == batch.length,
            s"decoder returned ${feats.length} rows for a ${batch.length}-row batch")
          rows.zip(feats).map { case (r, f) => Row(r.getLong(0), r.get(1), f) }
        }
      }
  }
}
