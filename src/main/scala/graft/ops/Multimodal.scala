package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark side — schema, batch shape, partition preservation, feature
  * vector layout — is real and tested. The actual codec step is a clearly
  * marked STUB (no image/audio libraries ship in this container): a
  * deterministic fake decoder stands in where an ImageIO/ffmpeg call would
  * go, keeping the pipeline end-to-end runnable. At scale this is the same
  * `mapPartitions` batch pattern a Pandas-UDF `mapInPandas` would compile to:
  * per-partition batches, no per-row JNI/codec setup cost.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
      nBytes: Long, valid: Boolean)
  final case class DecodedRow(id: Long, meta: MediaMeta, features: Array[Float])

  val BatchSize = 64

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Reads the first bytes as a fake header: [w, h] if at least 8 bytes.
    * A real implementation would call ImageIO/libjpeg here (unavailable in
    * this container); everything around it is the production shape. */
  private def decodeStub(bytes: Array[Byte]): MediaMeta =
    if (bytes == null || bytes.length < 8)
      MediaMeta("unknown", 0, 0, if (bytes == null) 0L else bytes.length.toLong, valid = false)
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val w = math.abs(bb.getInt(0)) % 4096
      val h = math.abs(bb.getInt(4)) % 4096
      MediaMeta("fake/v1", w, h, bytes.length.toLong, valid = true)
    }

  /** STUB feature extractor — deterministic 8-dim signature from byte
    * statistics (a real pipeline would run a vision encoder batch here).
    * Accumulates in double (better numerics, and bit-reproducible by the
    * DuckDB oracle's double arithmetic), emits float like an encoder would. */
  private def featuresStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    val acc = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xFF) / 255.0
      i += 1
    }
    acc.map(v => (v / bytes.length * 8).toFloat)
  }

  /** Decode + featurize a (id: long, media: binary) DataFrame in
    * partition-local batches. Output schema:
    * (id, meta struct<format,width,height,nBytes,valid>, features array<float>). */
  def decodeAndFeaturize(df: DataFrame, idCol: String, mediaCol: String): Dataset[DecodedRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch to amortize codec setup, exactly like mapInPandas batches
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            DecodedRow(id, decodeStub(bytes), featuresStub(bytes))
          }
        }
      }
  }

  /** STUB resize — deterministic nearest-neighbour byte resample standing in
    * for a real image resize (no codec libs in this container): maps the
    * payload to `targetBytes` by sampling at fixed stride positions. The
    * Spark shape (same mapPartitions batching as decode) is the production
    * one. */
  private def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte](targetBytes)
    var i = 0
    while (i < targetBytes) {
      out(i) = bytes((i.toLong * bytes.length / targetBytes).toInt)
      i += 1
    }
    out
  }

  final case class ResizedRow(id: Long, media: Array[Byte], nBytes: Long)

  /** Batched resize of a (id: long, media: binary) DataFrame — partition
    * preserved, per-partition batches, deterministic stub codec. */
  def resize(df: DataFrame, idCol: String, mediaCol: String,
      targetBytes: Int = 64): Dataset[ResizedRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val r = resizeStub(bytes, targetBytes)
          ResizedRow(id, r, r.length.toLong)
        })
      }
  }

  /** Frame-sampling plumbing for video-like payloads: split a binary blob
    * into fixed-size "frames", keep every `stride`-th. Pure expressions. */
  def sampleFrames(df: DataFrame, mediaCol: String, frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    df.withColumn("frames",
      filter(
        transform(sequence(lit(0),
          greatest(floor(octet_length(col(mediaCol)) / frameBytes).cast("int") - 1,
            lit(0))),
          i => struct(i.as("frame_idx"),
            base64(col(mediaCol)).substr(lit(1) + i * frameBytes, lit(frameBytes))
              .as("frame_b64"))),
        f => pmod(f.getField("frame_idx"), lit(stride)) === 0))
}
