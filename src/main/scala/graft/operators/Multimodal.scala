package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns next to typed metadata, and per-item feature extraction runs
  * as a partition-batched function over the binary bytes — the Spark
  * analogue of a batched decode UDF.
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): `fakeDecode` derives deterministic "dimensions" from
  * the byte stream. Everything around it — the binary schema, the
  * partition batching, the output struct — is the real production
  * plumbing; swapping `fakeDecode` for a JNI/codec call changes nothing
  * else.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sha256_hex", StringType)))

  /** STUB decode: a real implementation would parse the container header
    * (PNG/JPEG/WAV...). Deterministic fake: dimensions derived from byte
    * count so external engines can verify the plumbing end-to-end.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (1 + n % 64, 1 + (n / 64) % 64, 3)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("frame_md5", StringType)))

  /** Frame sampling over a binary payload: slice fixed-size frames and
    * keep every `stride`-th one — the video-decode access pattern
    * (seek + sample) over opaque bytes. Partition-batched like
    * extractMeta; the byte slicing is real, only the codec is stubbed.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(frameSchema)
    df.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        val id = r.getLong(idIdx)
        val nFrames = math.max((bytes.length + frameSize - 1) / frameSize, 1)
        (0 until nFrames by stride).iterator.map { f =>
          val start = f * frameSize
          val slice = bytes.slice(start, math.min(start + frameSize, bytes.length))
          digest.reset()
          val md5 = digest.digest(slice).map("%02x".format(_)).mkString
          Row(id, f, slice.length, md5)
        }
      }
    }
  }

  /** Extract per-item metadata from (id, payload binary) rows. Runs
    * partition-at-a-time so a real decoder could amortize codec init
    * across the batch; one task per input partition, no shuffle.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(metaSchema)
    df.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        val (w, h, c) = fakeDecode(bytes)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        Row(r.getLong(idIdx), bytes.length, w, h, c, sha)
      }
    }
  }
}
