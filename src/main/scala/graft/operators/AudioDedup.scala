package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual audio dedup: a 64-bit energy-envelope delta fingerprint
  * over decoded PCM, then the shared byte-band hamming LSH for
  * near-duplicate pairs — the audio counterpart of [[ImageDedup]].
  *
  * The PCM decode is REAL: `decodeWavPcm` walks the RIFF chunk list
  * (same layout rules as [[Multimodal.decodeWavHeader]]), validates a
  * PCM `fmt ` chunk (format code 1, 8- or 16-bit), and reads the `data`
  * chunk into centered mono samples: 8-bit unsigned → `s - 128`,
  * 16-bit signed little-endian → `s >> 8`, multi-channel frames mixed
  * by integer-truncated mean. Both depths land in [-128, 127] so a
  * fingerprint is depth-invariant for the same signal.
  *
  * Fingerprint (public-knowledge shape — the time-domain analogue of
  * dHash, a simplified cousin of spectral-delta audio fingerprints):
  * split the sample stream into 65 equal time frames, compute each
  * frame's integer energy `Σ c²`, and set bit `i` when
  * `energy(i+1) > energy(i)`. Like dHash's gradient bits, the delta
  * sign is invariant to uniform DC offset and robust to small local
  * edits; all arithmetic is integer so an external engine can replay
  * the hash exactly.
  *
  * Near-dup search delegates to [[ImageDedup.imageNearDuplicates]] —
  * the banded-hamming machinery is hash-agnostic: 8 one-byte bands,
  * bucket join (never all-pairs), exact hamming verify. One
  * hash-sized exchange plus candidate-sized joins, fan-out
  * proportional to true near-dups at 100 TB.
  */
object AudioDedup {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Decoded PCM: centered mono samples in [-128, 127]. */
  final case class PcmAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int])

  /** Parse a PCM WAV into centered mono samples. Returns None for
    * non-WAV payloads, non-PCM encodings, unsupported depths, or a
    * missing/empty data chunk; a truncated data chunk decodes to the
    * frames actually present — corrupt items are data, not errors. */
  def decodeWavPcm(b: Array[Byte]): Option[PcmAudio] = {
    val n = b.length
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    // audioFormat, channels, rate, bits
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataOff = -1
    var dataLen = 0L
    var ok = true
    while (ok && i + 8 <= n && (fmt.isEmpty || dataOff < 0)) {
      val id = new String(b.slice(i, i + 4), "US-ASCII")
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= n) {
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12), le16(b, i + 22)))
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = math.min(size, (n - i - 8).toLong) // tolerate truncation
      }
      // Long arithmetic + monotonic-advance guard against corrupt sizes
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > Int.MaxValue) ok = false
      else i = next.toInt
    }
    fmt.flatMap { case (audioFormat, ch, rate, bits) =>
      val bytesPerSample = bits / 8
      if (audioFormat != 1 || ch < 1 || ch > 64 || (bits != 8 && bits != 16) ||
        dataOff < 0 || dataLen <= 0) None
      else {
        val frameBytes = ch * bytesPerSample
        val nFrames = (dataLen / frameBytes).toInt
        if (nFrames == 0) None
        else {
          val out = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            var sum = 0
            var c = 0
            while (c < ch) {
              val off = dataOff + f * frameBytes + c * bytesPerSample
              sum += (if (bits == 8) u8(b, off) - 128
                      else (le16(b, off) << 16 >> 16) >> 8) // sign-extend, top byte
              c += 1
            }
            out(f) = sum / ch // integer-truncated mono mix
            f += 1
          }
          Some(PcmAudio(rate, ch, bits, out))
        }
      }
    }
  }

  /** 64-bit energy-envelope fingerprint: 65 equal frames (frame f spans
    * samples [f*n/65, (f+1)*n/65)), bit i set when the (i+1)-th frame's
    * energy exceeds the i-th's. None when fewer than 65 samples — too
    * short to carry a 65-frame envelope. */
  def energyFingerprint64(samples: Array[Int]): Option[Long] = {
    val nFrames = 65
    val n = samples.length
    if (n < nFrames) return None
    val e = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      val s0 = f * n / nFrames
      val s1 = (f + 1) * n / nFrames
      var sum = 0L
      var i = s0
      while (i < s1) { val c = samples(i); sum += c.toLong * c; i += 1 }
      e(f) = sum
      f += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }

  val fingerprintSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("afp", LongType)))

  /** Per-item audio fingerprint from (id, payload binary) rows;
    * partition-batched like [[ImageDedup.dHashes]] — one task per input
    * partition, no shuffle. Undecodable or too-short payloads yield a
    * null fingerprint (excluded from near-dup search). */
  def fingerprints(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(fingerprintSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        val hash = try decodeWavPcm(bytes).map(_.samples).flatMap(energyFingerprint64)
        catch { case scala.util.control.NonFatal(_) => None }
        Row(r.getLong(idIdx), hash.orNull)
      }
    }
  }

  /** Near-duplicate audio pairs: identical machinery to
    * [[ImageDedup.imageNearDuplicates]] (the banded-hamming LSH is
    * hash-agnostic) over the energy fingerprint column. Returns
    * (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤ `maxHamming`. */
  def audioNearDuplicates(fps: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, maxBucketSize: Option[Int] = None): DataFrame =
    ImageDedup.imageNearDuplicates(fps, idCol, fpCol, maxHamming, maxBucketSize)
}
