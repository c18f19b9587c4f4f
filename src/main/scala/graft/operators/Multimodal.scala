package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns next to typed metadata, and per-item feature extraction runs
  * as a partition-batched function over the binary bytes — the Spark
  * analogue of a batched decode UDF.
  *
  * Header decode is REAL: `decodeImageHeader` parses the public PNG
  * (IHDR), JPEG (marker scan to SOF), GIF (logical screen descriptor)
  * and BMP (BITMAPINFOHEADER) container formats from the leading bytes —
  * format detection, big/little-endian field extraction, color-type →
  * channel mapping. Full pixel decode (inflate/DCT) is out of scope for
  * metadata extraction and would slot into the same partition-batched
  * loop.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sha256_hex", StringType)))

  /** Parsed container header: detected format plus pixel dimensions and
    * channel count. `None` for payloads that match no known signature or
    * are truncated before the header fields. */
  final case class ImageHeader(format: String, width: Int, height: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a real image container header from the leading payload bytes.
    *
    * - PNG: 8-byte signature, then the IHDR chunk (always first, RFC 2083):
    *   width/height big-endian u32 at offsets 16/20, color type at 25
    *   (0 gray→1ch, 2 rgb→3, 3 palette→1, 4 gray+alpha→2, 6 rgba→4).
    * - JPEG: SOI then a marker scan skipping variable-length segments
    *   (each length field includes itself) until a frame header SOFn
    *   (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC): precision u8,
    *   height/width big-endian u16, component count u8.
    * - GIF: "GIF87a"/"GIF89a", then logical-screen width/height
    *   little-endian u16; palette-based RGB → 3 channels.
    * - BMP: "BM", BITMAPINFOHEADER width/height little-endian i32 at
    *   18/22 (height may be negative = top-down), bits-per-pixel/8.
    */
  def decodeImageHeader(b: Array[Byte]): Option[ImageHeader] = {
    val n = b.length
    if (n >= 26 && b.take(8).sameElements(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val channels = u8(b, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some(ImageHeader("png", be32(b, 16), be32(b, 20), channels))
    } else if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < n) {
        if (u8(b, i) != 0xff) return None // desynced: not a marker boundary
        val m = u8(b, i + 1)
        if (m == 0xff) i += 1 // fill byte before marker
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 >= n) return None
          return Some(ImageHeader("jpeg", be16(b, i + 7), be16(b, i + 5), u8(b, i + 9)))
        } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return None
          i += 2 + segLen
        }
      }
      None
    } else if (n >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      Some(ImageHeader("gif", le16(b, 6), le16(b, 8), 3))
    } else if (n >= 30 && b(0) == 'B' && b(1) == 'M') {
      // Reject sub-byte palette depths (1/4 bpp would yield 0 channels)
      // and corrupt negative/zero width; height may legitimately be
      // negative (top-down rows) but not 0 or Int.MinValue.
      val w = le32(b, 18)
      val h = le32(b, 22)
      val bpp = le16(b, 28)
      if (w <= 0 || h == 0 || h == Int.MinValue || bpp < 8) None
      else Some(ImageHeader("bmp", w, math.abs(h), bpp / 8))
    } else None
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType)))

  /** Parsed audio container header: PCM layout plus the frame count
    * derived from the data chunk size. */
  final case class AudioHeader(format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long)

  /** Parse a WAV (RIFF/WAVE) header: chunk walk to `fmt ` for the PCM
    * layout (all little-endian) and to `data` for the payload size;
    * frames = dataBytes / blockAlign. Truncated files that still carry
    * a complete `fmt ` chunk decode with nFrames = 0 — the
    * corrupt-download check a pipeline actually runs. */
  def decodeWavHeader(b: Array[Byte]): Option[AudioHeader] = {
    val n = b.length
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataBytes = -1L
    var ok = true
    while (ok && i + 8 <= n && (fmt.isEmpty || dataBytes < 0)) {
      val id = new String(b.slice(i, i + 4), "US-ASCII")
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= n) {
        fmt = Some((le16(b, i + 10), le32(b, i + 12), le16(b, i + 20), le16(b, i + 22)))
      } else if (id == "data") {
        dataBytes = math.min(size, (n - i - 8).toLong) // tolerate truncation
      }
      // Long arithmetic + monotonic-advance guard: a corrupt 32-bit
      // size would otherwise wrap toInt and stall or reverse the walk
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > Int.MaxValue) ok = false
      else i = next.toInt
    }
    fmt.map { case (ch, rate, blockAlign, bits) =>
      val frames = if (dataBytes <= 0 || blockAlign <= 0) 0L else dataBytes / blockAlign
      AudioHeader("wav", rate, ch, bits, frames)
    }
  }

  /** Extract per-item audio metadata from (id, payload binary) rows;
    * same partition-batched shape as [[extractMeta]]. Unknown payloads
    * become format "unknown" with null fields. */
  def extractAudioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(audioMetaSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        // corrupt items are data, not errors: any decode exception → unknown
        val hdr = try decodeWavHeader(bytes) catch {
          case scala.util.control.NonFatal(_) => None
        }
        hdr match {
          case Some(AudioHeader(fmt, rate, ch, bits, frames)) =>
            Row(r.getLong(idIdx), bytes.length, fmt, rate, ch, bits, frames)
          case None =>
            Row(r.getLong(idIdx), bytes.length, "unknown", null, null, null, null)
        }
      }
    }
  }

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("format", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Parsed video container header. */
  final case class VideoHeader(format: String, durationMs: Long, width: Int, height: Int)

  /** Parse an MP4 (ISO BMFF) header: top-level box walk to `moov`, then
    * a nested walk to `mvhd` (timescale + duration, version 0 = 32-bit
    * fields, version 1 = 64-bit) and to `trak`/`tkhd` for the track's
    * presentation width/height (16.16 fixed point). Box sizes are
    * big-endian; size 0 = "to end of file". */
  def decodeMp4Header(b: Array[Byte]): Option[VideoHeader] = {
    val n = b.length
    if (n < 16) return None
    // ISO BMFF requires the file to start with a box; ftyp first in practice
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    var durationMs = -1L
    var width = 0
    var height = 0
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        var size = be32(b, i).toLong & 0xffffffffL
        val typ = new String(b.slice(i + 4, i + 8), "US-ASCII")
        var hdr = 8
        if (size == 1 && i + 16 <= to) { // 64-bit size
          size = (be32(b, i + 8).toLong << 32) | (be32(b, i + 12).toLong & 0xffffffffL)
          hdr = 16
        } else if (size == 0) size = (to - i).toLong
        if (size < hdr) return // corrupt size: stop the walk
        val end = math.min(i + size, to.toLong).toInt
        typ match {
          case "moov" | "trak" if depth < 4 => walk(i + hdr, end, depth + 1)
          case "mvhd" if i + hdr + 20 <= to =>
            val v = u8(b, i + hdr)
            if (v == 1) {
              // v1 widens ctime/mtime/duration to 64-bit: timescale at
              // +20 (4B), duration at +24 (8B) → needs +32 in bounds
              if (i + hdr + 32 <= to) {
                val timescale = be32(b, i + hdr + 20).toLong & 0xffffffffL
                val dur = (be32(b, i + hdr + 24).toLong << 32) |
                  (be32(b, i + hdr + 28).toLong & 0xffffffffL)
                if (timescale > 0) durationMs = dur * 1000 / timescale
              } // truncated v1 payload: skip rather than misread v0 offsets
            } else {
              val timescale = be32(b, i + hdr + 12).toLong & 0xffffffffL
              val dur = be32(b, i + hdr + 16).toLong & 0xffffffffL
              if (timescale > 0) durationMs = dur * 1000 / timescale
            }
          case "tkhd" if i + hdr < to =>
            val v = u8(b, i + hdr)
            // v0: 4 vf + 4 ctime + 4 mtime + 4 track + 4 res + 4 dur +
            // 8 res2 + 8 layer/group/volume/res + 36 matrix = 76 to width;
            // v1 widens ctime/mtime/duration to 8 bytes (+12)
            val off = if (v == 1) 88 else 76
            if (i + hdr + off + 8 <= to) {
              val w = be32(b, i + hdr + off) >>> 16
              val h = be32(b, i + hdr + off + 4) >>> 16
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ =>
        }
        i = end
      }
    }
    walk(0, n, 0)
    if (durationMs >= 0) Some(VideoHeader("mp4", durationMs, width, height)) else None
  }

  /** Extract per-item video metadata; same partition-batched shape as
    * [[extractMeta]]. Unknown payloads become format "unknown". */
  def extractVideoMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(videoMetaSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        // corrupt items are data, not errors: any decode exception → unknown
        val hdr = try decodeMp4Header(bytes) catch {
          case scala.util.control.NonFatal(_) => None
        }
        hdr match {
          case Some(VideoHeader(fmt, dur, w, h)) =>
            Row(r.getLong(idIdx), bytes.length, fmt, dur,
              if (w > 0) w else null, if (h > 0) h else null)
          case None =>
            Row(r.getLong(idIdx), bytes.length, "unknown", null, null, null)
        }
      }
    }
  }

  // ---- deterministic fixture builders (tests + oracle queries) ---------
  // Real container bytes with the given dimensions; payload content after
  // the header fields is irrelevant to header decode, exactly like a real
  // truncated-download check. CRCs are zeroed: header parsing never
  // validates them (and neither do the fast paths of real decoders).

  /** Minimal PNG: signature + IHDR chunk (zero CRC). colorType as in the
    * PNG spec (2=rgb, 6=rgba, ...). 33 bytes. */
  def pngFixture(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(33)
    buf.put(pngSig)
    buf.putInt(13).put("IHDR".getBytes("US-ASCII"))
    buf.putInt(w).putInt(h)
    buf.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0) // CRC (unvalidated)
    buf.array()
  }

  /** Minimal JPEG: SOI + APP0/JFIF segment (exercises marker skipping) +
    * SOF0 with `nComp` components. 30 + 3*nComp bytes. */
  def jpegFixture(w: Int, h: Int, nComp: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(30 + 3 * nComp)
    buf.put(0xff.toByte).put(0xd8.toByte)
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16)
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.putShort(0x0101.toShort).put(0.toByte).putShort(1).putShort(1)
    buf.put(0.toByte).put(0.toByte)
    buf.put(0xff.toByte).put(0xc0.toByte).putShort((8 + 3 * nComp).toShort)
    buf.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(nComp.toByte)
    (1 to nComp).foreach { c =>
      buf.put(c.toByte).put(0x11.toByte).put((if (c == 1) 0 else 1).toByte)
    }
    buf.array()
  }

  /** Minimal PCM WAV: RIFF header + fmt chunk + data chunk descriptor
    * for `dataBytes` of payload (not included). 44 bytes. */
  def wavFixture(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataBytes: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val buf = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
    buf.putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    buf.array()
  }

  /** Minimal MP4: ftyp + moov{mvhd v0 + trak{tkhd v0}}. Duration in
    * `timescale` units; width/height as integers (stored 16.16 fixed).
    * 232 bytes. */
  def mp4Fixture(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val mvhdSize = 8 + 100        // header + v0 payload
    val tkhdSize = 8 + 84         // header + v0 payload
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + trakSize
    val buf = java.nio.ByteBuffer.allocate(16 + moovSize) // big-endian default
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
    buf.put("isom".getBytes("US-ASCII")).putInt(512)
    buf.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    buf.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    buf.putInt(0) // version 0 + flags
    buf.putInt(0).putInt(0) // ctime, mtime
    buf.putInt(timescale).putInt(duration)
    buf.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
    (0 until 2).foreach(_ => buf.putInt(0)) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(buf.putInt)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2) // next_track_ID
    buf.putInt(trakSize).put("trak".getBytes("US-ASCII"))
    buf.putInt(tkhdSize).put("tkhd".getBytes("US-ASCII"))
    buf.putInt(7) // version 0 + flags (enabled)
    buf.putInt(0).putInt(0) // ctime, mtime
    buf.putInt(1).putInt(0) // track_ID, reserved
    buf.putInt(duration)
    (0 until 2).foreach(_ => buf.putInt(0)) // reserved
    buf.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(buf.putInt)
    buf.putInt(w << 16).putInt(h << 16) // 16.16 fixed presentation size
    buf.array()
  }

  /** Minimal GIF89a: signature + logical screen descriptor. 13 bytes. */
  def gifFixture(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
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

  /** Extract per-item metadata from (id, payload binary) rows by parsing
    * the real container header (`decodeImageHeader`). Unknown/truncated
    * payloads yield format "unknown" with null dimensions rather than
    * failing the batch — corrupt items are data, not errors, at corpus
    * scale. Runs partition-at-a-time so decoder state (here the digest;
    * in a full decoder, codec contexts) is amortized across the batch;
    * one task per input partition, no shuffle.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(metaSchema)
    df.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        // corrupt items are data, not errors: any decode exception → unknown
        val hdr = try decodeImageHeader(bytes) catch {
          case scala.util.control.NonFatal(_) => None
        }
        hdr match {
          case Some(ImageHeader(fmt, w, h, c)) =>
            Row(r.getLong(idIdx), bytes.length, fmt, w, h, c, sha)
          case None =>
            Row(r.getLong(idIdx), bytes.length, "unknown", null, null, null, sha)
        }
      }
    }
  }
}
