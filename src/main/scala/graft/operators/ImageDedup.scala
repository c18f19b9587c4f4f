package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual image dedup: difference hash (dHash) over a downsampled
  * grayscale grid, then banded hamming LSH for near-duplicate pairs.
  *
  * The pixel decode is REAL: `decodeBmpGray` parses an uncompressed
  * 24-bit BMP (BITMAPFILEHEADER data offset, BITMAPINFOHEADER geometry,
  * bottom-up or top-down row order, 4-byte row padding, BGR channel
  * order) into a top-based grayscale grid. Other containers would slot
  * into the same decode dispatch; header-only metadata for them lives in
  * [[Multimodal.decodeImageHeader]].
  *
  * dHash (public-knowledge perceptual hash): box-resample the grayscale
  * to a 9x8 grid, then one bit per horizontally adjacent pair —
  * `gray[y][x+1] > gray[y][x]` — giving a 64-bit signature that is
  * invariant to uniform brightness shifts and robust to small edits.
  * All arithmetic is integer (BT.601 luma `(299r+587g+114b)/1000`, box
  * means by integer division) so an external engine can replay the hash
  * exactly.
  *
  * Near-dup search reuses the text-LSH shape ([[TextDedup.candidatePairs]]):
  * the 64-bit hash splits into 8 one-byte bands; images sharing any
  * (band, byte) bucket become candidates (never all-pairs — the fan-out
  * is proportional to true near-dups at 100 TB, exactly like the MinHash
  * path), then an exact hamming verify keeps pairs within `maxHamming`.
  * Two hashes within hamming d of each other share at least one of the 8
  * byte-bands whenever d < 8 spreads over fewer than 8 bands — the same
  * banding guarantee MinHash LSH gives, with the same documented
  * candidate-restricted semantics.
  */
object ImageDedup {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Decoded grayscale image: top-based rows, `gray(y * width + x)`. */
  final case class GrayImage(width: Int, height: Int, gray: Array[Int])

  /** Parse an uncompressed 24-bit BMP into a top-based grayscale grid.
    * Returns None for non-BMP payloads, unsupported depths/compression,
    * corrupt geometry, or pixel data truncated before the size the
    * header promises — corrupt items are data, not errors. */
  def decodeBmpGray(b: Array[Byte]): Option[GrayImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    // sanity cap: a corrupt header must not allocate gigabytes
    if (w > (1 << 14) || h > (1 << 14)) return None
    val topDown = hRaw < 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowSize.toLong * h > b.length) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      val base = off + fileRow * rowSize
      var x = 0
      while (x < w) {
        val i = base + x * 3
        val blue = u8(b, i); val green = u8(b, i + 1); val red = u8(b, i + 2)
        gray(y * w + x) = (299 * red + 587 * green + 114 * blue) / 1000
        x += 1
      }
      y += 1
    }
    Some(GrayImage(w, h, gray))
  }

  /** Integer box-mean resample of a grayscale grid to `ow`x`oh`: output
    * cell (cx, cy) averages the source block [cx*w/ow, (cx+1)*w/ow) x
    * [cy*h/oh, (cy+1)*h/oh) with integer division — deterministic,
    * replayable arithmetic (no float filtering). Identity when the
    * source is already the target size. */
  def boxResample(img: GrayImage, ow: Int, oh: Int): Array[Int] = {
    if (img.width == ow && img.height == oh) return img.gray
    val out = new Array[Int](ow * oh)
    var cy = 0
    while (cy < oh) {
      val y0 = cy * img.height / oh
      val y1 = math.max((cy + 1) * img.height / oh, y0 + 1)
      var cx = 0
      while (cx < ow) {
        val x0 = cx * img.width / ow
        val x1 = math.max((cx + 1) * img.width / ow, x0 + 1)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += img.gray(y * img.width + x); n += 1; x += 1 }
          y += 1
        }
        out(cy * ow + cx) = (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit dHash of a decoded image: bit `y*8 + x` is set when
    * `grid[y][x+1] > grid[y][x]` on the 9x8 box-resampled grid. */
  def dHash64(img: GrayImage): Long = {
    val g = boxResample(img, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  val hashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dhash", LongType)))

  /** Per-image dHash from (id, payload binary) rows; partition-batched
    * like [[Multimodal.extractMeta]] — one task per input partition, no
    * shuffle. Undecodable payloads yield a null hash (and are excluded
    * from near-dup search) rather than failing the batch. */
  def dHashes(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(hashSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        val hash = try decodeBmpGray(bytes).map(dHash64) catch {
          case scala.util.control.NonFatal(_) => None
        }
        Row(r.getLong(idIdx), hash.orNull)
      }
    }
  }

  /** Near-duplicate image pairs from a (id, hash) table: byte-band LSH
    * buckets → candidate pairs ([[TextDedup.candidatePairs]], streamed
    * expansion, optional degenerate-bucket cap) → exact hamming verify.
    * Returns (doc_a, doc_b, hamming) with doc_a < doc_b, hamming ≤
    * `maxHamming`. One hash-sized exchange for the buckets plus two
    * candidate-sized joins for the verify — fan-out proportional to true
    * near-dups, never n². */
  def imageNearDuplicates(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucketSize: Option[Int] = None): DataFrame = {
    val hs = hashes.filter(col(hashCol).isNotNull)
    val sig = hs.select(col(idCol),
      posexplode(array((0 until 8).map(band =>
        shiftrightunsigned(col(hashCol), band * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("band", "sig")))
    val cand = TextDedup.candidatePairs(sig, idCol, maxBucketSize)
    cand
      .join(hs.select(col(idCol).as("doc_a"), col(hashCol).as("__ha")), "doc_a")
      .join(hs.select(col(idCol).as("doc_b"), col(hashCol).as("__hb")), "doc_b")
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Minimal uncompressed 24-bit BMP with pixels from `px(x, y)` →
    * (r, g, b), `(0, 0)` the TOP-left (rows are written bottom-up as the
    * positive-height format requires). Fixture builder for tests and
    * oracle queries; the bytes are a complete, spec-conformant file. */
  def bmpFixture(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
    buf.putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // file rows run bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      fy += 1
    }
    buf.array()
  }
}
