package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.ImageHeader

/** Real container-header decode: PNG/JPEG/GIF/BMP parsing against bytes
  * built independently of the parser (javax.imageio for PNG/GIF/JPEG
  * would be ideal but jpeg write needs no native codec either — we use
  * ImageIO where the JDK provides an encoder, plus hand-layout for the
  * rest), and the extractMeta plumbing end-to-end.
  */
class MultimodalSpec extends SparkSpec {

  /** Encode a real image via the JDK's own ImageIO writer — an encoder
    * the parser has no knowledge of — to prove decode against bytes we
    * didn't lay out ourselves. */
  private def imageIoBytes(fmt: String, w: Int, h: Int, typ: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, typ)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("PNG from ImageIO: dims and channels recovered") {
    val rgb = imageIoBytes("png", 640, 480, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.decodeImageHeader(rgb).contains(ImageHeader("png", 640, 480, 3)))
    val rgba = imageIoBytes("png", 31, 17, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    assert(Multimodal.decodeImageHeader(rgba).contains(ImageHeader("png", 31, 17, 4)))
    val gray = imageIoBytes("png", 5, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    assert(Multimodal.decodeImageHeader(gray).contains(ImageHeader("png", 5, 9, 1)))
  }

  test("JPEG from ImageIO: marker scan reaches SOF past APP0/DQT/DHT segments") {
    val jpg = imageIoBytes("jpeg", 320, 200, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.decodeImageHeader(jpg).contains(ImageHeader("jpeg", 320, 200, 3)))
    val gray = imageIoBytes("jpeg", 12, 34, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    assert(Multimodal.decodeImageHeader(gray).contains(ImageHeader("jpeg", 12, 34, 1)))
  }

  test("GIF from ImageIO: little-endian screen descriptor") {
    val gif = imageIoBytes("gif", 300, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.decodeImageHeader(gif).contains(ImageHeader("gif", 300, 2, 3)))
  }

  test("BMP from ImageIO: little-endian signed dims, bpp channels") {
    val bmp = imageIoBytes("bmp", 77, 55, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.decodeImageHeader(bmp).contains(ImageHeader("bmp", 77, 55, 3)))
  }

  test("fixture builders parse back to their inputs") {
    assert(Multimodal.decodeImageHeader(Multimodal.pngFixture(509, 389, 2))
      .contains(ImageHeader("png", 509, 389, 3)))
    assert(Multimodal.decodeImageHeader(Multimodal.pngFixture(1, 1, 6))
      .contains(ImageHeader("png", 1, 1, 4)))
    assert(Multimodal.decodeImageHeader(Multimodal.jpegFixture(65000, 1, 3))
      .contains(ImageHeader("jpeg", 65000, 1, 3)))
    assert(Multimodal.decodeImageHeader(Multimodal.jpegFixture(2, 3, 1))
      .contains(ImageHeader("jpeg", 2, 3, 1)))
    assert(Multimodal.decodeImageHeader(Multimodal.gifFixture(511, 257))
      .contains(ImageHeader("gif", 511, 257, 3)))
  }

  test("unknown and truncated payloads decode to None, not exceptions") {
    assert(Multimodal.decodeImageHeader("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImageHeader(Array.empty[Byte]).isEmpty)
    val png = Multimodal.pngFixture(10, 10, 2)
    assert(Multimodal.decodeImageHeader(png.take(20)).isEmpty) // cut inside IHDR
    val jpg = Multimodal.jpegFixture(10, 10, 3)
    assert(Multimodal.decodeImageHeader(jpg.take(25)).isEmpty) // cut before SOF
    // SOI then garbage: marker desync must bail, not loop
    assert(Multimodal.decodeImageHeader(
      Array(0xff, 0xd8, 0x00, 0x01, 0x02, 0x03).map(_.toByte)).isEmpty)
  }

  test("WAV from the JDK's own encoder: chunk walk recovers the PCM layout") {
    // javax.sound writes real RIFF/WAVE bytes — an encoder the parser
    // has no knowledge of.
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 2, true, false)
    val pcm = new Array[Byte](4 * 100) // 100 stereo 16-bit frames
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val got = Multimodal.decodeWavHeader(out.toByteArray)
    assert(got.contains(Multimodal.AudioHeader("wav", 44100, 2, 16, 100)))
  }

  test("WAV fixtures parse back; truncation and junk are survivable") {
    assert(Multimodal.decodeWavHeader(Multimodal.wavFixture(8000, 1, 8, 123))
      .contains(Multimodal.AudioHeader("wav", 8000, 1, 8, 0))) // no data bytes appended
    val full = Multimodal.wavFixture(48000, 2, 16, 400) ++ new Array[Byte](400)
    assert(Multimodal.decodeWavHeader(full)
      .contains(Multimodal.AudioHeader("wav", 48000, 2, 16, 100)))
    // truncated mid-data: frames count only what's actually present
    assert(Multimodal.decodeWavHeader(full.take(44 + 40))
      .contains(Multimodal.AudioHeader("wav", 48000, 2, 16, 10)))
    assert(Multimodal.decodeWavHeader("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.decodeWavHeader(Array.empty[Byte]).isEmpty)
  }

  test("MP4 box walk: mvhd duration and tkhd 16.16 dims; edge cases survive") {
    val mp4 = Multimodal.mp4Fixture(timescale = 600, duration = 1500, w = 640, h = 360)
    assert(Multimodal.decodeMp4Header(mp4)
      .contains(Multimodal.VideoHeader("mp4", 2500, 640, 360)))
    // trailing opaque payload (the mdat stand-in) must not confuse the walk
    assert(Multimodal.decodeMp4Header(mp4 ++ "opaque media payload".getBytes)
      .contains(Multimodal.VideoHeader("mp4", 2500, 640, 360)))
    // truncated before moov → no duration → None; junk → None
    assert(Multimodal.decodeMp4Header(mp4.take(20)).isEmpty)
    assert(Multimodal.decodeMp4Header("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Header(Array.empty[Byte]).isEmpty)
  }

  test("decoders never throw on adversarial bytes (fuzz)") {
    // Corpus-scale inputs are untrusted: every decoder must return
    // None/partial on ANY byte sequence, never raise or hang. Seeded
    // for reproducibility.
    val rnd = new scala.util.Random(0xbadbeef)
    val valid: Seq[Array[Byte]] = Seq(
      Multimodal.pngFixture(100, 50, 6),
      Multimodal.jpegFixture(64, 32, 3),
      Multimodal.gifFixture(8, 4),
      Multimodal.wavFixture(8000, 1, 8, 64) ++ new Array[Byte](64),
      Multimodal.mp4Fixture(600, 1200, 320, 240))
    def decodeAll(b: Array[Byte]): Unit = {
      Multimodal.decodeImageHeader(b)
      Multimodal.decodeWavHeader(b)
      Multimodal.decodeMp4Header(b)
    }
    (1 to 300).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      decodeAll(junk)
    }
    for (v <- valid) {
      // EVERY truncation length, exhaustively — sampling missed the
      // mp4.take(148) tkhd-at-buffer-end crash in round 9
      (0 to v.length).foreach(k => decodeAll(v.take(k)))
      // random single-byte corruption (catches length-field walks that
      // stall or reverse — e.g. a WAV chunk size that wraps negative)
      (1 to 200).foreach { _ =>
        val mut = v.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        decodeAll(mut)
      }
    }
  }

  test("regression: mp4 truncation at box-header boundary and v1 mvhd tail") {
    val mp4 = Multimodal.mp4Fixture(600, 1500, 640, 360)
    // tkhd box header ends exactly at the buffer end: version byte must
    // not be read past the array (round-9 advisor crash at take(148))
    Multimodal.decodeMp4Header(mp4.take(148)) // must not throw
    // version-1 mvhd truncated 28..31 bytes past the version byte: the
    // 64-bit duration read needs +32, not +28
    val v1 = {
      val b = mp4.clone()
      b(16 + 8 + 8) = 1 // flip mvhd version byte to 1
      b
    }
    (0 to v1.length).foreach(k => Multimodal.decodeMp4Header(v1.take(k)))
    // BMP sub-byte palette depths and corrupt widths → None, not 0-channel
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 10; bmp(22) = 10; bmp(28) = 4 // 4bpp
    assert(Multimodal.decodeImageHeader(bmp).isEmpty)
    bmp(28) = 24; bmp(21) = 0x80.toByte // negative width, 24bpp
    assert(Multimodal.decodeImageHeader(bmp).isEmpty)
  }

  test("extractMeta end-to-end: mixed formats, corrupt row survives as unknown") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.pngFixture(100, 50, 6)),
      (2L, imageIoBytes("jpeg", 64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)),
      (3L, Multimodal.gifFixture(8, 4)),
      (4L, "corrupt".getBytes))
    val out = Multimodal.extractMeta(rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "png"), (2L, "jpeg"), (3L, "gif"), (4L, "unknown")))
    assert(out(0).getInt(3) == 100 && out(0).getInt(4) == 50 && out(0).getInt(5) == 4)
    assert(out(1).getInt(3) == 64 && out(1).getInt(4) == 32)
    assert(out(3).isNullAt(3) && out(3).isNullAt(4) && out(3).isNullAt(5))
    // digest column is the raw-bytes sha256
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("corrupt".getBytes).map("%02x".format(_)).mkString
    assert(out(3).getString(6) == expected)
  }
}
