package graft

import graft.operators.{AudioDedup, Multimodal}
import graft.operators.AudioDedup.PcmAudio

/** Real WAV PCM decode (differential against the JDK's own WAV
  * encoder), depth/channel invariance of the energy fingerprint,
  * truncation fuzz, and the banded hamming LSH pipeline checked
  * against a brute-force reference. */
class AudioDedupSpec extends SparkSpec {

  /** Deterministic centered sample stream shared by the tests. */
  private def sig(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((((seed + 7).toLong * (i + 13) * 2654435761L) % 4294967296L) / 16777216L).toInt - 128
    }

  private def wav8(samples: Array[Int], rate: Int = 8000): Array[Byte] =
    Multimodal.wavFixture(rate, 1, 8, samples.length) ++
      samples.map(c => (c + 128).toByte)

  test("decodeWavPcm matches the JDK WAV encoder sample for sample") {
    import javax.sound.sampled._
    val rnd = new scala.util.Random(42)
    for (bits <- Seq(8, 16); ch <- Seq(1, 2)) {
      val nFrames = 50 + rnd.nextInt(200)
      val centered = Array.fill(nFrames, ch)(rnd.nextInt(256) - 128)
      val bytesPerSample = bits / 8
      val raw = new Array[Byte](nFrames * ch * bytesPerSample)
      for (f <- 0 until nFrames; c <- 0 until ch) {
        val off = (f * ch + c) * bytesPerSample
        if (bits == 8) raw(off) = (centered(f)(c) + 128).toByte
        else { // 16-bit signed LE with the centered value in the top byte
          val s16 = centered(f)(c) << 8
          raw(off) = (s16 & 0xff).toByte
          raw(off + 1) = ((s16 >> 8) & 0xff).toByte
        }
      }
      val fmt = new AudioFormat(
        if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED else AudioFormat.Encoding.PCM_SIGNED,
        8000f, bits, ch, ch * bytesPerSample, 8000f, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, nFrames.toLong),
        AudioFileFormat.Type.WAVE, out)
      val decoded = AudioDedup.decodeWavPcm(out.toByteArray)
      assert(decoded.isDefined, s"failed to decode JDK wav bits=$bits ch=$ch")
      val PcmAudio(rate, dch, dbits, samples) = decoded.get
      assert((rate, dch, dbits) === ((8000, ch, bits)))
      val expect = centered.map(frame => frame.sum / ch)
      assert(samples.toSeq === expect.toSeq, s"bits=$bits ch=$ch")
    }
  }

  test("wavFixture + samples round-trips through the decoder") {
    val s = sig(3, 260)
    val decoded = AudioDedup.decodeWavPcm(wav8(s, rate = 16000))
    assert(decoded.isDefined)
    val PcmAudio(rate, ch, bits, samples) = decoded.get
    assert((rate, ch, bits) === ((16000, 1, 8)))
    assert(samples.toSeq === s.toSeq)
  }

  test("fingerprint is invariant across 8-bit and 16-bit of the same signal") {
    val s = sig(5, 260)
    val b16 = new Array[Byte](s.length * 2)
    for (i <- s.indices) {
      val s16 = s(i) << 8
      b16(2 * i) = (s16 & 0xff).toByte
      b16(2 * i + 1) = ((s16 >> 8) & 0xff).toByte
    }
    val wav16 = Multimodal.wavFixture(8000, 1, 16, b16.length) ++ b16
    val d8 = AudioDedup.decodeWavPcm(wav8(s)).get
    val d16 = AudioDedup.decodeWavPcm(wav16).get
    assert(d8.samples.toSeq === d16.samples.toSeq)
    assert(AudioDedup.energyFingerprint64(d8.samples) ===
      AudioDedup.energyFingerprint64(d16.samples))
  }

  test("stereo frames mix to the integer-truncated channel mean") {
    val left = sig(1, 100); val right = sig(2, 100)
    val raw = new Array[Byte](200)
    for (i <- 0 until 100) {
      raw(2 * i) = (left(i) + 128).toByte
      raw(2 * i + 1) = (right(i) + 128).toByte
    }
    val bytes = Multimodal.wavFixture(8000, 2, 8, 200) ++ raw
    val decoded = AudioDedup.decodeWavPcm(bytes).get
    assert(decoded.samples.toSeq === left.zip(right).map { case (a, b) => (a + b) / 2 }.toSeq)
  }

  test("every truncation length decodes without throwing; corrupt headers are None") {
    val full = wav8(sig(11, 260))
    for (n <- 0 until full.length) {
      val d = AudioDedup.decodeWavPcm(full.take(n)) // must not throw
      // a truncated data chunk still decodes once any frame is present;
      // the samples just stop at the bytes actually there
      d.foreach(p => assert(p.samples.length <= 260))
    }
    assert(AudioDedup.decodeWavPcm(full).get.samples.length === 260)
    // non-PCM format code, unsupported depth, absurd channel count
    def patched16(off: Int, value: Int): Array[Byte] = {
      val b = full.clone()
      b(off) = (value & 0xff).toByte
      b(off + 1) = ((value >> 8) & 0xff).toByte
      b
    }
    assert(AudioDedup.decodeWavPcm(patched16(20, 3)).isEmpty)   // IEEE float
    assert(AudioDedup.decodeWavPcm(patched16(34, 24)).isEmpty)  // 24-bit
    assert(AudioDedup.decodeWavPcm(patched16(22, 1000)).isEmpty) // channels
  }

  test("energyFingerprint64 matches direct arithmetic; short input is None") {
    val s = sig(9, 260)
    val e = Array.tabulate(65) { f =>
      (f * 4 until (f + 1) * 4).map(i => s(i).toLong * s(i)).sum
    }
    var expect = 0L
    for (i <- 0 until 64) if (e(i + 1) > e(i)) expect |= 1L << i
    assert(AudioDedup.energyFingerprint64(s) === Some(expect))
    assert(AudioDedup.energyFingerprint64(s.take(64)) === None)
    assert(AudioDedup.energyFingerprint64(Array.empty[Int]) === None)
    // uneven split: 130 samples over 65 frames = 2 per frame, still defined
    assert(AudioDedup.energyFingerprint64(s.take(130)).isDefined)
  }

  test("fingerprint is invariant to uniform DC offset") {
    val s = sig(13, 260).map(c => c / 2) // headroom for the shift
    val shifted = s.map(_ + 5)
    // energies differ but adjacent-frame deltas keep their sign pattern
    // only when the cross terms don't flip a comparison; use a constant
    // signal where the invariance is exact: e(f) identical per frame
    val const = Array.fill(260)(17)
    val constShift = Array.fill(260)(22)
    assert(AudioDedup.energyFingerprint64(const) ===
      AudioDedup.energyFingerprint64(constShift))
    // and the general shift keeps hamming small (robustness, not equality)
    val h1 = AudioDedup.energyFingerprint64(s).get
    val h2 = AudioDedup.energyFingerprint64(shifted).get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 16)
  }

  test("audioNearDuplicates matches a brute-force band+hamming reference") {
    import spark.implicits._
    val nDocs = 120
    def docSamples(d: Int): Array[Int] = {
      val grp = d % 12; val vr = d / 12
      val base = sig(grp * 977, 260)
      Array.tabulate(260) { i =>
        val p = if ((i * 7 + vr * 11) % 17 == 0) 24 else 0
        ((base(i) + 128 + p) % 256) - 128
      }
    }
    val payloads = (0 until nDocs).map(d => (d.toLong, wav8(docSamples(d))))
    val refHash = payloads.map { case (d, bytes) =>
      d -> AudioDedup.energyFingerprint64(AudioDedup.decodeWavPcm(bytes).get.samples).get
    }.toMap
    def bandsOf(h: Long): Seq[Long] = (0 until 8).map(b => (h >>> (b * 8)) & 0xffL)
    val expected = (for {
      a <- 0 until nDocs; b <- (a + 1) until nDocs
      ha = refHash(a.toLong); hb = refHash(b.toLong)
      if bandsOf(ha).zip(bandsOf(hb)).exists { case (x, y) => x == y }
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= 6
    } yield (a.toLong, b.toLong, ham)).toSet
    assert(expected.nonEmpty, "fixture should produce near-dup pairs")
    assert(expected.size < nDocs * (nDocs - 1) / 2, "fixture must not be all-pairs")

    val df = payloads.toDF("doc_id", "payload")
    val fps = AudioDedup.fingerprints(df, "doc_id", "payload")
    val got = AudioDedup.audioNearDuplicates(fps, "doc_id", "afp", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("undecodable or too-short payloads fingerprint to null and drop out") {
    import spark.implicits._
    val good = wav8(sig(1, 260))
    val short = wav8(sig(1, 30)) // decodes but < 65 samples
    val rows = Seq(
      (0L, good), (1L, good),
      (2L, short),
      (3L, Array[Byte](1, 2, 3)),
      (4L, "not audio at all, just text bytes".getBytes("UTF-8")))
    val fps = AudioDedup.fingerprints(rows.toDF("doc_id", "payload"), "doc_id", "payload")
    val byId = fps.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(0L).isDefined && byId(1L).isDefined)
    assert(byId(2L).isEmpty && byId(3L).isEmpty && byId(4L).isEmpty)
    val pairs = AudioDedup.audioNearDuplicates(fps, "doc_id", "afp", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L))) // identical signals, hamming 0
  }
}
