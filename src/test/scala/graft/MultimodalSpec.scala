package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The real decode paths of the multimodal seam, exercised with real
  * media bytes generated in-memory through the same JDK encoders the
  * decoder reads with: PNG/JPEG/GIF/BMP via javax.imageio, WAV via
  * javax.sound.sampled. The driver testdata has no media table (its
  * payloads are text → `unknown` → byte-fallback features), so these
  * fixtures are what proves the decoder actually decodes.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  // ---- fixtures ----------------------------------------------------

  private def image(w: Int, h: Int, fmt: String)(px: (Int, Int) => Int): Array[Byte] = {
    // TYPE_INT_RGB: every listed format (incl. JPEG) accepts it
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
    out.toByteArray
  }

  private val redPng = image(8, 4, "png")((_, _) => 0xff0000)
  private val halfPng = image(64, 64, "png")((x, _) => if (x < 32) 0x000000 else 0xffffff)

  /** 16-bit mono PCM at 8 kHz: alternating ±16384 (a Nyquist square
    * wave) — mean |amp| = rms = 0.5, zero-crossing on every step. */
  private val squareWav: Array[Byte] = {
    val n = 2000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private val textBytes = "just a document, not media".getBytes("UTF-8")

  // ---- format sniff ------------------------------------------------

  test("magicOf reads real magic numbers from JDK-encoded media") {
    assert(Multimodal.magicOf(redPng) == "png")
    assert(Multimodal.magicOf(image(4, 4, "jpeg")((_, _) => 0x808080)) == "jpeg")
    assert(Multimodal.magicOf(image(4, 4, "gif")((_, _) => 0x808080)) == "gif")
    assert(Multimodal.magicOf(image(4, 4, "bmp")((_, _) => 0x808080)) == "bmp")
    assert(Multimodal.magicOf(squareWav) == "wav")
    assert(Multimodal.magicOf(textBytes) == "unknown")
    assert(Multimodal.magicOf(Array[Byte]()) == "unknown")
    // mp4: ftyp box at offset 4
    val mp4ish = Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm')
    assert(Multimodal.magicOf(mp4ish) == "mp4")
  }

  test("sniffFormat (the Column twin) agrees with magicOf on every fixture") {
    val fixtures = Seq(
      1L -> redPng, 2L -> image(4, 4, "jpeg")((_, _) => 0), 3L -> squareWav,
      4L -> textBytes, 5L -> image(4, 4, "bmp")((_, _) => 0),
      6L -> Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'm', 'p', '4', '2'))
    val df = fixtures.toDF("media_id", "payload")
    val got = df.select(col("media_id"), Multimodal.sniffFormat(col("payload")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = fixtures.map { case (id, b) => id -> Multimodal.magicOf(b) }.toMap
    assert(got == want)
    assert(want.values.toSet == Set("png", "jpeg", "wav", "unknown", "bmp", "mp4"))
  }

  // ---- real decode -------------------------------------------------

  test("jdkDecoder extracts pixel statistics from a real PNG") {
    val Array(f) = Multimodal.jdkDecoder(Iterator(1L -> redPng)).toArray.map(_._2)
    assert(f.length == 8)
    assert(math.abs(f(0) - 8 / 4096.0) < 1e-6, "width")
    assert(math.abs(f(1) - 4 / 4096.0) < 1e-6, "height")
    assert(math.abs(f(2) - 1.0) < 1e-3, "mean R of a solid-red image")
    assert(f(3) < 1e-3 && f(4) < 1e-3, "no G/B in a solid-red image")
    assert(math.abs(f(5) - 85 / 255.0) < 1e-3, "luma of pure red = 1/3")
    assert(f(6) < 1e-3, "solid color has zero luma spread")
    assert(math.abs(f(7) - 0.25) < 1e-6, "aspect 8:4 → 2/8")
  }

  test("jdkDecoder separates flat from high-contrast images via luma stddev") {
    val Array(flat, half) = Multimodal
      .jdkDecoder(Iterator(1L -> redPng, 2L -> halfPng)).toArray.map(_._2)
    assert(math.abs(half(5) - 0.5) < 0.02, "half black / half white → mean luma 0.5")
    assert(half(6) > 0.45, "two-tone image → luma stddev ≈ 0.5")
    assert(flat(6) < 1e-3)
  }

  test("jdkDecoder extracts sample statistics from a real WAV") {
    val Array(f) = Multimodal.jdkDecoder(Iterator(1L -> squareWav)).toArray.map(_._2)
    assert(math.abs(f(0) - 1 / 8.0) < 1e-6, "mono")
    assert(math.abs(f(1) - 8000 / 96000.0) < 1e-6, "sample rate")
    assert(math.abs(f(3) - 16 / 32.0) < 1e-6, "16-bit")
    assert(math.abs(f(4) - 0.5) < 1e-3, "mean |amp| of ±0.5 square")
    assert(math.abs(f(5) - 0.5) < 1e-3, "rms")
    assert(f(6) > 0.95, "alternating-sign wave crosses zero every sample")
  }

  test("jdkDecoder reads channel 0 of interleaved stereo and the 8-bit PCM path") {
    // stereo 16-bit: ch0 constant +0.5, ch1 constant -0.25 — a decoder
    // that strides wrong or mixes channels can't produce mean |amp| 0.5
    val stereo: Array[Byte] = {
      val n = 1000
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
      val pcm = new Array[Byte](n * 4)
      for (i <- 0 until n) {
        val c0 = 16384; val c1 = -8192
        pcm(4 * i) = (c0 & 0xff).toByte; pcm(4 * i + 1) = ((c0 >> 8) & 0xff).toByte
        pcm(4 * i + 2) = (c1 & 0xff).toByte; pcm(4 * i + 3) = ((c1 >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // 8-bit mono is UNSIGNED PCM centered on 128: 192/64 → ±0.5
    val eightBit: Array[Byte] = {
      val n = 1000
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val pcm = Array.tabulate(n)(i => (if (i % 2 == 0) 192 else 64).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val out = Multimodal.jdkDecoder(Iterator(1L -> stereo, 2L -> eightBit)).toMap
    val st = out(1L)
    assert(math.abs(st(0) - 2 / 8.0) < 1e-6, "stereo channel count")
    assert(math.abs(st(4) - 0.5) < 1e-3, s"ch0 mean |amp| (got ${st(4)}): wrong stride or channel mix")
    assert(st(6) < 1e-6, "constant ch0 never crosses zero")
    val eb = out(2L)
    assert(math.abs(eb(3) - 8 / 32.0) < 1e-6, "8-bit sample size")
    assert(math.abs(eb(4) - 0.5) < 1e-2, s"8-bit mean |amp| (got ${eb(4)})")
    assert(eb(6) > 0.95, "alternating 8-bit wave crosses zero every sample")
  }

  test("unknown formats and corrupt media degrade to byte features, never throw") {
    val truncated = redPng.take(12) // valid magic, unreadable body
    val out = Multimodal.jdkDecoder(
      Iterator(1L -> textBytes, 2L -> truncated)).toMap
    val expectText = Multimodal.fakeDecoder(Iterator(1L -> textBytes)).next()._2
    assert(out(1L).sameElements(expectText), "unknown → byte fallback")
    assert(out(2L).sameElements(
      Multimodal.fakeDecoder(Iterator(2L -> truncated)).next()._2),
      "corrupt png → byte fallback")
  }

  test("decodePayloads runs the real decoder partition-parallel over mixed media") {
    val df = Seq(1L -> redPng, 2L -> squareWav, 3L -> textBytes)
      .toDF("media_id", "payload").repartition(3)
    val rows = Multimodal.decodePayloads(spark, df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows.values.forall(_.length == 8))
    assert(math.abs(rows(1L)(2) - 1.0) < 1e-3, "png row decoded as pixels")
    assert(math.abs(rows(2L)(4) - 0.5) < 1e-3, "wav row decoded as samples")
    assert(math.abs(rows(3L)(0) - textBytes(0) / 255.0f.toDouble) < 1e-3,
      "text row fell back to byte features")
  }
}
