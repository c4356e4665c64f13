package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real media codecs over JDK built-ins — no external jars (SURVEY.md
  * §2.8c L5; VERDICT r6 #1): `javax.imageio` decodes/encodes PNG, JPEG,
  * BMP and `javax.sound.sampled` reads/writes WAV (PCM) out of the box.
  * Container formats with no JDK codec (mp4 video) fall back to the
  * deterministic stub histogram in [[Multimodal]] — the fallback is
  * explicit in the output (`decoded = false`), never silent.
  *
  * Everything here is a plain byte[]-in / stats-out kernel called from
  * per-partition iterators ([[Multimodal.extractFeatures]]) — no Spark
  * types, no driver involvement, trivially serializable (all methods on
  * a static object).
  */
object MediaCodec {

  // No temp-file cache: executor task threads must not contend on
  // ImageIO's shared scratch directory.
  ImageIO.setUseCache(false)

  /** Decoded image statistics; luma = (r+g+b)/3 per pixel. */
  final case class ImageStats(width: Int, height: Int, bands: Int,
                              meanR: Double, meanG: Double, meanB: Double,
                              meanLuma: Double, stdLuma: Double,
                              minLuma: Double, maxLuma: Double)

  /** Decoded PCM audio statistics over 16-bit signed samples. */
  final case class AudioStats(sampleRate: Double, channels: Int,
                              sampleBits: Int, frames: Long,
                              meanAbs: Double, rms: Double,
                              minSample: Double, maxSample: Double,
                              zeroCrossings: Long)

  /** True if `format` names an image container the JDK decodes. */
  def isImageFormat(format: String): Boolean = format.toLowerCase match {
    case "png" | "jpg" | "jpeg" | "bmp" | "gif" => true
    case _ => false
  }

  def isAudioFormat(format: String): Boolean =
    format.toLowerCase == "wav"

  // --- decode -----------------------------------------------------------

  /** Decode an image payload to per-channel statistics. None when the
    * bytes are not a decodable image (caller falls back to the stub). */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] = {
    val img = try ImageIO.read(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0
    var minL = Double.MaxValue; var maxL = Double.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        val l = (r + g + b) / 3.0
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val meanL = sl / n
    Some(ImageStats(w, h, img.getRaster.getNumBands,
      sr / n, sg / n, sb / n, meanL,
      math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)), minL, maxL))
  }

  /** Decode a WAV payload (16-bit signed PCM — the format
    * [[wavFromPcm]] writes and the overwhelmingly common case) to
    * amplitude statistics. None on any other encoding. */
  def decodeWav(bytes: Array[Byte]): Option[AudioStats] = {
    val ais = try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
    if (ais == null) return None
    try {
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 ||
          f.getEncoding != AudioFormat.Encoding.PCM_SIGNED) return None
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      if (n == 0) return None
      var sa = 0.0; var s2 = 0.0
      var minS = Double.MaxValue; var maxS = Double.MinValue
      var zc = 0L; var prev = 0
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xFF; val hi = raw(2 * i + 1).toInt
        val v = if (f.isBigEndian) (lo << 8) | (raw(2 * i + 1) & 0xFF)
                else (hi << 8) | lo
        val s = v.toShort.toInt
        sa += math.abs(s); s2 += s.toDouble * s
        if (s < minS) minS = s
        if (s > maxS) maxS = s
        if (i > 0 && ((s > 0 && prev <= 0) || (s < 0 && prev >= 0))) zc += 1
        prev = s
        i += 1
      }
      Some(AudioStats(f.getSampleRate.toDouble, f.getChannels, 16,
        n.toLong / f.getChannels, sa / n, math.sqrt(s2 / n), minS, maxS, zc))
    } finally ais.close()
  }

  /** Fixed-layout feature vector for a payload: real codec stats when the
    * format has a JDK decoder and the bytes parse, else the
    * [[Multimodal.stubDecodeFeatures]] histogram. The Boolean is the
    * decode outcome — false = stub fallback.
    *
    * Image layout (slots 0-9, zero-padded to `dim`):
    *   [width, height, bands, meanR, meanG, meanB,
    *    meanLuma, stdLuma, minLuma, maxLuma]
    * Audio layout:
    *   [sampleRate, channels, sampleBits, frames, meanAbs, rms,
    *    minSample, maxSample, zeroCrossings, durationSec]
    */
  def featureVector(format: String, payload: Array[Byte],
                    dim: Int): (Array[Float], Boolean) = {
    require(dim >= 10, s"feature dim must be >= 10, got $dim")
    def pad(v: Array[Double]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < v.length && i < dim) { out(i) = v(i).toFloat; i += 1 }
      out
    }
    val real: Option[Array[Float]] =
      if (isImageFormat(format))
        decodeImage(payload).map(s => pad(Array(s.width, s.height, s.bands,
          s.meanR, s.meanG, s.meanB, s.meanLuma, s.stdLuma, s.minLuma,
          s.maxLuma)))
      else if (isAudioFormat(format))
        decodeWav(payload).map(s => pad(Array(s.sampleRate, s.channels,
          s.sampleBits, s.frames.toDouble, s.meanAbs, s.rms, s.minSample,
          s.maxSample, s.zeroCrossings.toDouble,
          s.frames.toDouble / s.sampleRate)))
      else None
    real match {
      case Some(v) => (v, true)
      case None => (Multimodal.stubDecodeFeatures(payload, dim), false)
    }
  }

  // --- perceptual hash ---------------------------------------------------

  /** 64-bit difference hash (dHash): decode, rescale to 9×8, compare
    * horizontally adjacent luminances — bit i set when pixel (x, y) is
    * darker than (x+1, y). Near-identical images (re-encodes, small
    * edits, metadata churn) land within a few bits of Hamming distance;
    * unrelated images sit near 32. Rescale is NEAREST-NEIGHBOR like
    * [[resizeImage]] — the engine-wide determinism discipline (bilinear
    * kernels vary by rendering pipeline, and a hash that varies by
    * platform can't back a standing dedup index). None when the bytes
    * are not a decodable image. */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img = try ImageIO.read(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
    if (img == null) return None
    val scaled = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    def lum(px: Int): Int =
      ((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)
    var bits = 0L; var i = 0; var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(scaled.getRGB(x, y)) < lum(scaled.getRGB(x + 1, y)))
          bits |= (1L << i)
        i += 1; x += 1
      }
      y += 1
    }
    Some(bits)
  }

  // --- resize -----------------------------------------------------------

  /** Decode → nearest-neighbor rescale → re-encode PNG. Nearest-neighbor
    * is pinned so the output bytes are deterministic across runs (bilinear
    * kernels vary by rendering pipeline). None when the payload is not a
    * decodable image. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = try ImageIO.read(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
    if (img == null) return None
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    Some(pngBytes(out))
  }

  // --- encode (synthetic payload generation + test goldens) -------------

  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic synthetic PNG: pixel (x, y) = (7x+seed, 11y+seed/3,
    * x+y+mix) mod 256 — a real, decodable image whose statistics are a
    * pure function of (w, h, seed, mix). */
  def syntheticPng(w: Int, h: Int, seed: Long, mix: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + seed) % 256).toInt
        val g = ((y * 11 + seed / 3) % 256).toInt
        val b = (x + y + mix) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    pngBytes(img)
  }

  /** 16-bit signed little-endian mono PCM → WAV container bytes. */
  def wavFromPcm(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length.toLong)
    val baos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    finally ais.close()
    baos.toByteArray
  }

  /** Deterministic synthetic WAV: a sine tone at `freqHz`. */
  def syntheticWav(sampleRate: Int, durationMs: Long, freqHz: Double,
                   amplitude: Short): Array[Byte] = {
    val n = (sampleRate * durationMs / 1000).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) =
        (math.sin(2 * math.Pi * freqHz * i / sampleRate) * amplitude).toShort
      i += 1
    }
    wavFromPcm(samples, sampleRate)
  }
}
