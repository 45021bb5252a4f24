package graft.ops

/** Pure-JVM decoders for the uncompressed media formats — no native or
  * third-party codec needed, so the multimodal pipeline's decode stage is
  * REAL for WAV/PCM audio and BMP images (compressed formats — JPEG, MP3,
  * video — stay behind the [[Multimodal.MediaDecoder]] seam for a
  * JNI/FFI-backed implementation).
  *
  * Both parsers are defensive: any structural violation returns None
  * rather than throwing, so a corrupt payload degrades to `ok = false`
  * exactly like an unsupported format (the reference's codec failure
  * behavior: tag-and-continue, not task failure).
  */
object MediaCodecs {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decoded WAV: sample rate, channel count, PCM16 samples (channel-
    * interleaved, as parsed). */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Parse a RIFF/WAVE container with PCM16 data. Walks the chunk list
    * (fmt /data may be preceded by LIST etc.), little-endian per spec. */
  def parseWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var rate = 0
    var channels = 0
    var bits = 0
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = u32(bytes, pos + 4).toInt
      val body = pos + 8
      if (sz < 0 || body + sz > bytes.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmtTag = u16(bytes, body)
          if (fmtTag != 1) return None // PCM only
          channels = u16(bytes, body + 2)
          rate = u32(bytes, body + 4).toInt
          bits = u16(bytes, body + 14)
          if (bits != 16 || channels < 1 || rate <= 0) return None
        case "data" =>
          if (rate == 0) return None // fmt must precede data
          val n = sz / 2
          data = new Array[Short](n)
          var i = 0
          while (i < n) {
            data(i) = ((bytes(body + 2 * i) & 0xff) |
              (bytes(body + 2 * i + 1) << 8)).toShort
            i += 1
          }
        case _ => // skip LIST/fact/...
      }
      pos = body + sz + (sz & 1) // chunks are word-aligned
    }
    if (data == null) None else Some(Wav(rate, channels, data))
  }

  /** Audio features: `featDim` frames of RMS energy over the mono mix,
    * normalized to [0, 1] (each frame = sqrt(mean(sample²)) / 32768). The
    * shape a mel-filterbank stage would refine; deterministic and
    * library-free. */
  def wavFeatures(bytes: Array[Byte], featDim: Int): Option[Array[Float]] =
    parseWav(bytes).flatMap { w =>
      val frames = w.samples.length / w.channels
      if (frames == 0) None
      else {
        val out = new Array[Float](featDim)
        var f = 0
        while (f < featDim) {
          val lo = (f.toLong * frames / featDim).toInt
          val hi = math.max(lo + 1, ((f + 1).toLong * frames / featDim).toInt)
          var acc = 0.0
          var i = lo
          while (i < hi) {
            var c = 0
            var mix = 0.0
            while (c < w.channels) { mix += w.samples(i * w.channels + c); c += 1 }
            mix /= w.channels
            acc += mix * mix
            i += 1
          }
          out(f) = (math.sqrt(acc / (hi - lo)) / 32768.0).toFloat
          f += 1
        }
        Some(out)
      }
    }

  /** Decoded BMP: width, height, row-major TOP-DOWN luminance in [0,255]. */
  final case class Bmp(width: Int, height: Int, lum: Array[Float])

  /** Parse an uncompressed 24-bit BITMAPINFOHEADER BMP (the only flavor
    * every producer emits). Handles the spec's bottom-up row order and
    * 4-byte row padding. */
  def parseBmp(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < 54) return None
    if (!(bytes(0) == 'B' && bytes(1) == 'M')) return None
    val dataOffset = u32(bytes, 10).toInt
    val headerSize = u32(bytes, 14).toInt
    if (headerSize < 40) return None
    val width = u32(bytes, 18).toInt
    val heightRaw = u32(bytes, 22).toInt // negative = top-down
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    val rowBytes = (width * 3 + 3) & ~3
    if (dataOffset < 0 || dataOffset.toLong + rowBytes.toLong * height > bytes.length) return None
    val lum = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val ro = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val o = ro + x * 3 // BGR byte order per spec
        val bl = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        lum(y * width + x) = (0.299f * r + 0.587f * g + 0.114f * bl)
        x += 1
      }
      y += 1
    }
    Some(Bmp(width, height, lum))
  }

  /** `featDim` grid-pooled mean-luminance cells in [0, 1] over a
    * near-square grid — the pooled-embedding shape a conv stem would
    * refine. Shared by every image decode path so features are
    * format-independent for identical pixel content. */
  def gridPoolFeatures(width: Int, height: Int, lum: Array[Float],
      featDim: Int): Array[Float] = {
    val cols = math.max(1, math.sqrt(featDim.toDouble).toInt)
    val rows = (featDim + cols - 1) / cols
    val out = new Array[Float](featDim)
    var f = 0
    while (f < featDim) {
      val cy = f / cols
      val cx = f % cols
      val x0 = cx * width / cols
      val x1 = math.max(x0 + 1, (cx + 1) * width / cols)
      val y0 = (cy % rows) * height / rows
      val y1 = math.max(y0 + 1, ((cy % rows) + 1) * height / rows)
      var acc = 0.0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { acc += lum(y * width + x); x += 1 }
        y += 1
      }
      out(f) = (acc / ((x1 - x0).toLong * (y1 - y0)) / 255.0).toFloat
      f += 1
    }
    out
  }

  /** Image features from the pure-JVM 24-bit BMP parser. */
  def bmpFeatures(bytes: Array[Byte], featDim: Int): Option[Array[Float]] =
    parseBmp(bytes).map(b => gridPoolFeatures(b.width, b.height, b.lum, featDim))

  /** Decoded PNG: width, height, row-major top-down luminance in [0,255]. */
  final case class Png(width: Int, height: Int, lum: Array[Float])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Own-kernel PNG decoder (public spec, RFC 2083 / W3C PNG): chunk walk →
    * concatenated-IDAT zlib inflate (`java.util.zip.Inflater` — the only
    * machinery borrowed, it ships in the JDK) → per-scanline unfiltering
    * (None/Sub/Up/Average/Paeth) → luminance. Supports the 8-bit-depth
    * color types (gray 0, RGB 2, palette 3, gray+alpha 4, RGBA 6),
    * non-interlaced — the overwhelming share of web PNGs. Anything else →
    * None (quarantine contract, like every parser here). Alpha is ignored:
    * luminance weights 0.299/0.587/0.114 match [[parseBmp]] so identical
    * pixel content gives identical features across container formats. */
  def parsePng(bytes: Array[Byte]): Option[Png] = {
    val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
    var pos = 8
    var width, height, bitDepth, colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos).toInt
      if (len < 0 || pos + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val body = pos + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, body).toInt
          height = be32(bytes, body + 4).toInt
          bitDepth = bytes(body + 8) & 0xff
          colorType = bytes(body + 9) & 0xff
          val interlace = bytes(body + 12) & 0xff
          if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0 ||
              !Set(0, 2, 3, 4, 6).contains(colorType)) return None
          // cap decoded size (defensive: a crafted IHDR could demand GBs)
          if (width.toLong * height > 64L * 1024 * 1024) return None
        case "PLTE" =>
          if (len % 3 != 0) return None
          palette = java.util.Arrays.copyOfRange(bytes, body, body + len)
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk — skip
      }
      pos = body + len + 4 // + CRC (not verified: tolerance over rejection)
    }
    if (width < 0 || idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()

    // unfilter in place into `img` (top-down rows of `stride` bytes)
    val img = new Array[Byte](stride * height)
    val bpp = channels // 8-bit depth: filter unit = one pixel's channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawV = raw(src + x) & 0xff
        val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0            // left
        val b = if (y > 0) img(dst - stride + x) & 0xff else 0            // up
        val c = if (x >= bpp && y > 0) img(dst - stride + x - bpp) & 0xff else 0 // up-left
        val v = filter match {
          case 0 => rawV
          case 1 => rawV + a
          case 2 => rawV + b
          case 3 => rawV + ((a + b) >> 1)
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            rawV + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        img(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }

    val lum = new Array[Float](width * height)
    var p = 0
    while (p < width * height) {
      val o = p * channels
      lum(p) = colorType match {
        case 0 | 4 => (img(o) & 0xff).toFloat
        case 2 | 6 =>
          0.299f * (img(o) & 0xff) + 0.587f * (img(o + 1) & 0xff) +
            0.114f * (img(o + 2) & 0xff)
        case 3 =>
          val pi = (img(o) & 0xff) * 3
          if (pi + 2 >= palette.length) return None
          0.299f * (palette(pi) & 0xff) + 0.587f * (palette(pi + 1) & 0xff) +
            0.114f * (palette(pi + 2) & 0xff)
      }
      p += 1
    }
    Some(Png(width, height, lum))
  }

  /** Image features from the own-kernel PNG decoder. */
  def pngFeatures(bytes: Array[Byte], featDim: Int): Option[Array[Float]] =
    parsePng(bytes).map(p => gridPoolFeatures(p.width, p.height, p.lum, featDim))

  // ------------------------------------------------------------- encoders
  // The write-side halves (media sink parity + analytic decode fixtures).

  /** Encode an uncompressed 24-bit BITMAPINFOHEADER BMP (bottom-up rows,
    * 4-byte padding — the exact flavor [[parseBmp]] reads). */
  def encodeBmp24(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize); put32(10, 54); put32(14, 40)
    put32(18, width); put32(22, height) // positive = bottom-up
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, dataSize)
    var y = 0
    while (y < height) {
      val ro = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(ro + x * 3) = b.toByte // BGR
        out(ro + x * 3 + 1) = g.toByte
        out(ro + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a PCM16 mono RIFF/WAVE container ([[parseWav]]'s flavor). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def tag(o: Int, s: String): Unit = s.zipWithIndex.foreach { case (c, i) => out(o + i) = c.toByte }
    tag(0, "RIFF"); put32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2); put16(34, 16)
    tag(36, "data"); put32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Image features for COMPRESSED formats (PNG/JPEG/GIF/WBMP) through
    * the JDK's own javax.imageio readers — part of the standard library,
    * so still zero external dependencies. Luminance uses the same
    * 0.299/0.587/0.114 weights as [[parseBmp]], so identical pixel
    * content yields identical features regardless of container format.
    * Returns None for unrecognized/corrupt payloads (the decoder SPI's
    * quarantine contract). */
  def imageioFeatures(bytes: Array[Byte], featDim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val lum = new Array[Float](w * h)
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < lum.length) {
        val p = rgb(i)
        lum(i) = 0.299f * ((p >> 16) & 0xff) + 0.587f * ((p >> 8) & 0xff) +
          0.114f * (p & 0xff)
        i += 1
      }
      Some(gridPoolFeatures(w, h, lum, featDim))
    } catch { case _: Exception => None }
  }
}
