package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Builders emit spec-conformant WAV/BMP bytes so the decoders are tested
  * against the real wire formats, not against themselves. */
object MediaFixtures {

  def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short],
      extraChunk: Boolean = false): Array[Byte] = {
    val dataSz = samples.length * 2
    val listSz = if (extraChunk) 12 else 0 // optional LIST chunk before data
    val riffSz = 4 + 24 + listSz + 8 + dataSz
    val out = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(riffSz).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    if (extraChunk) out.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    out.put("data".getBytes).putInt(dataSz)
    samples.foreach(out.putShort)
    out.array()
  }

  def bmp24(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSz = rowBytes * height
    val out = java.nio.ByteBuffer.allocate(54 + dataSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSz)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height) // positive = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataSz)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // file rows run bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }
}

class MediaCodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("wav: parse rate/channels/samples, skip extra chunks, reject non-pcm") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12, -12, 0)
    val bytes = MediaFixtures.wavPcm16(16000, 2, samples, extraChunk = true)
    val w = MediaCodecs.parseWav(bytes).get
    assert(w.sampleRate == 16000 && w.channels == 2)
    assert(w.samples.toSeq == samples.toSeq)
    // corrupt the format tag → rejected, not thrown
    val bad = bytes.clone(); bad(20) = 3 // IEEE float tag
    assert(MediaCodecs.parseWav(bad).isEmpty)
    assert(MediaCodecs.parseWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("wav features: silence is zero, loud frame dominates") {
    // frame 0 silent, frame 1 full-scale square wave
    val samples = Array.fill[Short](100)(0) ++
      Array.tabulate[Short](100)(i => if (i % 2 == 0) 32767 else -32767)
    val f = MediaCodecs.wavFeatures(
      MediaFixtures.wavPcm16(8000, 1, samples), 2).get
    assert(f(0) == 0.0f)
    assert(f(1) > 0.99f)
  }

  test("bmp: bottom-up rows and BGR order decode to top-down luminance") {
    // 2x2: top-left pure red, top-right pure green,
    //      bottom-left pure blue, bottom-right white
    val bytes = MediaFixtures.bmp24(2, 2, {
      case (0, 0) => (255, 0, 0)
      case (1, 0) => (0, 255, 0)
      case (0, 1) => (0, 0, 255)
      case _ => (255, 255, 255)
    })
    val b = MediaCodecs.parseBmp(bytes).get
    assert(b.width == 2 && b.height == 2)
    // ITU-R 601 luma: R=76.2, G=149.7, B=29.1, white=255
    assert(math.abs(b.lum(0) - 0.299f * 255) < 0.01)
    assert(math.abs(b.lum(1) - 0.587f * 255) < 0.01)
    assert(math.abs(b.lum(2) - 0.114f * 255) < 0.01)
    assert(math.abs(b.lum(3) - 255f) < 0.01)
    assert(MediaCodecs.parseBmp("notabmp".getBytes).isEmpty)
  }

  test("bmp features: grid pooling averages the right cells") {
    // 4x4, left half black, right half white → 4-cell grid = [0,1,0,1]
    val bytes = MediaFixtures.bmp24(4, 4,
      (x, _) => if (x < 2) (0, 0, 0) else (255, 255, 255))
    val f = MediaCodecs.bmpFeatures(bytes, 4).get
    assert(f.toSeq == Seq(0.0f, 1.0f, 0.0f, 1.0f))
  }

  test("RealDecoder drives the distributed extract stage end to end") {
    import spark.implicits._
    val wav = MediaFixtures.wavPcm16(8000, 1, Array.tabulate[Short](64)(i => (i * 100).toShort))
    val img = MediaFixtures.bmp24(8, 8, (x, y) => (x * 30, y * 30, 128))
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 0, 0, 8000, 0),
      Multimodal.MediaRow(2L, "image", img, 8, 8, 0, 0),
      Multimodal.MediaRow(3L, "video", Array[Byte](1, 2, 3), 320, 240, 0, 30),
      Multimodal.MediaRow(4L, "audio", Array[Byte](9, 9), 0, 0, 8000, 0))
    val out = Multimodal.extractFeatures(rows.toDS(), featDim = 4,
      decoder = Multimodal.RealDecoder).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).ok && out(1L).features.length == 4)
    assert(out(2L).ok && out(2L).features.length == 4)
    assert(!out(3L).ok) // video: compressed formats stay behind the seam
    assert(!out(4L).ok) // corrupt audio degrades to ok=false, no task failure
    // determinism across partitionings
    val again = Multimodal.extractFeatures(rows.toDS().repartition(3), featDim = 4,
      decoder = Multimodal.RealDecoder).collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(again(1L) == out(1L).features.toSeq)
    assert(again(2L) == out(2L).features.toSeq)
  }

  /** Encode the same pixel function through the JDK's ImageIO writer. */
  private def imageioBytes(fmt: String, width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = rgb(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("imageio path decodes PNG to the exact features of the equivalent BMP") {
    val pix = (x: Int, y: Int) => (x * 29 % 256, y * 53 % 256, (x + y) * 11 % 256)
    val png = MediaCodecs.imageioFeatures(imageioBytes("png", 9, 7, pix), 8)
    val bmp = MediaCodecs.bmpFeatures(MediaFixtures.bmp24(9, 7, pix), 8)
    // PNG is lossless and both paths share luminance + grid pooling
    assert(png.isDefined && bmp.isDefined)
    assert(png.get.toSeq == bmp.get.toSeq)
  }

  test("imageio path decodes JPEG and GIF; garbage returns None") {
    val pix = (x: Int, y: Int) => (128, (x * 16) % 256, (y * 16) % 256)
    val jpg = MediaCodecs.imageioFeatures(imageioBytes("jpg", 16, 16, pix), 4)
    assert(jpg.isDefined && jpg.get.length == 4 && jpg.get.forall(f => f >= 0f && f <= 1f))
    val gif = MediaCodecs.imageioFeatures(imageioBytes("gif", 16, 16, pix), 4)
    assert(gif.isDefined && gif.get.length == 4)
    assert(MediaCodecs.imageioFeatures(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9), 4).isEmpty)
    assert(MediaCodecs.imageioFeatures(null, 4).isEmpty)
  }

  test("RealDecoder now accepts compressed image formats via imageio") {
    val pix = (x: Int, y: Int) => (x * 10 % 256, y * 10 % 256, 7)
    val png = imageioBytes("png", 12, 12, pix)
    val f = Multimodal.RealDecoder.decode("image", png, 4)
    assert(f.isDefined && f.get.length == 4)
  }

  // ----------------------------------------------- own-kernel PNG decoder

  /** Minimal PNG writer for fixtures: 8-bit depth, chosen color type and a
    * FIXED filter id applied to every scanline (exercises each unfilter
    * branch deterministically — ImageIO's encoder picks filters
    * adaptively, so it can't). */
  private def pngBytes(width: Int, height: Int, colorType: Int, filter: Int,
      px: (Int, Int) => Array[Int], palette: Array[Byte] = null): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    val stride = width * channels
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val img = Array.tabulate(height, stride) { (y, i) => px(i / channels, y)(i % channels) }
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until height) {
      raw.write(filter)
      for (x <- 0 until stride) {
        val orig = img(y)(x)
        val a = if (x >= channels) img(y)(x - channels) else 0
        val b = if (y > 0) img(y - 1)(x) else 0
        val c = if (x >= channels && y > 0) img(y - 1)(x - channels) else 0
        val v = filter match {
          case 0 => orig
          case 1 => orig - a
          case 2 => orig - b
          case 3 => orig - ((a + b) >> 1)
          case 4 => orig - paeth(a, b, c)
        }
        raw.write(v & 0xff)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Long): Unit =
        (3 to 0 by -1).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      be(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be(crc.getValue)
      out.toByteArray
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit =
      (3 to 0 by -1).foreach(i => ihdr.write((v >> (8 * i)) & 0xff))
    be32(width); be32(height)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(chunk("IHDR", ihdr.toByteArray))
    if (palette != null) out.write(chunk("PLTE", palette))
    out.write(chunk("IDAT", comp.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("png kernel: every filter type reconstructs the original pixels (RGB)") {
    val px = (x: Int, y: Int) => Array(x * 37 % 256, y * 91 % 256, (x * y + 13) % 256)
    val expected = MediaCodecs.parsePng(pngBytes(11, 9, 2, 0, px)).get
    for (f <- 1 to 4) {
      val got = MediaCodecs.parsePng(pngBytes(11, 9, 2, f, px))
      assert(got.isDefined, s"filter $f failed to parse")
      assert(got.get.lum.toSeq == expected.lum.toSeq, s"filter $f mismatch")
    }
  }

  test("png kernel: gray, gray+alpha, RGBA and palette color types decode") {
    val g = MediaCodecs.parsePng(pngBytes(6, 5, 0, 1, (x, y) => Array((x * 40 + y) % 256)))
    assert(g.isDefined && g.get.lum(0) == 0f && g.get.lum(1) == 40f)
    val ga = MediaCodecs.parsePng(pngBytes(6, 5, 4, 2,
      (x, y) => Array((x * 40 + y) % 256, 200)))
    assert(ga.isDefined && ga.get.lum.toSeq == g.get.lum.toSeq) // alpha ignored
    val rgba = MediaCodecs.parsePng(pngBytes(6, 5, 6, 4,
      (x, y) => Array(x * 30 % 256, y * 50 % 256, 9, 128)))
    val rgb = MediaCodecs.parsePng(pngBytes(6, 5, 2, 4,
      (x, y) => Array(x * 30 % 256, y * 50 % 256, 9)))
    assert(rgba.isDefined && rgba.get.lum.toSeq == rgb.get.lum.toSeq)
    val pal = Array.tabulate(256 * 3)(i => ((i / 3 + i % 3) % 256).toByte)
    val p = MediaCodecs.parsePng(pngBytes(6, 5, 3, 3,
      (x, y) => Array((x * 11 + y * 7) % 256), palette = pal))
    assert(p.isDefined && p.get.width == 6 && p.get.height == 5)
  }

  test("png kernel: differential vs the JDK's independent decoder") {
    val pix = (x: Int, y: Int) => (x * 29 % 256, y * 53 % 256, (x + y) * 11 % 256)
    val bytes = imageioBytes("png", 13, 8, pix)
    val own = MediaCodecs.pngFeatures(bytes, 8)
    val jdk = MediaCodecs.imageioFeatures(bytes, 8)
    assert(own.isDefined, "own kernel rejected an ImageIO-written PNG")
    assert(own.get.toSeq == jdk.get.toSeq)
    // and equal to the same pixels through the BMP container
    val bmp = MediaCodecs.bmpFeatures(MediaFixtures.bmp24(13, 8, pix), 8)
    assert(own.get.toSeq == bmp.get.toSeq)
  }

  test("png kernel: corrupt and unsupported payloads return None") {
    val px = (x: Int, y: Int) => Array(x % 256, y % 256, 1)
    val good = pngBytes(8, 8, 2, 0, px)
    assert(MediaCodecs.parsePng(good).isDefined)
    assert(MediaCodecs.parsePng(good.take(40)).isEmpty)          // truncated
    assert(MediaCodecs.parsePng(good.updated(0, 0x00.toByte)).isEmpty) // bad sig
    val noPlte = pngBytes(4, 4, 3, 0, (x, y) => Array(0))        // palette missing
    assert(MediaCodecs.parsePng(noPlte).isEmpty)
    // truncated IDAT body (cut inside the zlib stream)
    val cut = good.dropRight(20)
    assert(MediaCodecs.parsePng(cut).isEmpty)
    assert(MediaCodecs.parsePng(null).isEmpty)
  }
}
