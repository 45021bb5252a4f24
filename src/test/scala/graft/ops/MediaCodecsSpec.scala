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
}
