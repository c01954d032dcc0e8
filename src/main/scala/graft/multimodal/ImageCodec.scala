package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec for the multimodal surface (r14): decode via
  * `javax.imageio` (PNG/JPEG readers ship with every JVM — no external
  * codec dependency, works offline), resize via our own deterministic
  * nearest-neighbor arithmetic (Graphics2D scaling is
  * platform/render-hint dependent; pinned-digest oracles need bit-exact
  * pixels everywhere). Pixels normalize through `getRGB` to ARGB ints,
  * so the packed raster layout ImageIO happens to pick never leaks into
  * results. Reference analog: the media decode path of the reference's
  * AI pipeline surface (images as first-class payloads).
  *
  * PNG is lossless — decode digests are pinned in the oracle. JPEG
  * decode is deterministic per JVM but not across decoder generations,
  * so JPEG coverage lives in ImageCodecSpec (round-trip tolerance), not
  * in pinned digests.
  */
object ImageCodec {

  /** Decoded image: width, height, row-major RGB triplets. */
  final case class Decoded(width: Int, height: Int, rgb: Array[Byte])

  /** Decode PNG/JPEG/GIF/BMP bytes. Throws IllegalArgumentException on
    * undecodable payloads (callers on the pipeline path should filter or
    * quarantine, not silently zero-fill). */
  def decode(bytes: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "imagecodec: undecodable payload")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y) // ARGB, layout-independent
        out(i) = ((p >> 16) & 0xFF).toByte
        out(i + 1) = ((p >> 8) & 0xFF).toByte
        out(i + 2) = (p & 0xFF).toByte
        x += 1
        i += 3
      }
      y += 1
    }
    Decoded(w, h, out)
  }

  /** Content-addressed decode memo: a corpus carries far fewer DISTINCT
    * assets than rows referencing them (and fixtures reuse 8 images
    * across every row) — cache decoded pixels by payload digest, bounded
    * per executor JVM. */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Decoded]()
  def decodeCached(bytes: Array[Byte]): Decoded = {
    val key = md5Hex(bytes)
    val hit = decodeCache.get(key)
    if (hit != null) hit
    else {
      val d = decode(bytes)
      if (decodeCache.size > 64) decodeCache.clear()
      decodeCache.put(key, d)
      d
    }
  }

  /** Aspect-preserving fit of (w, h) into a `box`×`box` square. */
  def fitBox(w: Int, h: Int, box: Int): (Int, Int) = {
    val scale = math.min(box.toDouble / w, box.toDouble / h)
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** Deterministic nearest-neighbor resize: source pixel of output (x,y)
    * is floor((x + 0.5) * srcW / dstW) — pure arithmetic, identical on
    * every platform (no Graphics2D render hints). */
  def resizeNearest(src: Decoded, dstW: Int, dstH: Int): Decoded = {
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    var i = 0
    while (y < dstH) {
      val sy = math.min(src.height - 1,
        math.floor((y + 0.5) * src.height / dstH).toInt)
      var x = 0
      while (x < dstW) {
        val sx = math.min(src.width - 1,
          math.floor((x + 0.5) * src.width / dstW).toInt)
        val si = (sy * src.width + sx) * 3
        out(i) = src.rgb(si)
        out(i + 1) = src.rgb(si + 1)
        out(i + 2) = src.rgb(si + 2)
        x += 1
        i += 3
      }
      y += 1
    }
    Decoded(dstW, dstH, out)
  }

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Per-channel means of the RGB buffer as exact integer-sum / count. */
  def channelMeans(d: Decoded): (Double, Double, Double) = {
    var (r, g, b) = (0L, 0L, 0L)
    var i = 0
    while (i < d.rgb.length) {
      r += d.rgb(i) & 0xFF; g += d.rgb(i + 1) & 0xFF; b += d.rgb(i + 2) & 0xFF
      i += 3
    }
    val n = (d.rgb.length / 3).toDouble
    (r / n, g / n, b / n)
  }

  def encodePng(d: Decoded): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(d.width, d.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        img.setRGB(x, y, ((d.rgb(i) & 0xFF) << 16) |
          ((d.rgb(i + 1) & 0xFF) << 8) | (d.rgb(i + 2) & 0xFF))
        x += 1; i += 3
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def encodeJpeg(d: Decoded): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(d.width, d.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        img.setRGB(x, y, ((d.rgb(i) & 0xFF) << 16) |
          ((d.rgb(i + 1) & 0xFF) << 8) | (d.rgb(i + 2) & 0xFF))
        x += 1; i += 3
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
}

/** Motion-JPEG-style video container: length-prefixed frames, each an
  * independently-decodable still (the MJPEG idea — the only video form
  * expressible with the JVM's built-in codecs, and a real one: MJPEG is
  * what many capture pipelines emit). Layout: 4-byte big-endian frame
  * count, then per frame a 4-byte big-endian byte length + the encoded
  * image bytes (PNG or JPEG — ImageIO sniffs). */
object VideoContainer {
  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(frames.size)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    d.flush()
    out.toByteArray
  }

  def frameCount(bytes: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt

  /** The encoded bytes of frame `i` (no decode — container walk only). */
  def frame(bytes: Array[Byte], i: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(i >= 0 && i < n, s"videocontainer: frame $i of $n")
    var k = 0
    while (k < i) {
      val len = bb.getInt // read BEFORE taking position: getInt advances
      bb.position(bb.position() + len)
      k += 1
    }
    val len = bb.getInt
    val out = new Array[Byte](len)
    bb.get(out)
    out
  }
}

/** The checked-in image fixtures: 8 PNGs whose pixels follow a pure
  * FORMULA (the independent ground truth ImageCodecSpec decodes
  * against), shipped as main resources so the gate queries and the
  * driver's Verify run can read them. `ImageFixtures.generate` rewrites
  * them — the spec proves the checked-in bytes still decode to the
  * formula, so fixture drift cannot hide. */
object ImageFixtures {
  val N = 8

  def dims(i: Int): (Int, Int) = (16 + 5 * i, 12 + 3 * i)

  /** Formula pixels of fixture image `i` (the ground truth). */
  def formula(i: Int): ImageCodec.Decoded = {
    val (w, h) = dims(i)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    var k = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        rgb(k) = ((x * 7 + y * 3 + i * 11) % 256).toByte
        rgb(k + 1) = ((x * 2 + y * 13 + i * 5) % 256).toByte
        rgb(k + 2) = ((x * 11 + y * 7 + i * 3) % 256).toByte
        x += 1; k += 3
      }
      y += 1
    }
    ImageCodec.Decoded(w, h, rgb)
  }

  /** Checked-in PNG bytes of fixture `i` (classpath resource). */
  def pngBytes(i: Int): Array[Byte] = {
    val is = getClass.getResourceAsStream(s"/graft/images/img$i.png")
    require(is != null, s"missing resource graft/images/img$i.png")
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      out.toByteArray
    } finally is.close()
  }

  /** (Re)write the fixture PNGs under `dir` from the formula. */
  def generate(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    (0 until N).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"img$i.png"),
        ImageCodec.encodePng(formula(i)))
    }
  }

  /** Two checked-in MJPEG-style clips built from the image formulas:
    * clip v carries 10 PNG frames — frame f is formula((v*3 + f) % N)
    * resized-by-formula? No: raw formula images, so every frame's
    * ground truth is the same pure arithmetic the stills use. */
  val VideoN = 2
  val FramesPerClip = 10

  def videoFrameTruth(v: Int, f: Int): ImageCodec.Decoded =
    formula((v * 3 + f) % N)

  def videoBytes(v: Int): Array[Byte] = {
    val is = getClass.getResourceAsStream(s"/graft/video/clip$v.mjpg")
    require(is != null, s"missing resource graft/video/clip$v.mjpg")
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      out.toByteArray
    } finally is.close()
  }

  def generateVideos(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    (0 until VideoN).foreach { v =>
      val frames = (0 until FramesPerClip).map(f =>
        ImageCodec.encodePng(videoFrameTruth(v, f)))
      java.nio.file.Files.write(dir.resolve(s"clip$v.mjpg"),
        VideoContainer.pack(frames))
    }
  }
}
