package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ImageCodec, ImageFixtures}

/** Real image codec (r14): the checked-in fixture PNGs must decode —
  * via javax.imageio, the production path — to the pure FORMULA that
  * generated them (independent ground truth), the deterministic resize
  * must match a naive reference, and the pinned oracle constants must
  * match a fresh engine computation (so platform decoder drift fails
  * here before it can fail the driver's oracle run).
  */
class ImageCodecSpec extends AnyFunSuite {

  test("checked-in PNGs decode bit-exactly to the generating formula") {
    (0 until ImageFixtures.N).foreach { i =>
      val dec = ImageCodec.decode(ImageFixtures.pngBytes(i))
      val truth = ImageFixtures.formula(i)
      assert(dec.width === truth.width && dec.height === truth.height)
      assert(dec.rgb === truth.rgb, s"pixel drift in img$i.png")
    }
  }

  test("resizeNearest matches a naive independent reference") {
    val src = ImageFixtures.formula(3)
    val (ow, oh) = ImageCodec.fitBox(src.width, src.height, 64)
    val fast = ImageCodec.resizeNearest(src, ow, oh)
    // naive reference: per-pixel recomputation, no shared loop structure
    for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3) {
      val sx = math.min(src.width - 1, ((x + 0.5) * src.width / ow).floor.toInt)
      val sy = math.min(src.height - 1, ((y + 0.5) * src.height / oh).floor.toInt)
      assert(fast.rgb((y * ow + x) * 3 + c) === src.rgb((sy * src.width + sx) * 3 + c))
    }
  }

  test("fitBox: aspect-preserving, never zero, upscale-capped at the box") {
    assert(ImageCodec.fitBox(16, 12, 64) === ((64, 48)))
    assert(ImageCodec.fitBox(100, 10, 64) === ((64, 6)))
    assert(ImageCodec.fitBox(10, 100, 64) === ((6, 64)))
    assert(ImageCodec.fitBox(1000, 1, 64) === ((64, 1)))
  }

  test("pinned oracle constants match a fresh decode+resize (drift canary)") {
    graft.queries.MultimodalQueries.pins.foreach {
      case (i, w, h, md5p, mr, mg, mb, ow, oh, md5r) =>
        val dec = ImageCodec.decode(ImageFixtures.pngBytes(i))
        assert((dec.width, dec.height) === ((w, h)))
        assert(ImageCodec.md5Hex(dec.rgb) === md5p, s"decode digest img$i")
        val (gmr, gmg, gmb) = ImageCodec.channelMeans(dec)
        assert((gmr, gmg, gmb) === ((mr, mg, mb)))
        val (gow, goh) = ImageCodec.fitBox(dec.width, dec.height, 64)
        assert((gow, goh) === ((ow, oh)))
        assert(ImageCodec.md5Hex(
          ImageCodec.resizeNearest(dec, gow, goh).rgb) === md5r,
          s"resize digest img$i")
    }
  }

  test("MJPEG-style container: frame walk skips without decoding, frames " +
       "decode to their formula, pins match") {
    import graft.multimodal.VideoContainer
    (0 until ImageFixtures.VideoN).foreach { v =>
      val bytes = ImageFixtures.videoBytes(v)
      assert(VideoContainer.frameCount(bytes) === ImageFixtures.FramesPerClip)
      (0 until ImageFixtures.FramesPerClip).foreach { f =>
        val dec = ImageCodec.decode(VideoContainer.frame(bytes, f))
        val truth = ImageFixtures.videoFrameTruth(v, f)
        assert(dec.rgb === truth.rgb, s"frame drift clip$v frame $f")
      }
    }
    graft.queries.MultimodalQueries.videoPins.foreach {
      case (v, f, w, h, md5f, mr) =>
        val dec = ImageCodec.decode(
          VideoContainer.frame(ImageFixtures.videoBytes(v), f))
        assert((dec.width, dec.height) === ((w, h)))
        assert(ImageCodec.md5Hex(dec.rgb) === md5f)
        assert(ImageCodec.channelMeans(dec)._1 === mr)
    }
  }

  test("JPEG decodes through the same path (lossy: tolerance on means)") {
    val truth = ImageFixtures.formula(2)
    val jpeg = ImageCodec.encodeJpeg(truth)
    val dec = ImageCodec.decode(jpeg)
    assert(dec.width === truth.width && dec.height === truth.height)
    val (tr, tg, tb) = ImageCodec.channelMeans(truth)
    val (jr, jg, jb) = ImageCodec.channelMeans(dec)
    assert(math.abs(tr - jr) < 8 && math.abs(tg - jg) < 8 && math.abs(tb - jb) < 8,
      s"jpeg means drifted: ($tr,$tg,$tb) vs ($jr,$jg,$jb)")
  }

  test("undecodable payloads throw (pipeline quarantine contract)") {
    intercept[IllegalArgumentException] {
      ImageCodec.decode("not an image".getBytes)
    }
  }
}
