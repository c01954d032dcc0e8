package graft.tools

/** One-shot video fixture generator + digest pinning helper (dev tool). */
object GenVideo {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.{ImageCodec, ImageFixtures, VideoContainer}
    val dir = java.nio.file.Paths.get("src/main/resources/graft/video")
    ImageFixtures.generateVideos(dir)
    (0 until ImageFixtures.VideoN).foreach { v =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(s"clip$v.mjpg"))
      val n = VideoContainer.frameCount(bytes)
      // every 3rd frame, like the sampled gate
      (0 until n by 3).foreach { f =>
        val d = ImageCodec.decode(VideoContainer.frame(bytes, f))
        val (mr, mg, mb) = ImageCodec.channelMeans(d)
        println(s"PIN|$v|$f|${d.width}|${d.height}|${ImageCodec.md5Hex(d.rgb)}|$mr")
      }
    }
  }
}
