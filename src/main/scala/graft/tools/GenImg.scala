package graft.tools

/** One-shot fixture generator + digest pinning helper (dev tool). */
object GenImg {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.{ImageCodec, ImageFixtures}
    val dir = java.nio.file.Paths.get("src/main/resources/graft/images")
    ImageFixtures.generate(dir)
    (0 until ImageFixtures.N).foreach { i =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(s"img$i.png"))
      val d = ImageCodec.decode(bytes)
      val (ow, oh) = ImageCodec.fitBox(d.width, d.height, 64)
      val rs = ImageCodec.resizeNearest(d, ow, oh)
      val (mr, mg, mb) = ImageCodec.channelMeans(d)
      println(s"PIN|$i|${d.width}|${d.height}|${ImageCodec.md5Hex(d.rgb)}|$mr|$mg|$mb|$ow|$oh|${ImageCodec.md5Hex(rs.rgb)}")
    }
  }
}
