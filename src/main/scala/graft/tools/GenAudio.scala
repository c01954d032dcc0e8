package graft.tools

/** One-shot audio fixture generator + digest pinning helper (dev tool). */
object GenAudio {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.{AudioCodec, AudioFixtures}
    val dir = java.nio.file.Paths.get("src/main/resources/graft/audio")
    AudioFixtures.generate(dir)
    (0 until AudioFixtures.N).foreach { i =>
      val bytes = java.nio.file.Files.readAllBytes(dir.resolve(s"clip$i.wav"))
      val d = AudioCodec.decodeWav(bytes)
      val ds = AudioCodec.decimate(d, 4)
      println(s"PIN|$i|${d.sampleRate}|${d.channels}|${d.samples.length}|" +
        s"${AudioCodec.pcmMd5(d)}|${AudioCodec.rms(d)}|${AudioCodec.peak(d)}|" +
        s"${AudioCodec.zeroCrossings(d)}|${ds.samples.length}|${AudioCodec.pcmMd5(ds)}")
    }
  }
}
