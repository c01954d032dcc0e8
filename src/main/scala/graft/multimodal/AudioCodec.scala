package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec for the multimodal surface (r14): WAV (RIFF PCM)
  * decode/encode via `javax.sound.sampled` — ships with every JVM,
  * headless-safe, works offline. 16-bit signed PCM is the contract
  * (the training-data interchange norm); feature kernels (RMS, peak,
  * zero crossings) and decimation run in exact integer arithmetic so
  * pinned-digest oracles hold on every platform. */
object AudioCodec {

  /** Decoded audio: rate, channel count, interleaved 16-bit samples. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                samples: Array[Short])

  /** Decode a WAV payload. Throws IllegalArgumentException on
    * undecodable or non-PCM16 payloads (pipeline quarantine contract,
    * like [[ImageCodec.decode]]). */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    val in: AudioInputStream =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException("audiocodec: undecodable payload", e)
      }
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
        s"audiocodec: only 16-bit signed PCM supported, got $fmt")
      val raw = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { raw.write(buf, 0, n); n = in.read(buf) }
      val b = raw.toByteArray
      val out = new Array[Short](b.length / 2)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < out.length) {
        val lo = b(2 * i) & 0xFF
        val hi = b(2 * i + 1) & 0xFF
        out(i) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
        i += 1
      }
      DecodedAudio(fmt.getSampleRate.toInt, fmt.getChannels, out)
    } finally in.close()
  }

  /** Content-addressed decode memo, like [[ImageCodec.decodeCached]]. */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DecodedAudio]()
  def decodeWavCached(bytes: Array[Byte]): DecodedAudio = {
    val key = ImageCodec.md5Hex(bytes)
    val hit = decodeCache.get(key)
    if (hit != null) hit
    else {
      val d = decodeWav(bytes)
      if (decodeCache.size > 64) decodeCache.clear()
      decodeCache.put(key, d)
      d
    }
  }

  def encodeWav(d: DecodedAudio): Array[Byte] = {
    val bytes = new Array[Byte](d.samples.length * 2)
    var i = 0
    while (i < d.samples.length) {
      bytes(2 * i) = (d.samples(i) & 0xFF).toByte // little-endian
      bytes(2 * i + 1) = ((d.samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(d.sampleRate.toFloat, 16, d.channels,
      true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      d.samples.length.toLong / d.channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Exact integer feature kernels over the interleaved sample stream. */
  def rms(d: DecodedAudio): Double = {
    if (d.samples.isEmpty) return 0.0
    var acc = 0L // max 2^31 per sample^2, 2^63/2^31 = 4B samples headroom
    var i = 0
    while (i < d.samples.length) {
      acc += d.samples(i).toLong * d.samples(i); i += 1
    }
    math.sqrt(acc.toDouble / d.samples.length)
  }

  def peak(d: DecodedAudio): Int = {
    var p = 0
    var i = 0
    while (i < d.samples.length) {
      val a = math.abs(d.samples(i).toInt)
      if (a > p) p = a
      i += 1
    }
    p
  }

  /** Sign changes along each channel, summed (silence-agnostic pitch
    * proxy; zero samples carry the previous sign). */
  def zeroCrossings(d: DecodedAudio): Long = {
    var total = 0L
    var ch = 0
    while (ch < d.channels) {
      var prev = 0
      var i = ch
      while (i < d.samples.length) {
        val s = d.samples(i).toInt
        if (s != 0) {
          val sign = if (s > 0) 1 else -1
          if (prev != 0 && sign != prev) total += 1
          prev = sign
        }
        i += d.channels
      }
      ch += 1
    }
    total
  }

  /** Keep every `factor`-th FRAME (all channels of it) — deterministic
    * decimation, the audio analog of the every-k-th frame sample. */
  def decimate(d: DecodedAudio, factor: Int): DecodedAudio = {
    require(factor >= 1, "audiocodec: decimation factor must be >= 1")
    val frames = d.samples.length / d.channels
    val outFrames = (frames + factor - 1) / factor
    val out = new Array[Short](outFrames * d.channels)
    var f = 0
    var o = 0
    while (f < frames) {
      var c = 0
      while (c < d.channels) {
        out(o) = d.samples(f * d.channels + c); o += 1; c += 1
      }
      f += factor
    }
    DecodedAudio(d.sampleRate / factor, d.channels, out)
  }

  /** md5 of the samples' little-endian byte image (the pinnable digest). */
  def pcmMd5(d: DecodedAudio): String = {
    val bytes = new Array[Byte](d.samples.length * 2)
    var i = 0
    while (i < d.samples.length) {
      bytes(2 * i) = (d.samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((d.samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    ImageCodec.md5Hex(bytes)
  }
}

/** Checked-in WAV fixtures: 4 clips whose samples follow pure INTEGER
  * formulas (square / sawtooth / triangle / LCG noise — no trig, so the
  * ground truth is bit-identical on every platform), shipped as main
  * resources. AudioCodecSpec proves the checked-in bytes still decode
  * to the formulas. */
object AudioFixtures {
  val N = 4

  /** Formula clip i: mono 8 kHz except i=3 (stereo). ~0.05 s each. */
  def formula(i: Int): AudioCodec.DecodedAudio = {
    val rate = 8000
    val channels = if (i == 3) 2 else 1
    val frames = 400 + 80 * i
    val out = new Array[Short](frames * channels)
    var f = 0
    var k = 0
    var lcg = 12345 + i
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val v: Int = i match {
          case 0 => if ((f / 25) % 2 == 0) 12000 else -12000 // square, 160 Hz
          case 1 => ((f % 50) * 800) - 19600 // sawtooth, 160 Hz
          case 2 => // triangle, 100 Hz
            val p = f % 80
            val up = if (p < 40) p else 80 - p
            up * 800 - 16000
          case _ => // deterministic LCG noise, per-channel phase
            lcg = lcg * 1103515245 + 12345 + c
            (lcg >> 16) % 16000
        }
        out(k) = v.toShort
        k += 1; c += 1
      }
      f += 1
    }
    AudioCodec.DecodedAudio(rate, channels, out)
  }

  def wavBytes(i: Int): Array[Byte] = {
    val is = getClass.getResourceAsStream(s"/graft/audio/clip$i.wav")
    require(is != null, s"missing resource graft/audio/clip$i.wav")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      out.toByteArray
    } finally is.close()
  }

  def generate(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    (0 until N).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"clip$i.wav"),
        AudioCodec.encodeWav(formula(i)))
    }
  }
}
