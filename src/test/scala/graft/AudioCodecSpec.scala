package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AudioCodec, AudioFixtures}

/** Real audio codec (r14): checked-in WAVs must decode — via
  * javax.sound.sampled, the production path — to the pure INTEGER
  * formulas that generated them; the feature kernels and decimation
  * match naive references; and the pinned oracle constants match a
  * fresh engine computation (platform drift fails here first).
  */
class AudioCodecSpec extends AnyFunSuite {

  test("checked-in WAVs decode bit-exactly to the generating formulas") {
    (0 until AudioFixtures.N).foreach { i =>
      val dec = AudioCodec.decodeWav(AudioFixtures.wavBytes(i))
      val truth = AudioFixtures.formula(i)
      assert(dec.sampleRate === truth.sampleRate)
      assert(dec.channels === truth.channels)
      assert(dec.samples === truth.samples, s"sample drift in clip$i.wav")
    }
  }

  test("encode -> decode round-trips PCM16 losslessly") {
    val truth = AudioFixtures.formula(3) // stereo
    val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(truth))
    assert(dec.samples === truth.samples)
    assert(dec.channels === 2)
  }

  test("feature kernels match naive references") {
    val d = AudioFixtures.formula(1)
    val naive = d.samples.map(_.toDouble)
    assert(AudioCodec.rms(d) ===
      math.sqrt(naive.map(x => x * x).sum / naive.length))
    assert(AudioCodec.peak(d) === naive.map(x => math.abs(x).toInt).max)
    // mono zero crossings: count sign flips over nonzero samples
    val nz = d.samples.filter(_ != 0).map(s => if (s > 0) 1 else -1)
    assert(AudioCodec.zeroCrossings(d) ===
      nz.sliding(2).count(p => p.length == 2 && p(0) != p(1)).toLong)
  }

  test("decimate keeps every 4th frame, all channels, and divides the rate") {
    val d = AudioFixtures.formula(3)
    val ds = AudioCodec.decimate(d, 4)
    assert(ds.sampleRate === d.sampleRate / 4)
    assert(ds.channels === d.channels)
    val frames = d.samples.length / d.channels
    val expected = (0 until frames by 4).flatMap(f =>
      (0 until d.channels).map(c => d.samples(f * d.channels + c))).toArray
    assert(ds.samples === expected)
  }

  test("pinned oracle constants match a fresh decode (drift canary)") {
    graft.queries.MultimodalQueries.audioPins.foreach {
      case (i, sr, ch, n, md5p, rms, pk, zc, dn, dmd5) =>
        val dec = AudioCodec.decodeWav(AudioFixtures.wavBytes(i))
        assert((dec.sampleRate, dec.channels, dec.samples.length.toLong) ===
          ((sr, ch, n)))
        assert(AudioCodec.pcmMd5(dec) === md5p, s"pcm digest clip$i")
        assert(AudioCodec.rms(dec) === rms)
        assert(AudioCodec.peak(dec) === pk)
        assert(AudioCodec.zeroCrossings(dec) === zc)
        val ds = AudioCodec.decimate(dec, 4)
        assert(ds.samples.length.toLong === dn)
        assert(AudioCodec.pcmMd5(ds) === dmd5, s"decimated digest clip$i")
    }
  }

  test("undecodable / non-PCM16 payloads throw (quarantine contract)") {
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("not audio".getBytes)
    }
  }
}
