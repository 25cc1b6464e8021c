package graft

import graft.audio.Pcm
import graft.synth.ClipSynth
import org.scalatest.funsuite.AnyFunSuite

class PcmSpec extends AnyFunSuite {

  val sr = 16000
  val dur = 200
  val samples: Array[Short] = Pcm.tone(440.0, sr, dur)

  test("tone is deterministic and correctly sized") {
    assert(samples.length === sr * dur / 1000)
    assert(samples.sameElements(Pcm.tone(440.0, sr, dur)))
    assert(samples.max <= (0.8 * 32767).toInt + 1)
  }

  test("pcm16le round-trip is lossless") {
    val rt = Pcm.pcm16leDecode(Pcm.pcm16leEncode(samples))
    assert(rt.sameElements(samples))
    assert(Pcm.snrDb(samples, rt) === Pcm.PerfectSnrDb)
  }

  test("ulaw round-trip passes the 30 dB gate (lossy, ~35-40 dB)") {
    val snr = Pcm.roundTripSnrDb(Pcm.Ulaw, Pcm.ulawEncode(samples), samples)
    assert(snr >= 30.0, s"ulaw SNR $snr")
    assert(snr < 60.0, s"ulaw should be lossy, got $snr")
  }

  test("pcm8 round-trip passes the 30 dB gate") {
    val snr = Pcm.roundTripSnrDb(Pcm.Pcm8, Pcm.pcm8Encode(samples), samples)
    assert(snr >= 30.0, s"pcm8 SNR $snr")
  }

  test("ulaw known-value spot checks (G.711 symmetry + idempotent re-encode)") {
    // decoded values must be fixed points of the companding (G.711 has two
    // zero codes, 0x7F/0xFF, so the ENCODED byte is not a fixed point at +-0
    // — the decoded value is)
    for (s <- Seq[Short](0, 1, -1, 100, -100, 8000, -8000, 32000, -32000)) {
      val dec = Pcm.ulawDecodeSample(Pcm.ulawEncodeSample(s))
      val dec2 = Pcm.ulawDecodeSample(Pcm.ulawEncodeSample(dec))
      assert(dec2 === dec, s"decoded value not a fixpoint at $s: $dec -> $dec2")
      // companding error bounded by segment width (max 1 quantization step)
      assert(math.abs(dec - s) <= 1024, s"decode too far at $s: $dec")
    }
  }

  test("snrDb length mismatch and silence edge cases") {
    assert(Pcm.snrDb(Array[Short](1, 2), Array[Short](1)) === -1.0)
    assert(Pcm.snrDb(Array[Short](0, 0), Array[Short](0, 0)) === Pcm.PerfectSnrDb)
  }

  test("ClipSynth rows are deterministic and decodable at the gate") {
    for (i <- 0L until 50L) {
      val a = ClipSynth.clip(i)
      val b = ClipSynth.clip(i)
      assert(a.clip_id === b.clip_id && a.bytes.sameElements(b.bytes) &&
        a.transcript === b.transcript)
      val ref = ClipSynth.samples(i)
      val snr = Pcm.roundTripSnrDb(a.codec, a.bytes, ref)
      assert(snr >= 30.0, s"clip $i codec ${a.codec} snr $snr")
    }
  }

  test("ClipSynth distributions roughly match FIXTURES weights") {
    val n = 5000
    val codecs = (0 until n).map(i => ClipSynth.codec(i.toLong))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(codecs(Pcm.Pcm16le) / n.toDouble - 0.70) < 0.05)
    assert(math.abs(codecs(Pcm.Ulaw) / n.toDouble - 0.25) < 0.05)
    val hot = (0 until n).count(i => ClipSynth.durMs(i.toLong) == 100)
    assert(hot > n / 10, s"skew injection too weak: $hot")
  }
}
