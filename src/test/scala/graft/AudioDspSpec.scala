package graft

import graft.audio.{Dsp, Pcm}
import graft.synth.ClipSynth
import org.scalatest.funsuite.AnyFunSuite

class AudioDspSpec extends AnyFunSuite {

  test("linear resample of a pure tone tracks the analytic tone at the target rate") {
    // clean pcm16 path: 8k -> 16k of a 440 Hz tone must stay close to the
    // analytically regenerated 16 kHz tone (linear-interp error only)
    val src = Pcm.tone(440.0, 8000, 500)
    val rs = Dsp.resampleLinear(src, 8000, 16000)
    val ref = Pcm.tone(440.0, 16000, 500)
    val n = math.min(rs.length, ref.length)
    val snr = Pcm.snrDb(java.util.Arrays.copyOf(ref, n), java.util.Arrays.copyOf(rs, n))
    assert(snr > 30.0, s"8k->16k resample SNR $snr")
    // downsample: 44.1k -> 16k
    val src2 = Pcm.tone(440.0, 44100, 500)
    val rs2 = Dsp.resampleLinear(src2, 44100, 16000)
    val n2 = math.min(rs2.length, ref.length)
    val snr2 = Pcm.snrDb(java.util.Arrays.copyOf(ref, n2), java.util.Arrays.copyOf(rs2, n2))
    assert(snr2 > 35.0, s"44.1k->16k resample SNR $snr2")
    // identity + determinism
    assert(Dsp.resampleLinear(src, 8000, 8000) eq src)
    assert(Dsp.resampleLinear(src, 8000, 16000).toSeq === rs.toSeq)
  }

  test("peakNormalize hits the target peak exactly and preserves silence") {
    val t = Pcm.tone(300.0, 8000, 100, amplitude = 0.3)
    val g = Dsp.peakNormalize(t, 30000)
    assert(Dsp.peak(g) === 30000)
    assert(Dsp.peakNormalize(new Array[Short](64), 30000).forall(_ == 0))
    // already at target -> no-op (same instance)
    assert(Dsp.peakNormalize(g, 30000) eq g)
  }

  test("trimSilence strips exactly the sub-threshold margins") {
    val x: Array[Short] = Array(0, 0, 2, -5, 900, -900, 3, 0, 0, 0)
    assert(Dsp.trimSilence(x, 0).toSeq === Seq(2, -5, 900, -900, 3))
    assert(Dsp.trimSilence(x, 5).toSeq === Seq(900, -900).map(_.toShort))
    assert(Dsp.trimSilence(Array[Short](0, 0), 0).length === 0)
  }

  test("frame grid covers the clip with the 25/10 ms convention") {
    // 1 s @ 16 kHz: frames of 400 samples every 160 -> last start 97*160
    val starts = Dsp.frameStarts(16000, 16000, 25, 10)
    assert(starts.head === 0)
    assert(starts.last === 15520)
    assert(starts.length === 98)
    assert(Dsp.frameLen(16000, 25) === 400)
    // too-short clip -> no frames
    assert(Dsp.frameStarts(300, 16000, 25, 10).isEmpty)
  }

  test("Goertzel verifies true tone labels and flags mislabeled clips, every codec") {
    (0L until 60L).foreach { i =>
      val c = ClipSynth.clip(i, maxDurMs = 200)
      val pcm = Pcm.decode(c.codec, c.bytes)
      val f = ClipSynth.toneFreqHz(i)
      val decoys = Array(math.max(100.0, f - 60.0), f + 60.0, f * 2.0)
      val (pSig, pOff) = Dsp.toneCheck(pcm, c.sr_hz, f, decoys)
      assert(pSig > 4.0 * pOff, s"clip $i (${c.codec}@${c.sr_hz}) sig=$pSig off=$pOff")
      // mislabeled: claim a frequency 100 Hz away -> check must fail
      val (pBad, pTrue) = Dsp.toneCheck(pcm, c.sr_hz, f + 100.0, Array(f))
      assert(pBad < pTrue, s"clip $i mislabel not caught")
    }
  }

  test("transcode pass rewrites to canonical codec/rate, SNR-gated, snapshot-isolated") {
    import graft.ops.{Append, Transcode}
    import graft.table.MetaStore
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-transcode-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 300, 8, maxDurMs = 200).toDF())
    val s0 = store.currentSnapshotId.get
    val res = Transcode.run(spark, store, Pcm.Pcm16le, 16000, runId = "t-spec")
    assert(res.clips === 300)
    val v = Transcode.verify(spark, store, s0, res.snapshotId,
      Pcm.Pcm16le, 16000, minSnrDb = 20.0).collect()
    assert(v.length === 300)
    assert(v.forall(_.getAs[Boolean]("pass")),
      v.filterNot(_.getAs[Boolean]("pass")).take(3).mkString("; "))
    // every new-row payload really is 16 kHz pcm16le
    val n = store.scanCurrent(spark)
    assert(n.filter(org.apache.spark.sql.functions.col("codec") =!= Pcm.Pcm16le).count() === 0)
    assert(n.filter(org.apache.spark.sql.functions.col("sr_hz") =!= 16000).count() === 0)
    // snapshot isolation: the pre-transcode snapshot still reads the originals
    assert(store.scan(spark, s0)
      .filter(org.apache.spark.sql.functions.col("codec") === Pcm.Ulaw).count() > 0)
    // idempotence: rerun produces identical payload digests
    val res2 = Transcode.run(spark, store, Pcm.Pcm16le, 16000, runId = "t-spec2")
    val d1 = store.scan(spark, res.snapshotId)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("bytes")).as("h"))
    val d2 = store.scan(spark, res2.snapshotId)
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("bytes")).as("h"))
    assert(d1.except(d2).count() === 0 && d2.except(d1).count() === 0)
  }

  test("fft matches the O(n^2) DFT and satisfies Parseval") {
    val n = 256
    val rng = new scala.util.Random(7)
    val sig = Array.fill(n)(rng.nextDouble() * 2 - 1)
    val re = sig.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    // direct DFT at a handful of bins
    for (k <- Seq(0, 1, 17, 100, 255)) {
      var dr = 0.0; var di = 0.0
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        dr += sig(t) * math.cos(a); di += sig(t) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-8 && math.abs(im(k) - di) < 1e-8,
        s"bin $k: (${re(k)},${im(k)}) vs ($dr,$di)")
    }
    val timeE = sig.map(x => x * x).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) < 1e-8)
  }

  test("dominantFreqHz recovers the labeled tone within 0.5 Hz for every codec/rate") {
    (0L until 80L).foreach { i =>
      val c = ClipSynth.clip(i, maxDurMs = 200)
      val pcm = Pcm.decode(c.codec, c.bytes)
      val f = Dsp.dominantFreqHz(pcm, c.sr_hz)
      val want = ClipSynth.toneFreqHz(i)
      assert(math.abs(f - want) < 0.5,
        s"clip $i (${c.codec}@${c.sr_hz}, dur=${c.dur_ms}): got $f want $want")
    }
  }

  test("pitch-track fingerprint is invariant across codec and sample rate") {
    (0L until 40L).foreach { i =>
      val c = ClipSynth.clip(i, maxDurMs = 200)
      val pcm = Pcm.decode(c.codec, c.bytes)
      val nSeg = math.max(1, c.dur_ms / 100)
      def track(codec: String, rate: Int): Seq[Long] = {
        val enc = Pcm.encode(codec, Dsp.resampleLinear(pcm, c.sr_hz, rate))
        val canon = Dsp.resampleLinear(Pcm.decode(codec, enc), rate, 8000)
        Dsp.pitchTrackSegs(canon, nSeg).toSeq
      }
      val base = track(c.codec, c.sr_hz)
      assert(base === track(Pcm.Pcm16le, 16000), s"clip $i t16 variant diverged")
      assert(base === track(Pcm.Ulaw, 8000), s"clip $i u8 variant diverged")
      // a different tone must NOT collide
      val other = Pcm.tone(ClipSynth.toneFreqHz(i) + 40.0, c.sr_hz, c.dur_ms)
      assert(base !== Dsp.pitchTrackSegs(
        Dsp.resampleLinear(other, c.sr_hz, 8000), nSeg).toSeq)
    }
  }

  test("q83 segment explode matches the frame-grid arithmetic") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q83_audio_segments")(spark, sf)
    import org.apache.spark.sql.functions._
    val perClip = df.groupBy("clip_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected: frameStarts over the decoded length with the 50/25 grid
    (0L until 300L).foreach { i =>
      val c = ClipSynth.clip(i, maxDurMs = 200)
      val n = Pcm.decode(c.codec, c.bytes).length
      val want = Dsp.frameStarts(n, c.sr_hz, 50, 25).length
      val got = perClip.getOrElse(c.clip_id, 0L)
      assert(got === want.toLong, s"clip $i: $got segments, want $want")
    }
    // segments are real pcm16le payloads: 2 bytes per sample
    assert(df.filter(col("n_bytes") =!= col("n_samples") * 2).count() === 0)
  }

  test("q84 fingerprint dedup merges every planted cross-codec variant") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q84_audio_fingerprint")(spark, sf)
    import org.apache.spark.sql.functions._
    val rows = df.collect()
    // every cluster mixes md5-distinct payloads by construction
    assert(rows.forall(_.getAs[Long]("n_distinct_payloads") > 1))
    // all 300 base clips have their two planted variants merged: every
    // cluster has >= 3 members and the member total covers all 900 rows
    // minus nothing (tracks are metadata-grid-aligned, so variants of the
    // same clip can never split)
    assert(rows.map(_.getAs[Long]("n_members")).sum === 900L)
  }

  test("q85 spectral profile flags every label consistent at sf0.001") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q85_audio_spectrum")(spark, sf)
    import org.apache.spark.sql.functions._
    assert(df.count() === 300)
    assert(df.filter(col("label_ok") === false).count() === 0)
  }

  test("q70/q71/q72 audio queries run and report sane values at sf0.001") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val rs = SparkEntry.queries("q70_audio_resample")(spark, sf)
    val rows = rs.collect()
    assert(rows.length === 300)
    // every clip normalizes to the target peak and clears the codec-dependent
    // SNR floor (worst case: ulaw @ 8 kHz with a high tone)
    assert(rows.forall(_.getAs[Int]("peak_norm") === 30000))
    assert(rows.forall(_.getAs[Double]("snr_db") > 15.0))
    assert(rows.filter(r => r.getAs[String]("codec") == "pcm16le" &&
      r.getAs[Int]("sr_hz") == 44100).forall(_.getAs[Double]("snr_db") > 35.0))

    val fr = SparkEntry.queries("q71_audio_frames")(spark, sf).collect()
    assert(fr.length === 300)
    // trim removes the zero pad (up to a few boundary-zero tone samples)
    assert(fr.forall { r =>
      val d = r.getAs[Int]("n_samples") - r.getAs[Int]("n_trimmed")
      d >= 0 && d <= 4
    })
    assert(fr.forall(r => r.getAs[Int]("n_active") > 0))

    val tc = SparkEntry.queries("q72_audio_tonecheck")(spark, sf).collect()
    assert(tc.length === 300)
    assert(tc.forall(_.getAs[Boolean]("label_ok")))
  }

  test("vadSegments: silence, continuous tone, planted gaps, hangover bridging") {
    val sr = 16000
    assert(Dsp.vadSegments(new Array[Short](sr / 2), sr, 25, 10, 500.0, 2).isEmpty)

    val tone = Pcm.tone(440.0, sr, 300)
    val one = Dsp.vadSegments(tone, sr, 25, 10, 500.0, 2)
    // end quantizes to the last FULL frame on the 10 ms hop grid
    assert(one.length == 1 && one(0)._1 == 0 &&
      tone.length - one(0)._2 < Dsp.frameLen(sr, 25))

    // 60 ms gap (4 fully-silent frames) splits at hangover=2
    val gapped = Pcm.tone(440.0, sr, 400)
    java.util.Arrays.fill(gapped, 150 * sr / 1000, 210 * sr / 1000, 0.toShort)
    val two = Dsp.vadSegments(gapped, sr, 25, 10, 500.0, 2)
    assert(two.length == 2, s"got ${two.mkString(",")}")
    assert(math.abs(two(0)._2 - 150 * sr / 1000) <= 25 * sr / 1000)
    assert(math.abs(two(1)._1 - 210 * sr / 1000) <= 25 * sr / 1000)

    // 30 ms gap (1 fully-silent frame) is bridged by the same hangover
    val dipped = Pcm.tone(440.0, sr, 400)
    java.util.Arrays.fill(dipped, 150 * sr / 1000, 180 * sr / 1000, 0.toShort)
    assert(Dsp.vadSegments(dipped, sr, 25, 10, 500.0, 2).length == 1)

    // shorter than one frame: whole-clip decision
    val stub = Pcm.tone(440.0, sr, 10)
    val s1 = Dsp.vadSegments(stub, sr, 25, 10, 500.0, 2)
    assert(s1.length == 1 && s1(0) == ((0, stub.length)))
  }

  test("mel filterbank: pure tones land in their expected band; energies conserve") {
    val sr = 16000
    for (f <- Seq(300.0, 440.0, 1000.0, 3000.0, 6000.0)) {
      val tone = Pcm.tone(f, sr, 250)
      val ps = Dsp.powerSpectrum(tone, 0, tone.length)
      val mel = Dsp.melFilterbank(ps, sr, 24)
      val argmax = mel.indexOf(mel.max)
      val expected = Dsp.melBandOf(f, sr, 24)
      assert(math.abs(argmax - expected) <= 1,
        s"tone $f Hz: argmax=$argmax expected=$expected")
    }
    // a low-frequency tone must put ~no energy in the top bands
    val low = Pcm.tone(200.0, sr, 250)
    val mel = Dsp.melFilterbank(Dsp.powerSpectrum(low, 0, low.length), sr, 24)
    assert(mel.take(4).sum > 100.0 * mel.takeRight(8).sum)
  }

  test("q90 VAD recovers the planted utterance layout at sf0.001") {
    val spark = TestSpark.spark
    val df = SparkEntry.queries("q90_audio_vad")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === 300)
    val bad = rows.filterNot(_.getAs[Boolean]("vad_ok"))
    assert(bad.isEmpty, s"VAD misses: ${bad.take(5).mkString("; ")}")
    // six segment boundaries, each quantized to the frame grid (<=25 ms)
    assert(rows.forall { r =>
      val a = r.getAs[Long]("active_ms"); a >= 480 - 150 && a <= 480 + 150
    })
  }
}
