package graft.audio

/**
 * Deterministic pure-JVM DSP over int16 PCM — the audio half of the
 * multimodal pipeline (decode → transform → feature-extract). Extends the
 * reference's per-cell value-transform layer (cell map α,
 * `cursor/src/main/java/cursors/Cursor.kt:268-276`; CellDriver codec layer,
 * `context/Medium.kt:218-306`) to the audio payload column.
 *
 * Everything is StrictMath / integer arithmetic: results are bit-identical
 * across partitions, JVMs, and parallelism levels, so these ops compose with
 * the scan-equality verifier and the two-parallelism bench.
 */
object Dsp {

  /** Linear-interpolation resample `srcHz` → `dstHz`. Output length is
   * `floor(n * dstHz / srcHz)`; sample positions are computed in exact Long
   * rational arithmetic (j*srcHz = idx*dstHz + rem) so indexing never drifts
   * for long clips. */
  def resampleLinear(in: Array[Short], srcHz: Int, dstHz: Int): Array[Short] = {
    if (srcHz == dstHz || in.length == 0) return in
    val outN = (in.length.toLong * dstHz / srcHz).toInt
    val out = new Array[Short](outN)
    var j = 0
    while (j < outN) {
      val num = j.toLong * srcHz
      val idx = (num / dstHz).toInt
      val frac = (num % dstHz).toDouble / dstHz
      val a = in(idx).toDouble
      val b = if (idx + 1 < in.length) in(idx + 1).toDouble else a
      out(j) = StrictMath.rint(a + (b - a) * frac).toInt.max(-32768).min(32767).toShort
      j += 1
    }
    out
  }

  /** Peak absolute sample value (0 for an empty clip). */
  def peak(in: Array[Short]): Int = {
    var p = 0
    var i = 0
    while (i < in.length) {
      val v = math.abs(in(i).toInt)
      if (v > p) p = v
      i += 1
    }
    p
  }

  /** Scale so the peak hits `targetPeak` (loudness normalization; no-op on
   * silence). Rounding is rint for determinism; clamp guards targetPeak
   * overshoot on the negative rail. */
  def peakNormalize(in: Array[Short], targetPeak: Int): Array[Short] = {
    val p = peak(in)
    if (p == 0 || p == targetPeak) return in
    val g = targetPeak.toDouble / p
    val out = new Array[Short](in.length)
    var i = 0
    while (i < in.length) {
      out(i) = StrictMath.rint(in(i) * g).toInt.max(-32768).min(32767).toShort
      i += 1
    }
    out
  }

  /** Strip leading/trailing samples with |x| <= `threshold` (silence trim).
   * All-silent input trims to empty. */
  def trimSilence(in: Array[Short], threshold: Int): Array[Short] = {
    var lo = 0
    while (lo < in.length && math.abs(in(lo).toInt) <= threshold) lo += 1
    var hi = in.length
    while (hi > lo && math.abs(in(hi - 1).toInt) <= threshold) hi -= 1
    if (lo == 0 && hi == in.length) in else java.util.Arrays.copyOfRange(in, lo, hi)
  }

  /** Frame starts for a `frameMs` window advancing by `hopMs` (only frames
   * fully inside the clip; the standard 25/10 ms analysis grid). */
  def frameStarts(n: Int, srHz: Int, frameMs: Int, hopMs: Int): Array[Int] = {
    val frameN = srHz * frameMs / 1000
    val hopN = srHz * hopMs / 1000
    if (frameN <= 0 || hopN <= 0 || n < frameN) return Array.empty
    Array.range(0, n - frameN + 1, hopN)
  }

  /** Frame length in samples for `frameMs` at `srHz`. */
  def frameLen(srHz: Int, frameMs: Int): Int = srHz * frameMs / 1000

  /** RMS of `in(start until start+len)`. */
  def rms(in: Array[Short], start: Int, len: Int): Double = {
    if (len <= 0) return 0.0
    var s = 0.0
    var i = start
    val end = start + len
    while (i < end) { val v = in(i).toDouble; s += v * v; i += 1 }
    StrictMath.sqrt(s / len)
  }

  /** Goertzel single-bin power of `freqHz` in `in`, normalized by n^2 so
   * values are comparable across clip lengths (a pure tone at freqHz of
   * amplitude A yields ~ (A/2)^2). One O(n) pass, two multiplies per
   * sample — the classic cheap alternative to a full FFT when only a few
   * bins are probed. */
  def goertzelPower(in: Array[Short], srHz: Int, freqHz: Double): Double = {
    val n = in.length
    if (n == 0) return 0.0
    val w = 2.0 * StrictMath.PI * freqHz / srHz
    val coeff = 2.0 * StrictMath.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < n) {
      s0 = in(i).toDouble + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
    p / (n.toDouble * n.toDouble)
  }

  /** In-place iterative radix-2 Cooley–Tukey FFT (decimation in time).
   * `re.length` must be a power of two; `im` same length. StrictMath
   * twiddles keep results bit-identical across JVMs/partitions. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft length $n not a power of 2")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang); val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** Hann-windowed zero-padded power spectrum of `in(from until from+len)`:
   * returns fftN/2 bins where fftN = max(256, nextPow2(len)); bin k is
   * frequency k*srHz/fftN. */
  def powerSpectrum(in: Array[Short], from: Int, len: Int): Array[Double] = {
    val fftN = math.max(256, nextPow2(len))
    val re = new Array[Double](fftN)
    val im = new Array[Double](fftN)
    // len == 1 would make the Hann denominator 0/0 = NaN and poison every
    // bin; a single sample carries no spectral content — weight it 1
    var k = 0
    while (k < len) {
      val w =
        if (len < 2) 1.0
        else 0.5 - 0.5 * StrictMath.cos(2.0 * StrictMath.PI * k / (len - 1))
      re(k) = in(from + k).toDouble * w
      k += 1
    }
    fft(re, im)
    val out = new Array[Double](fftN / 2)
    k = 0
    while (k < out.length) { out(k) = re(k) * re(k) + im(k) * im(k); k += 1 }
    out
  }

  /** Dominant frequency of `in(from until from+len)`: coarse FFT argmax
   * (excluding DC) then two parabolic refinement passes on Goertzel power —
   * sub-0.5 Hz on clean-to-μ-law tones, which makes `round()` of the
   * estimate a codec- and sample-rate-invariant signature. Returns 0 for
   * silent/too-short input. */
  def dominantFreqHz(in: Array[Short], srHz: Int, from: Int, len: Int): Double = {
    if (len < 32) return 0.0
    val ps = powerSpectrum(in, from, len)
    val fftN = ps.length * 2
    var p = 1; var best = 0.0
    var k = 1
    while (k < ps.length) { if (ps(k) > best) { best = ps(k); p = k }; k += 1 }
    if (best <= 0.0) return 0.0
    val seg = java.util.Arrays.copyOfRange(in, from, from + len)
    var f0 = p.toDouble * srHz / fftN
    var delta = srHz.toDouble / fftN
    var it = 0
    while (it < 2) {
      val ym = goertzelPower(seg, srHz, math.max(1.0, f0 - delta))
      val y0 = goertzelPower(seg, srHz, f0)
      val yp = goertzelPower(seg, srHz, f0 + delta)
      val den = ym - 2.0 * y0 + yp
      if (den != 0.0) {
        val off = 0.5 * (ym - yp) / den
        f0 += math.max(-1.0, math.min(1.0, off)) * delta
      }
      delta /= 4.0
      it += 1
    }
    f0
  }

  def dominantFreqHz(in: Array[Short], srHz: Int): Double =
    dominantFreqHz(in, srHz, 0, in.length)

  /** Power-weighted mean frequency of a `powerSpectrum` output. */
  def spectralCentroidHz(power: Array[Double], srHz: Int): Double = {
    val fftN = power.length * 2
    var num = 0.0; var den = 0.0
    var k = 0
    while (k < power.length) {
      num += k.toDouble * srHz / fftN * power(k); den += power(k)
      k += 1
    }
    if (den == 0.0) 0.0 else num / den
  }

  /** Codec/sample-rate-invariant content signature: dominant frequency (Hz,
   * rounded) per `segMs` segment after resampling to a canonical 8 kHz.
   * Two payloads carrying the same underlying signal — any codec, any source
   * rate — produce the same track; the audio analog of the text pipeline's
   * document fingerprint. */
  def pitchTrack(in: Array[Short], srHz: Int, segMs: Int = 100): Array[Long] = {
    val canon = resampleLinear(in, srHz, 8000)
    val segN = 8000 * segMs / 1000
    if (canon.length < 32) return Array.empty
    pitchTrackSegs(canon, math.max(1, canon.length / segN))
  }

  /** Pitch track with a CALLER-CHOSEN segment count over the canonical-rate
   * signal. Deriving nSeg from trusted duration METADATA (not payload
   * length) makes the track immune to the ±1-sample payload-length jitter
   * different source rates leave after canonicalization — two encodings of
   * the same signal always slice into the same grid. */
  def pitchTrackSegs(canon8k: Array[Short], nSeg: Int): Array[Long] = {
    if (canon8k.length < 32 || nSeg <= 0) return Array.empty
    Array.tabulate(nSeg) { s =>
      val from = (s.toLong * canon8k.length / nSeg).toInt
      val to = ((s + 1).toLong * canon8k.length / nSeg).toInt
      if (to - from < 32) 0L
      else StrictMath.round(dominantFreqHz(canon8k, 8000, from, to - from))
    }
  }

  /** Tone-label verification: power at the labeled frequency vs the max over
   * `offFreqs` decoys. Returns (pSignal, pOffMax). A clip genuinely carrying
   * its labeled tone has pSignal >> pOffMax — the audio↔metadata consistency
   * check a training-data pipeline runs before trusting labels. */
  def toneCheck(in: Array[Short], srHz: Int, labeledHz: Double,
                offFreqs: Array[Double]): (Double, Double) = {
    val pSig = goertzelPower(in, srHz, labeledHz)
    var pOff = 0.0
    var k = 0
    while (k < offFreqs.length) {
      val p = goertzelPower(in, srHz, offFreqs(k))
      if (p > pOff) pOff = p
      k += 1
    }
    (pSig, pOff)
  }

  /** Hz -> mel (O'Shaughnessy 1987 formula, the standard ASR front end). */
  def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)

  def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /**
   * Triangular mel filterbank energies over a power spectrum — the
   * featurization step before log/DCT in an MFCC front end, and the
   * fixed-width embedding a training pipeline stores per audio chunk.
   * `power` is the [[powerSpectrum]] layout (fftN/2 Nyquist-EXCLUSIVE bins,
   * bin k at k*srHz/nFft where nFft = 2*power.length — the same mapping
   * [[spectralCentroidHz]] uses; the previous 2*(power.length-1) assumed a
   * Nyquist-inclusive layout and overstated every bin frequency by
   * fftN/(fftN-2), pushing band-edge tones into the wrong triangle).
   * Returns `nMels` energies; filter m spans mel-equally-spaced
   * [c(m-1), c(m+1)] with peak at c(m).
   */
  def melFilterbank(power: Array[Double], srHz: Int, nMels: Int,
                    fMinHz: Double = 0.0): Array[Double] = {
    val nFft = 2 * power.length
    val fMax = srHz / 2.0
    val mLo = hzToMel(fMinHz)
    val mHi = hzToMel(fMax)
    // nMels+2 mel-equally-spaced edge points -> nMels triangles
    val edges = Array.tabulate(nMels + 2)(i =>
      melToHz(mLo + (mHi - mLo) * i / (nMels + 1)))
    val out = new Array[Double](nMels)
    var k = 0
    while (k < power.length) {
      val f = k.toDouble * srHz / nFft
      var m = 0
      while (m < nMels) {
        val l = edges(m); val c = edges(m + 1); val r = edges(m + 2)
        if (f > l && f < r) {
          val w = if (f <= c) (f - l) / math.max(c - l, 1e-12)
                  else (r - f) / math.max(r - c, 1e-12)
          out(m) += w * power(k)
        }
        m += 1
      }
      k += 1
    }
    out
  }

  /** Index of the mel filter whose triangle peaks nearest `freqHz` — the
   * band a pure tone at that frequency should dominate. */
  def melBandOf(freqHz: Double, srHz: Int, nMels: Int,
                fMinHz: Double = 0.0): Int = {
    val mLo = hzToMel(fMinHz)
    val mHi = hzToMel(srHz / 2.0)
    val centers = Array.tabulate(nMels)(m =>
      melToHz(mLo + (mHi - mLo) * (m + 1) / (nMels + 1)))
    var best = 0
    var bd = Double.MaxValue
    var m = 0
    while (m < nMels) {
      val d = math.abs(centers(m) - freqHz)
      if (d < bd) { bd = d; best = m }
      m += 1
    }
    best
  }

  /**
   * Energy-based voice/tone activity detection over the frame-RMS grid with
   * hangover smoothing: a frame is active when rms > `threshold`; an active
   * run stays open across up to `hangoverFrames` consecutive inactive frames
   * (bridging short intra-utterance dips) and closes after that. Returns
   * [start, end) SAMPLE ranges of the detected segments, clamped to the
   * clip. The utterance-segmentation primitive of an ASR data pipeline:
   * per-row array work, so the Spark pass is partition-parallel with zero
   * shuffle.
   */
  def vadSegments(in: Array[Short], srHz: Int, frameMs: Int, hopMs: Int,
                  threshold: Double, hangoverFrames: Int): Array[(Int, Int)] = {
    val starts = frameStarts(in.length, srHz, frameMs, hopMs)
    if (starts.isEmpty) {
      // clip shorter than one frame: all-or-nothing on whole-clip RMS
      return if (rms(in, 0, in.length) > threshold && in.length > 0)
        Array((0, in.length))
      else Array.empty
    }
    val fl = frameLen(srHz, frameMs)
    val segs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var segStart = -1 // sample index of the open segment, -1 = closed
    var lastActiveEnd = -1 // sample end of the last ACTIVE frame in the run
    var silentRun = 0
    var f = 0
    while (f < starts.length) {
      val st = starts(f)
      if (rms(in, st, fl) > threshold) {
        if (segStart < 0) segStart = st
        lastActiveEnd = math.min(st + fl, in.length)
        silentRun = 0
      } else if (segStart >= 0) {
        silentRun += 1
        if (silentRun > hangoverFrames) {
          segs += ((segStart, lastActiveEnd))
          segStart = -1
          silentRun = 0
        }
      }
      f += 1
    }
    if (segStart >= 0) segs += ((segStart, lastActiveEnd))
    segs.toArray
  }
}
