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
}
