package graft.audio

/**
 * Deterministic, pure-JVM PCM codecs + SNR for the canonical clip table
 * (`BASELINE.json` input_hint: columns (clip_id, bytes, sr_hz, dur_ms, codec,
 * transcript)). Three codecs, all bit-deterministic across partitions/JVMs:
 *
 *  - `pcm16le`  little-endian int16 (lossless, round-trip SNR = inf)
 *  - `ulaw`     G.711 mu-law 8-bit companding (lossy, round-trip SNR ~ 35-38 dB)
 *  - `pcm8`     unsigned 8-bit PCM (lossy, round-trip SNR ~ 40+ dB)
 *
 * Plays the role of the reference's per-type CellDriver read/write layer
 * (reference: cursor/src/main/java/cursors/context/Medium.kt:218-306) for the
 * binary audio payload. All math is integer or StrictMath — no platform
 * dependence, which keeps maintenance passes resumable/idempotent.
 */
object Pcm {

  val Pcm16le = "pcm16le"
  val Ulaw    = "ulaw"
  val Pcm8    = "pcm8"

  /** Synthesize `n` int16 samples of a pure tone at `freqHz`, amplitude 0.8 FS.
   * StrictMath.sin for bit-determinism. */
  def tone(freqHz: Double, srHz: Int, durMs: Int, amplitude: Double = 0.8): Array[Short] = {
    val n = (srHz.toLong * durMs / 1000L).toInt
    val out = new Array[Short](n)
    val w = 2.0 * StrictMath.PI * freqHz / srHz
    var i = 0
    while (i < n) {
      out(i) = (amplitude * 32767.0 * StrictMath.sin(w * i)).toShort
      i += 1
    }
    out
  }

  // ---- pcm16le ----
  def pcm16leEncode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xFF).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  def pcm16leDecode(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(2 * i + 1) & 0xFF) << 8) | (bytes(2 * i) & 0xFF)).toShort
      i += 1
    }
    out
  }

  // ---- G.711 mu-law ----
  private final val UlawBias = 0x84
  private final val UlawClip = 32635

  def ulawEncodeSample(pcm: Short): Byte = {
    var sample = pcm.toInt
    val sign = if (sample < 0) { sample = -sample; 0x80 } else 0x00
    if (sample > UlawClip) sample = UlawClip
    sample += UlawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (sample & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (sample >> (exponent + 3)) & 0x0F
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  def ulawDecodeSample(u: Byte): Short = {
    val b = ~u & 0xFF
    val sign = b & 0x80
    val exponent = (b >> 4) & 0x07
    val mantissa = b & 0x0F
    var sample = ((mantissa << 3) + UlawBias) << exponent
    sample -= UlawBias
    (if (sign != 0) -sample else sample).toShort
  }

  def ulawEncode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = ulawEncodeSample(samples(i)); i += 1 }
    out
  }

  def ulawDecode(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ulawDecodeSample(bytes(i)); i += 1 }
    out
  }

  // ---- unsigned 8-bit PCM (round-to-nearest, clamped) ----
  def pcm8Encode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      val q = (samples(i).toInt + 32768 + 128) >> 8 // round to nearest 256
      out(i) = (if (q > 255) 255 else q).toByte
      i += 1
    }
    out
  }

  def pcm8Decode(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = (((bytes(i) & 0xFF) << 8) - 32768).toShort
      i += 1
    }
    out
  }

  /** Encode int16 samples with the named codec. */
  def encode(codec: String, samples: Array[Short]): Array[Byte] = codec match {
    case Pcm16le => pcm16leEncode(samples)
    case Ulaw    => ulawEncode(samples)
    case Pcm8    => pcm8Encode(samples)
    case other   => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Decode `bytes` of the named codec back to int16 samples. */
  def decode(codec: String, bytes: Array[Byte]): Array[Short] = codec match {
    case Pcm16le => pcm16leDecode(bytes)
    case Ulaw    => ulawDecode(bytes)
    case Pcm8    => pcm8Decode(bytes)
    case other   => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** SNR in dB of `test` against `ref` (sample-aligned). Infinity-free: a
   * perfect match returns `PerfectSnrDb` so results stay JSON/parquet-safe.
   * Length mismatch is a hard fail (returns -1). */
  final val PerfectSnrDb = 999.0

  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    if (ref.length != test.length) return -1.0
    var sig = 0.0; var noise = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - test(i).toDouble
      sig += r * r
      noise += d * d
      i += 1
    }
    if (noise == 0.0) PerfectSnrDb
    else if (sig == 0.0) -1.0
    else 10.0 * StrictMath.log10(sig / noise)
  }

  /** Round-trip SNR: decode(bytes) vs the pristine int16 reference. */
  def roundTripSnrDb(codec: String, bytes: Array[Byte], ref: Array[Short]): Double =
    snrDb(ref, decode(codec, bytes))
}
