package graft.synth

import graft.audio.Pcm
import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the canonical engine table (`BASELINE.json` input_hint). */
case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String)

/**
 * Deterministic synthetic clip-table generator (FIXTURES.md §1, seed=42).
 * Every field derives from the row index `i` through splitmix64 draws, so
 * generation is order-independent, partition-parallel, and identical across
 * runs/parallelism levels — the property the scan-equality verifier and the
 * two-parallelism bench both rely on.
 *
 * Plays the reference's synthetic-fixture role (e.g. the moire dummy-row
 * generator, vector-like/src/main/java/vec/util/BikeShed.kt:151-161, and the
 * hand-rolled heap cursors of HeapCursorTest.kt:46-58), scaled to Spark.
 */
object ClipSynth {

  final val Seed = 42L

  private val words: Array[String] = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "amber", "birch", "cedar", "dune", "ember",
    "fjord", "grove", "harbor", "isle", "jade", "knoll", "lagoon", "mesa",
    "nadir", "onyx", "pine", "quartz", "ridge", "slate", "tundra", "umber",
    "vale", "willow", "xenon", "yarrow", "zenith", "basalt", "cobalt",
    "drift", "eddy", "flint", "garnet", "heath", "iris", "jasper", "kelp",
    "loam", "moss")

  private val srChoices = Array(8000, 16000, 22050, 44100)
  // weights (4,3,2,1) -> cumulative over 10
  private val srCumulative = Array(4, 7, 9, 10)

  /** splitmix64 — deterministic stateless PRNG stream keyed by (seed, i, draw). */
  private def mix(seed: Long, i: Long, draw: Long): Long = {
    var z = seed ^ (i * 0x9E3779B97F4A7C15L) ^ (draw * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def nextInt(seed: Long, i: Long, draw: Long, bound: Int): Int =
    ((mix(seed, i, draw) >>> 1) % bound).toInt

  def clipId(i: Long): String = f"clip_$i%012d"

  def srHz(i: Long): Int = {
    val r = nextInt(Seed, i, 1, 10)
    var k = 0
    while (r >= srCumulative(k)) k += 1
    srChoices(k)
  }

  def durMs(i: Long): Int = {
    val base = 50 + nextInt(Seed, i, 2, 950)
    // skew injection: 20% of rows forced to the hot key 100 ms
    if (nextInt(Seed, i, 3, 10) < 2) 100 else base
  }

  def codec(i: Long): String = {
    val r = nextInt(Seed, i, 4, 100)
    if (r < 70) Pcm.Pcm16le else if (r < 95) Pcm.Ulaw else Pcm.Pcm8
  }

  def toneFreqHz(i: Long): Double = 220.0 + (i % 880).toDouble

  def transcript(i: Long): String = {
    val n = 3 + nextInt(Seed, i, 5, 10) // 3..12 words
    val w = words.length
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(words(((i * 7 + 3 * k + k * k) % w).toInt))
      k += 1
    }
    sb.toString
  }

  /** Pristine int16 samples for row `i` (the verifier's reference signal). */
  def samples(i: Long, durOverrideMs: Int = -1): Array[Short] = {
    val d = if (durOverrideMs > 0) durOverrideMs else durMs(i)
    Pcm.tone(toneFreqHz(i), srHz(i), d)
  }

  /** Full deterministic row. `maxDurMs` caps payload size for bench runs
   * (correctness suites use the uncapped FIXTURES spec). */
  def clip(i: Long, maxDurMs: Int = Int.MaxValue): Clip = {
    val sr = srHz(i)
    val d = math.min(durMs(i), maxDurMs)
    val c = codec(i)
    val pcm = Pcm.tone(toneFreqHz(i), sr, d)
    Clip(clipId(i), Pcm.encode(c, pcm), sr, d, c, transcript(i))
  }

  /** Distributed generation: `n` rows over `partitions` tasks. */
  def dataset(spark: SparkSession, n: Long, partitions: Int,
              maxDurMs: Int = Int.MaxValue): Dataset[Clip] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(i => clip(i, maxDurMs))
  }
}
