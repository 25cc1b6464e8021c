package graft.verify

import graft.audio.Pcm
import graft.synth.ClipSynth
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-clip verification outcome. */
final case class VerifyRow(
    clip_id: String,
    in_pre: Boolean,
    in_post: Boolean,
    transcript_ok: Boolean,
    meta_ok: Boolean,
    snr_db: Double,
    snr_vs_synth_db: Double,
    pass: Boolean)

final case class VerifyReport(
    rows: Long,
    passed: Long,
    failed: Long,
    minSnrDb: Double,
    passRate: Double) {
  def allPass: Boolean = failed == 0 && rows > 0
}

final case class JoinedClip(
    clip_id: String,
    pre_bytes: Array[Byte], pre_sr: Option[Int], pre_dur: Option[Int],
    pre_codec: String, pre_transcript: String,
    post_bytes: Array[Byte], post_sr: Option[Int], post_dur: Option[Int],
    post_codec: String, post_transcript: String)

/**
 * The north_rule invariant checker: post-maintenance scan must equal
 * pre-maintenance scan under snapshot isolation, verified per row by
 * decoded-PCM allclose at SNR>=30dB plus exact transcript equality
 * (BASELINE.json:15). The Spark re-expression of the reference's
 * shard->rejoin cell-equality contract
 * (cursor/src/test/java/cursors/NinetyDegreeTest.kt:123-133) and its
 * rewritten-volume digest check (DayJobTest.kt:185-187).
 */
object ScanEquality {

  val SnrGateDb = 30.0

  /**
   * Full-outer compare of two scans of the clip table keyed on clip_id.
   *
   * Fast path (checkSynth=false, the maintenance gate): per-side md5 digests
   * are computed MAP-SIDE, so the join shuffles ~50 bytes/row instead of the
   * audio payload (maintenance never transcodes, so digest equality implies
   * bit-identical bytes hence SNR = perfect); only digest-mismatched clips —
   * normally zero — are decoded, via a semi-join back to the full rows. At
   * 100 TB this turns the verify shuffle from "all payload bytes twice" into
   * a metadata-sized exchange. checkSynth=true must decode every row anyway
   * (SNR vs the re-derived pristine tone), so it keeps the full path.
   *
   * Report-field nuance: digest-equal rows report snr_db = PerfectSnrDb
   * without decoding. A digest-equal row whose codec label diverged would
   * previously have reported a decoded (possibly non-perfect) snr while
   * still failing meta_ok; pass/fail outcomes are identical on every row.
   */
  def compare(spark: SparkSession, pre: DataFrame, post: DataFrame,
              checkSynth: Boolean = true): Dataset[VerifyRow] = {
    import spark.implicits._
    if (!checkSynth) {
      def dig(df: DataFrame, tag: String) = df.select(
        col("clip_id"),
        lit(1).as(s"${tag}_present"), // row-presence marker (bytes may be null)
        md5(col("bytes")).as(s"${tag}_md5"),
        col("sr_hz").as(s"${tag}_sr"),
        col("dur_ms").as(s"${tag}_dur"),
        col("codec").as(s"${tag}_codec"),
        col("transcript").as(s"${tag}_transcript"))
      // persisted: the fast branch AND the mismatch-id derivation both read
      // this ~50-bytes/row frame, so the payload is md5-scanned exactly ONCE
      // per side; with AQE, an EMPTY mismatch set then propagates and the
      // decode branch's payload scans are skipped at runtime entirely.
      // (~20 MB/M clips, session-lifetime cache; bench/maintenance sessions
      // are per-run so this does not accumulate.)
      val j = dig(pre, "pre").join(dig(post, "post"), Seq("clip_id"), "full_outer")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inPre = col("pre_present").isNotNull
      val inPost = col("post_present").isNotNull
      val both = inPre && inPost
      val tOk = col("pre_transcript") <=> col("post_transcript")
      val mOk = col("pre_sr") <=> col("post_sr") &&
        col("pre_dur") <=> col("post_dur") &&
        col("pre_codec") <=> col("post_codec")
      val digEq = col("pre_md5") <=> col("post_md5") // null-safe: null==null bytes
      // a NULL payload on both sides digest-matches, but the decode path
      // fails null payloads — the cheap gate must agree, not pass them
      val bytesOk = col("pre_md5").isNotNull && col("post_md5").isNotNull
      val fast = j.filter(!both || digEq).select(
        col("clip_id"),
        inPre.as("in_pre"), inPost.as("in_post"),
        (both && tOk).as("transcript_ok"),
        (both && mOk).as("meta_ok"),
        when(both, lit(Pcm.PerfectSnrDb)).otherwise(lit(-1.0)).as("snr_db"),
        when(both, lit(Pcm.PerfectSnrDb)).otherwise(lit(-1.0)).as("snr_vs_synth_db"),
        (both && tOk && mOk && bytesOk).as("pass")).as[VerifyRow]
      val mismatchIds = j.filter(both && !digEq).select("clip_id")
      val slow = compareDecodeAll(spark,
        pre.join(mismatchIds, Seq("clip_id"), "left_semi"),
        post.join(mismatchIds, Seq("clip_id"), "left_semi"),
        checkSynth = false)
      return fast.unionByName(slow)
    }
    compareDecodeAll(spark, pre, post, checkSynth)
  }

  /** Decode-everything compare: shuffles full rows, SNR on every clip. */
  private def compareDecodeAll(spark: SparkSession, pre: DataFrame, post: DataFrame,
                               checkSynth: Boolean): Dataset[VerifyRow] = {
    import spark.implicits._
    def prep(df: DataFrame, tag: String) = df.select(
      col("clip_id"),
      col("bytes").as(s"${tag}_bytes"),
      col("sr_hz").as(s"${tag}_sr"),
      col("dur_ms").as(s"${tag}_dur"),
      col("codec").as(s"${tag}_codec"),
      col("transcript").as(s"${tag}_transcript"))
    val joined = prep(pre, "pre").join(prep(post, "post"), Seq("clip_id"), "full_outer")
      .as[JoinedClip]
    joined.map { j =>
      val inPre = j.pre_sr.isDefined
      val inPost = j.post_sr.isDefined
      if (!inPre || !inPost)
        VerifyRow(j.clip_id, inPre, inPost, transcript_ok = false, meta_ok = false,
          snr_db = -1.0, snr_vs_synth_db = -1.0, pass = false)
      else {
        val tOk = j.pre_transcript == j.post_transcript
        val mOk = j.pre_sr == j.post_sr && j.pre_dur == j.post_dur &&
          j.pre_codec == j.post_codec
        // a null payload/codec on either side is a FAILED row, not a task
        // crash: the gate must report corruption, not abort on it (the fast
        // path routes null-vs-non-null digests here)
        if (j.pre_bytes == null || j.pre_codec == null ||
            j.post_bytes == null || j.post_codec == null)
          VerifyRow(j.clip_id, inPre, inPost, tOk, mOk,
            snr_db = -1.0, snr_vs_synth_db = -1.0, pass = false)
        else {
          val preDec = Pcm.decode(j.pre_codec, j.pre_bytes)
          val postDec = Pcm.decode(j.post_codec, j.post_bytes)
          val snr = Pcm.snrDb(preDec, postDec)
          val snrSynth = if (checkSynth) {
            // pristine reference signal re-derived from the row index
            val i = j.clip_id.stripPrefix("clip_").toLong
            val ref = Pcm.tone(ClipSynth.toneFreqHz(i), j.post_sr.get, j.post_dur.get)
            Pcm.snrDb(ref, postDec)
          } else Pcm.PerfectSnrDb
          val pass = tOk && mOk && snr >= SnrGateDb &&
            (!checkSynth || snrSynth >= SnrGateDb)
          VerifyRow(j.clip_id, inPre, inPost, tOk, mOk, snr, snrSynth, pass)
        }
      }
    }
  }

  def compareSnapshots(spark: SparkSession, store: graft.table.MetaStore,
                       preId: Long, postId: Long,
                       checkSynth: Boolean = true): Dataset[VerifyRow] =
    compare(spark, store.scan(spark, preId), store.scan(spark, postId), checkSynth)

  /** Aggregate the per-row outcomes into one report (single tiny job). */
  def report(rows: Dataset[VerifyRow]): VerifyReport = {
    val agg = rows.groupBy().agg(
      count(lit(1)).as("n"),
      sum(when(col("pass"), 1L).otherwise(0L)).as("passed"),
      min(col("snr_db")).as("minSnr")).collect()(0)
    val n = agg.getAs[Long]("n")
    val passed = agg.getAs[Long]("passed")
    // raw cell, not getAs[Double]: primitive unboxing turns SQL NULL into
    // 0.0 and an empty verify would report a measured-looking 0 dB floor
    val minSnr = agg.get(agg.fieldIndex("minSnr")) match {
      case null => -1.0
      case d: java.lang.Double => d.doubleValue()
    }
    VerifyReport(n, passed, n - passed, minSnr,
      if (n == 0) 0.0 else passed.toDouble / n)
  }
}
