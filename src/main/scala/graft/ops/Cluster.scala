package graft.ops

import graft.keys.Keys
import graft.table.{LineageRecord, MetaStore}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

sealed trait CurveKind
case object ZOrderCurve extends CurveKind
case object HilbertCurve extends CurveKind

final case class ClusterResult(
    snapshotId: Long,
    runId: String,
    filesBefore: Int,
    filesAfter: Int,
    rows: Long,
    curve: String)

/**
 * Full-table cluster rewrite on a space-filling-curve key over
 * (clip_id, sr_hz, dur_ms) — the engine's re-expression of the reference's
 * `ordered` cluster sort (cursor/src/main/java/cursors/Cursor.kt:167-180) and
 * its aspired Hilbert ordering (cursor/src/main/java/cursors/context/
 * Ordering.kt:105, README.md:155), executed Spark-first:
 *
 *   scan -> withColumn(curve key) -> repartitionByRange(nFiles, key)
 *        -> sortWithinPartitions(key) -> drop(key) -> parquet write
 *
 * `repartitionByRange` samples the key distribution, so the 20% dur_ms=100
 * hot rows (FIXTURES.md skew injection) spread across range bounds by their
 * interleaved clip_id hash bits — the curve key itself acts as the salt for
 * the hot dims (hash bits of clip_id are interleaved bit-for-bit with
 * sr_hz/dur_ms bits), avoiding a single fat range partition.
 */
object Cluster {

  def keyColumn(curve: CurveKind, hashCols: Seq[Column], rangeCols: Seq[Column],
                bitsPerDim: Int): Column = curve match {
    case ZOrderCurve  => Keys.zorderKey(bitsPerDim, hashCols, rangeCols)
    case HilbertCurve => Keys.hilbertKey(bitsPerDim, hashCols, rangeCols)
  }

  /**
   * Min-max scale a range dim to fill its full bit width. Without this the
   * curve degenerates: dur_ms < 2^10 leaves the top 11 of 21 bits zero, so
   * interleaved hash bits dominate the key and locality dies. Min/max come
   * from manifest stats (free — no extra pass), the same role the
   * reference's NormalizedRange metadata plays for min-max scaling
   * (cursor/src/main/java/cursors/context/NormalizedRange.kt:11-18,
   * Cursor.kt:183-254).
   */
  def scaledDim(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val span = math.max(1L, maxV - minV)
    val maxOut = (1L << bits) - 1
    ((c.cast("long") - minV) * maxOut / span).cast("long")
  }

  /** Range cols scaled using per-table min/max from the manifest entries. */
  def scaledRangeCols(entries: Seq[graft.table.DataFile], rangeCols: Seq[String],
                      bits: Int): Seq[Column] =
    rangeCols.map { c =>
      val mins = entries.flatMap(_.statLong(c, lower = true))
      val maxs = entries.flatMap(_.statLong(c, lower = false))
      if (mins.isEmpty || maxs.isEmpty) col(c).cast("long")
      else scaledDim(col(c), mins.min, maxs.max, bits)
    }

  def run(spark: SparkSession, store: MetaStore,
          curve: CurveKind = ZOrderCurve,
          targetBytes: Long = 128L * 1024 * 1024,
          runId: String = s"cluster-${System.currentTimeMillis()}",
          hashCols: Seq[String] = Seq("clip_id"),
          rangeCols: Seq[String] = Seq("sr_hz", "dur_ms")): ClusterResult = {
    val snapId = store.currentSnapshotId.getOrElse(sys.error("cluster: empty table"))
    val entries = store.entries(snapId)
    val totalBytes = entries.map(_.sizeBytes).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val bitsPerDim = 63 / (hashCols.size + rangeCols.size)

    val t0 = System.nanoTime()
    val df = store.scan(spark, snapId)
    val key = keyColumn(curve, hashCols.map(col),
      scaledRangeCols(entries, rangeCols, bitsPerDim), bitsPerDim)
    val outDir = store.newDataDir("cluster")
    df.withColumn("_ckey", key)
      .repartitionByRange(nFiles, col("_ckey"))
      .sortWithinPartitions("_ckey")
      .drop("_ckey")
      .write.mode("overwrite").parquet(outDir)

    val newEntries = store.collectStats(spark, outDir)
    val wallMs = (System.nanoTime() - t0) / 1000000
    store.appendLineage(spark, newEntries.zipWithIndex.map { case (e, p) =>
      LineageRecord(runId, snapId, s"cluster-$curve", e.path, p, e.rows, e.sizeBytes,
        wallMs, System.currentTimeMillis(), "done")
    })
    val newSnap = store.commit("cluster", newEntries, Map(
      "runId" -> runId, "curve" -> curve.toString,
      "filesBefore" -> entries.size.toString))
    ClusterResult(newSnap, runId, entries.size, newEntries.size,
      newEntries.map(_.rows).sum, curve.toString)
  }
}
