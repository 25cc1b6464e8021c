package graft

import java.nio.file.Files

import graft.ops.{Append, Changes, Compact, MergeInto}
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental CDC reads: appends surface exactly the new rows, pure rewrites
 * (compaction) surface NOTHING, and a merge classifies its planted
 * insert/update/delete keys exactly — all from churned files only.
 */
class ChangesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("append-only incremental read, compaction-invisible CDC, merge classification") {
    val dir = Files.createTempDirectory("graft-changes-").toString
    val store = MetaStore.forClips(dir)

    val b1 = ClipSynth.dataset(spark, 200, 8, maxDurMs = 120).toDF()
    Append.run(spark, store, b1)
    val s1 = store.currentSnapshotId.get

    // second append: fresh ids so batches are disjoint
    val b2 = ClipSynth.dataset(spark, 60, 4, maxDurMs = 120).toDF()
      .withColumn("clip_id", concat(lit("b2_"), col("clip_id")))
    Append.run(spark, store, b2)
    val s2 = store.currentSnapshotId.get

    val appended = Changes.appendedRows(spark, store, s1, s2)
      .select("clip_id").collect().map(_.getString(0)).sorted
    val expected = b2.select("clip_id").collect().map(_.getString(0)).sorted
    assert(appended.sameElements(expected), "appendedRows must be exactly batch 2")

    // compaction: file churn, zero row churn
    Compact.run(spark, store, targetBytes = 128L * 1024, runId = "cdc-compact")
    val s3 = store.currentSnapshotId.get
    assert(Changes.fileDiff(store, s2, s3).churnedFiles > 0)
    assert(Changes.rowChanges(spark, store, s2, s3).count() == 0,
      "pure rewrite must be invisible to CDC")
    intercept[IllegalArgumentException] {
      Changes.appendedRows(spark, store, s2, s3) // crossing a rewrite -> refuse
    }

    // merge: 5 updates, 2 inserts, 3 deletes
    val cur = store.scanCurrent(spark)
    val updKeys = (0 until 5).map(i => ClipSynth.clipId(i))
    val delKeys = (5L until 8L).map(ClipSynth.clipId)
    val updates = cur.filter(col("clip_id").isin(updKeys: _*))
      .withColumn("transcript", concat(col("transcript"), lit(" v2")))
    val inserts = ClipSynth.dataset(spark, 2, 1, maxDurMs = 120).toDF()
      .withColumn("clip_id", concat(lit("ins_"), col("clip_id")))
    import spark.implicits._
    MergeInto.run(spark, store, updates.unionByName(inserts),
      runId = "cdc-merge",
      deleteKeys = Some(delKeys.toDF("clip_id")))
    val s4 = store.currentSnapshotId.get

    val changes = Changes.rowChanges(spark, store, s3, s4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(changes.filter(_._2 == "update").keySet == updKeys.toSet)
    assert(changes.filter(_._2 == "delete").keySet == delKeys.toSet)
    assert(changes.filter(_._2 == "insert").keySet ==
      inserts.select("clip_id").collect().map(_.getString(0)).toSet)
    assert(changes.size == 10, s"exactly the planted changes, got $changes")

    // CDC is bounded by churn: the merge rewrote only the files holding
    // matched keys, so CDC never re-reads the untouched majority
    val d = Changes.fileDiff(store, s3, s4)
    assert(d.removed.size < store.entries(s3).size,
      s"merge must not rewrite every file (${d.removed.size} of ${store.entries(s3).size})")
  }
}
