package graft

import java.nio.file.Files

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardAndMergeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("per-column shard write -> rejoin equals the original (NinetyDegree analog)") {
    // the reference's scan-output-preservation contract
    // (NinetyDegreeTest.kt:97-137): write each column as its own volume,
    // rejoin, every cell equal
    val dir = Files.createTempDirectory("graft-shard-").toString
    val base = spark.read.parquet(s"$sf/nation.parquet")
      .withColumn("_rid", row_number().over(
        Window.orderBy("n_nationkey")).cast("long"))
    base.columns.filter(_ != "_rid").foreach { c =>
      base.select(col("_rid"), col(c)).write.mode("overwrite")
        .parquet(s"$dir/$c")
    }
    val rejoined = base.columns.filter(_ != "_rid")
      .map(c => spark.read.parquet(s"$dir/$c"))
      .reduce((a, b) => a.join(b, "_rid"))
    assert(rejoined.count() === base.count())
    assert(rejoined.drop("_rid").except(base.drop("_rid")).count() === 0)
    assert(base.drop("_rid").except(rejoined.drop("_rid")).count() === 0)
  }

  test("merge with WHEN MATCHED DELETE removes exactly the keyed rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-del-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 500, 10, maxDurMs = 100).toDF())
    val before = store.currentSnapshotId.get

    val delKeys = (0L until 10L).map(ClipSynth.clipId).toDF("clip_id")
    val updates = Seq(ClipSynth.clip(42L, maxDurMs = 100)
      .copy(transcript = "patched")).toDF()
    val res = MergeInto.run(spark, store, updates, runId = "t-del",
      deleteKeys = Some(delKeys))

    val after = store.scan(spark, res.snapshotId)
    assert(after.count() === 500 - 10)
    assert(after.filter(col("clip_id").isin(
      (0L until 10L).map(ClipSynth.clipId): _*)).count() === 0)
    assert(after.filter(col("transcript") === "patched").count() === 1)
    // snapshot isolation intact
    assert(store.scan(spark, before).count() === 500)
  }

  test("full-sync merge: NOT MATCHED BY SOURCE rows are deleted") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sync-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 300, 6, maxDurMs = 100).toDF())
    val before = store.currentSnapshotId.get

    // source = ids 100..349: 100..299 match (two patched), 300..349 are
    // inserts, and target ids 0..99 are NOT matched by source -> deleted
    val src = spark.range(100L, 350L, 1L, 4)
      .map(i => ClipSynth.clip(i, 100)).toDF()
      .withColumn("transcript",
        when(col("clip_id").isin(ClipSynth.clipId(150), ClipSynth.clipId(151)),
          lit("synced")).otherwise(col("transcript")))
    val res = MergeInto.run(spark, store, src, runId = "t-sync",
      deleteUnmatched = true)

    val after = store.scan(spark, res.snapshotId).cache()
    assert(after.count() === 250, "table key set == source key set")
    assert(after.filter(col("clip_id") < ClipSynth.clipId(100)).count() === 0,
      "unmatched-by-source rows gone")
    assert(after.filter(col("transcript") === "synced").count() === 2,
      "matched rows updated")
    assert(after.filter(col("clip_id") >= ClipSynth.clipId(300)).count() === 50,
      "not-matched rows inserted")
    after.unpersist()
    // snapshot isolation: the pre-sync snapshot still has all 300
    assert(store.scan(spark, before).count() === 300)
    // idempotent: re-running the same sync changes nothing
    val res2 = MergeInto.run(spark, store, src.withColumn("transcript",
      when(col("clip_id").isin(ClipSynth.clipId(150), ClipSynth.clipId(151)),
        lit("synced")).otherwise(col("transcript"))), runId = "t-sync2",
      deleteUnmatched = true)
    assert(store.scan(spark, res2.snapshotId).count() === 250)
  }

  test("typed null-as-zero aggregator matches coalesce-sum semantics") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long)](
      ("a", 5L), ("a", null), ("a", 7L), ("b", null), ("b", null))
      .toDF("k", "v")
    val nzSum = udaf(graft.functions.TypedAggs.NullAsZeroSum)
    val got = df.groupBy("k").agg(nzSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 12L, "b" -> 0L))
  }
}
