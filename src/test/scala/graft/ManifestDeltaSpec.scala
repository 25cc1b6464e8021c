package graft

import java.nio.file.Files

import graft.ops._
import graft.synth.ClipSynth
import graft.table.{MetaStore, Pred}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O(churn) delta commits: manifest reuse across snapshots, partial rewrite
  * on compaction, manifest re-sharding, and timestamp time travel. */
class ManifestDeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): MetaStore =
    MetaStore.forClips(Files.createTempDirectory(s"graft-md-$tag").toString)

  private def batch(from: Long, until: Long) =
    ClipSynth.dataset(spark, until, 2, maxDurMs = 40).toDF()
      .filter(col("clip_id") >= ClipSynth.clipId(from) &&
        col("clip_id") < ClipSynth.clipId(until))

  test("append reuses every parent manifest; metadata-only ops reuse all") {
    val store = freshStore("reuse")
    Append.run(spark, store, batch(0, 20))
    val m1 = store.snapshot(1L).manifests
    Append.run(spark, store, batch(20, 40))
    val s2 = store.snapshot(2L)
    assert(m1.forall(s2.manifests.contains),
      "second append must reuse the first append's manifest by name")
    assert(s2.summary("manifestsReused") == "1")
    assert(store.scanCurrent(spark).count() == 40)

    // a delete and an evolution are metadata-only: ALL data manifests reused
    Deletes.deleteWhere(spark, store, Seq(Pred.EqualTo("codec", "pcm8")))
    assert(store.snapshot(3L).manifests == s2.manifests)
    Evolve.addColumn(spark, store, "md_score", "double", "0.5")
    assert(store.snapshot(4L).manifests == s2.manifests)
    // summary totals stayed exact through the delta chain
    assert(store.snapshot(4L).summary("rows").toLong == 40)
    assert(store.snapshot(4L).summary("files").toLong ==
      store.entries(4L).size)
  }

  test("compaction rewrites only manifests containing removed files") {
    val store = freshStore("partial")
    // batch 1: one file, large enough to be KEPT (its manifest must survive)
    Append.run(spark, store, batch(0, 30).coalesce(1))
    val keptManifest = store.snapshot(1L).manifests.head
    // batch 2: four small files -> compaction candidates
    Append.run(spark, store, batch(30, 50).repartition(4))
    val big = store.entries(1L).map(_.sizeBytes).max
    val c = Compact.run(spark, store, targetBytes = big, smallFileFrac = 0.9)
    val snap = store.snapshot(c.snapshotId)
    assert(snap.manifests.contains(keptManifest),
      "manifest with no removed file must be reused verbatim")
    assert(snap.summary("manifestsReused").toInt >= 1)
    assert(store.scanCurrent(spark).count() == 50)
    // rows preserved exactly across the partial rewrite
    assert(snap.summary("rows").toLong == 50)
  }

  test("compactManifests folds delta-commit manifests back into full shards") {
    val store = freshStore("fold")
    (0 until 5).foreach { i =>
      Append.run(spark, store, batch(i * 10L, i * 10L + 10L).coalesce(1))
    }
    val before = store.snapshot(store.currentSnapshotId.get).manifests.size
    assert(before == 5, s"expected 5 accumulated manifests, got $before")
    val rows = store.scanCurrent(spark).count()
    val (id, b, a) = store.compactManifests()
    assert(b == 5 && a == 1)
    assert(store.scanCurrent(spark).count() == rows)
    assert(store.entries(id).map(_.seq).forall(_ < id),
      "re-sharding is metadata-only: entries keep their original seqs")
  }

  test("snapshotAsOf picks the newest snapshot at or before the timestamp") {
    val store = freshStore("asof")
    Append.run(spark, store, batch(0, 10))
    val t1 = store.snapshot(1L).timestampMs
    Thread.sleep(5)
    Append.run(spark, store, batch(10, 25))
    val t2 = store.snapshot(2L).timestampMs
    assert(store.snapshotAsOf(t1) == 1L)
    if (t2 > t1) assert(store.snapshotAsOf(t2 - 1) == 1L)
    assert(store.snapshotAsOf(System.currentTimeMillis()) == 2L)
    assert(store.scanAsOf(spark, t1).count() == 10)
    assertThrows[RuntimeException](store.snapshotAsOf(t1 - 1000000))
  }

  test("layout overlap depth: cluster rewrite tightens zonemaps, metric sees it") {
    val store = freshStore("layout")
    // 8 random-layout files: every file spans most of the dur_ms space
    Append.run(spark, store,
      ClipSynth.dataset(spark, 400, 8, maxDurMs = 200).toDF().repartition(8))
    val before = graft.table.Layout.overlapDepth(
      store.entries(store.currentSnapshotId.get), "dur_ms")
    assert(before.avgDepth > 2.0, s"random layout should overlap, got $before")
    // range-cluster on dur_ms only (no hash dim): files become range-disjoint
    Cluster.run(spark, store, targetBytes = 64L * 1024,
      hashCols = Seq.empty, rangeCols = Seq("dur_ms", "sr_hz"))
    val after = graft.table.Layout.overlapDepth(
      store.entries(store.currentSnapshotId.get), "dur_ms")
    assert(after.files > 1, "cluster must produce multiple files for the metric")
    assert(after.avgDepth < before.avgDepth,
      s"cluster must reduce overlap: before=$before after=$after")
  }

  test("shared manifests survive expiry of the snapshots that created them") {
    val store = freshStore("share-gc")
    Append.run(spark, store, batch(0, 10))
    Append.run(spark, store, batch(10, 20))
    Append.run(spark, store, batch(20, 30))
    // expire all but current: snapshot 1's manifest is still referenced by
    // snapshot 3 (reuse chain) and must survive the name-set GC
    ExpireSnapshots.run(store, keepLast = 1)
    assert(store.scanCurrent(spark).count() == 30)
    assert(store.entries(store.currentSnapshotId.get).map(_.rows).sum == 30)
  }
}
