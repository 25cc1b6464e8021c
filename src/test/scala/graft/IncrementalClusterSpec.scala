package graft

import java.nio.file.Files

import graft.ops._
import graft.synth.ClipSynth
import graft.table.{Layout, MetaStore}
import graft.verify.ScanEquality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * O(churn) incremental clustering ([[Cluster.incremental]]): after an append
 * interleaves new key ranges into a clustered layout, only the chain-overlap
 * groups are rewritten; every already-disjoint file rides into the new
 * snapshot untouched. At 10^12 rows this is the only affordable recluster —
 * the full rewrite exists for the globally-decayed case only.
 *
 * Single range column (pure dur_ms sort) keeps the layout algebra exact:
 * writeCurveFiles' boundary rule (key == bound goes right) makes a full
 * 1-dim cluster STRICTLY disjoint on dur_ms, so group structure is
 * deterministic, not a property of quantile luck.
 */
class IncrementalClusterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val nBase = 1200
  private def freshClusteredStore(): (String, MetaStore) = {
    val dir = Files.createTempDirectory("graft-incl-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, nBase, 12).toDF())
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 1L * 1024 * 1024,
      runId = "incl-base", hashCols = Nil, rangeCols = Seq("dur_ms"))
    (dir, store)
  }

  /** ids 2000.. filtered to dur_ms in [lo,hi] — a NARROW append that decays
   * the layout only locally, as one data file. */
  private def narrowBatch(lo: Int, hi: Int) = {
    import spark.implicits._
    spark.range(2000L, 3000L, 1L, 4).map(i => ClipSynth.clip(i, Int.MaxValue))
      .toDF().filter(col("dur_ms").between(lo, hi)).coalesce(1)
  }

  test("clustered 1-dim layout is disjoint; incremental is a no-op on it") {
    val (_, store) = freshClusteredStore()
    val snap = store.currentSnapshotId.get
    val entries = store.entries(snap)
    assert(entries.size > 4, s"want a multi-file layout, got ${entries.size}")
    val groups = Cluster.overlapGroups(entries, "dur_ms")
    assert(groups.forall(_.size == 1),
      s"full 1-dim cluster must be disjoint; got group sizes ${groups.map(_.size)}")
    val res = Cluster.incremental(spark, store, ZOrderCurve,
      targetBytes = 1L * 1024 * 1024, runId = "incl-noop",
      hashCols = Nil, rangeCols = Seq("dur_ms"))
    assert(res.groupsRewritten === 0)
    assert(res.snapshotId === snap, "no-op must not commit a snapshot")
  }

  test("narrow append: only the interleaved group is rewritten, kept files ride untouched") {
    val (_, store) = freshClusteredStore()
    val preAppend = store.currentSnapshotId.get
    val preDepth = {
      val g = Layout.overlapDepth(store.entries(preAppend), "dur_ms")
      g.avgDepth
    }
    Append.run(spark, store, narrowBatch(200, 299))
    val preInc = store.currentSnapshotId.get
    val preEntries = store.entries(preInc)
    val decayed = Layout.overlapDepth(preEntries, "dur_ms").avgDepth
    assert(decayed > preDepth, f"append must decay the layout ($preDepth%.2f -> $decayed%.2f)")

    val res = Cluster.incremental(spark, store, ZOrderCurve,
      targetBytes = 1L * 1024 * 1024, runId = "incl-narrow",
      hashCols = Nil, rangeCols = Seq("dur_ms"))
    assert(res.groupsRewritten === 1, s"one local overlap group expected, got $res")
    assert(res.filesRewritten > 0 && res.filesRewritten < preEntries.size,
      s"partial rewrite expected: $res of ${preEntries.size} files")
    assert(res.filesKept === preEntries.size - res.filesRewritten)

    // kept files carried by path identity (manifest reuse, zero data IO)
    val postPaths = store.entries(res.snapshotId).map(_.path).toSet
    val rewrittenGroupPaths = Cluster.overlapGroups(preEntries, "dur_ms")
      .filter(_.size >= 2).flatten.map(_.path).toSet
    val keptPaths = preEntries.map(_.path).toSet -- rewrittenGroupPaths
    assert(keptPaths.subsetOf(postPaths), "kept files must keep their exact paths")
    assert((postPaths & rewrittenGroupPaths).isEmpty, "rewritten inputs must leave the snapshot")

    // layout restored: disjoint again, and a second pass is a no-op
    val postGroups = Cluster.overlapGroups(store.entries(res.snapshotId), "dur_ms")
    assert(postGroups.forall(_.size == 1),
      s"post-incremental layout must be disjoint; sizes ${postGroups.map(_.size)}")
    val again = Cluster.incremental(spark, store, ZOrderCurve,
      targetBytes = 1L * 1024 * 1024, runId = "incl-converged",
      hashCols = Nil, rangeCols = Seq("dur_ms"))
    assert(again.groupsRewritten === 0 && again.snapshotId === res.snapshotId)

    // row-exact across the incremental window (payload + transcript + meta)
    val rep = ScanEquality.report(
      ScanEquality.compareSnapshots(spark, store, preInc, res.snapshotId))
    assert(rep.allPass, s"scan equality failed: $rep")
    assert(rep.rows === store.entries(res.snapshotId).map(_.rows).sum)
  }

  test("incremental rewrite applies live equality deletes, never resurrects") {
    val (_, store) = freshClusteredStore()
    Append.run(spark, store, narrowBatch(300, 399))
    // delete one clip INSIDE the overlap group (a narrow-batch id)
    val victim = store.scanCurrent(spark).filter(col("dur_ms").between(300, 399))
      .select("clip_id").orderBy("clip_id").head().getString(0)
    import spark.implicits._
    Deletes.run(spark, store, Seq(victim).toDF("clip_id"), runId = "incl-del-key")
    val preInc = store.currentSnapshotId.get
    val totalBefore = store.scanCurrent(spark).count()

    val res = Cluster.incremental(spark, store, ZOrderCurve,
      targetBytes = 1L * 1024 * 1024, runId = "incl-del",
      hashCols = Nil, rangeCols = Seq("dur_ms"))
    val post = store.scanCurrent(spark)
    assert(post.filter(col("clip_id") === victim).count() === 0,
      "rewritten group (fresh seq) must not resurrect the deleted key")
    assert(post.count() === totalBefore)
    val rep = ScanEquality.report(
      ScanEquality.compareSnapshots(spark, store, preInc, res.snapshotId))
    assert(rep.allPass, s"scan equality failed across delete-aware rewrite: $rep")
  }

  test("partitioned table: groups never cross tuples, rewrite keeps pruning exact") {
    val dir = Files.createTempDirectory("graft-incp-").toString
    val store = MetaStore.forClips(dir)
    store.setPartitionSpec(graft.table.PartitionSpec(Seq(
      graft.table.Partitioning.identity("codec"))))
    Append.run(spark, store, ClipSynth.dataset(spark, nBase, 4).toDF())
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 512L * 1024,
      runId = "incp-base", hashCols = Nil, rangeCols = Seq("dur_ms"))
    Append.run(spark, store, narrowBatch(400, 499))
    val entries = store.entries(store.currentSnapshotId.get)
    // every overlap group lives inside ONE partition tuple — a merged file
    // must stay single-tuple or its path segment would lie to the pruner
    Cluster.overlapGroups(entries, "dur_ms").foreach { g =>
      assert(g.map(_.partition).distinct.size == 1,
        s"group crosses tuples: ${g.map(_.partition).distinct}")
    }
    val res = Cluster.incremental(spark, store, ZOrderCurve,
      targetBytes = 512L * 1024, runId = "incp-inc",
      hashCols = Nil, rangeCols = Seq("dur_ms"))
    assert(res.filesRewritten > 0 && res.filesKept > 0, s"partial rewrite: $res")
    // rewrite output re-derives tuples: codec pruning stays EXACT
    val post = store.entries(res.snapshotId)
    assert(post.forall(_.partition.contains("codec")),
      "every post-rewrite file must carry its partition tuple")
    val probe = store.scanCurrentPruned(spark,
      Seq(graft.table.Pred.EqualTo("codec", "ulaw")))
    assert(probe.filesKeptPartition < probe.filesTotal, s"pruning lost: $probe")
    assert(probe.df.filter(col("codec") === "ulaw").count() ===
      store.scanCurrent(spark).filter(col("codec") === "ulaw").count())
  }

  test("declared sort order drives the maintenance cluster pass") {
    val dir = Files.createTempDirectory("graft-so-").toString
    val store = MetaStore.forClips(dir)
    // 4 appends each spanning the full dur range: global decay
    (0 until 4).foreach { k =>
      import spark.implicits._
      Append.run(spark, store,
        spark.range(k * 200L, k * 200L + 200L, 1L, 1)
          .map(i => ClipSynth.clip(i, Int.MaxValue)).toDF())
    }
    store.setSortOrder(graft.table.SortOrder("hilbert", Nil, Seq("dur_ms")))
    // policy says sr_hz — the DECLARED order must win (trigger col + curve)
    val policy = MaintenancePolicy(
      clusterRangeCols = Seq("sr_hz"), clusterHashCols = Seq("clip_id"),
      maxOverlapDepth = 1.5, minFilesForCluster = 2,
      maxSmallFiles = 1000, expireKeepLast = 1000, maxManifestShards = 1000)
    val plan = AutoMaintain.plan(store, policy)
    val clusterD = plan.find(_.op.startsWith("cluster"))
      .getOrElse(fail(s"no cluster decision in $plan"))
    assert(clusterD.reason.contains("dur_ms"),
      s"trigger must measure the declared lead column: $clusterD")
    AutoMaintain.run(spark, store, policy, runId = "so-auto")
    val snap = store.snapshot(store.currentSnapshotId.get)
    assert(snap.operation.startsWith("cluster"), s"got ${snap.operation}")
    assert(snap.summary.get("curve").contains("HilbertCurve"),
      s"declared hilbert curve must be used: ${snap.summary}")
  }

  test("cluster trigger does not re-fire on an unchanged just-clustered layout") {
    val (_, store) = freshClusteredStore()
    // unreachably aggressive bar: avg depth is always >= 1.0, so without the
    // convergence guard the daemon would rewrite the same layout every loop
    val policy = MaintenancePolicy(
      clusterRangeCols = Seq("dur_ms"), clusterHashCols = Nil,
      maxOverlapDepth = 0.1, minFilesForCluster = 1,
      maxSmallFiles = 1000, expireKeepLast = 1000, maxManifestShards = 1000)
    assert(!AutoMaintain.plan(store, policy).exists(_.op.startsWith("cluster")),
      "just-clustered layout must not re-trigger the pass that produced it")
    Append.run(spark, store, narrowBatch(700, 799))
    assert(AutoMaintain.plan(store, policy).exists(_.op.startsWith("cluster")),
      "a new commit must re-arm the trigger")
  }

  test("auto-maintain picks the incremental pass for local decay and converges") {
    val (_, store) = freshClusteredStore()
    Append.run(spark, store, narrowBatch(500, 599))
    val policy = MaintenancePolicy(
      targetBytes = 1L * 1024 * 1024,
      clusterRangeCols = Seq("dur_ms"), clusterHashCols = Nil,
      // strictly-disjoint converged layout measures exactly 1.0, so any
      // bar above 1.0 converges; 1.05 keeps the trigger sensitive to a
      // single narrow-file interleave regardless of base file count
      maxOverlapDepth = 1.05, minFilesForCluster = 4,
      maxSmallFiles = 1000, expireKeepLast = 1000, maxManifestShards = 1000)
    val plan = AutoMaintain.plan(store, policy)
    assert(plan.exists(_.op == "cluster-incremental"),
      s"local decay must plan the O(churn) pass, got $plan")
    assert(!plan.exists(_.op == "cluster"), s"full rewrite must not be planned: $plan")
    val applied = AutoMaintain.run(spark, store, policy, runId = "incl-auto")
    assert(applied.exists(a => a.decision.op == "cluster-incremental" && a.committed))
    val replan = AutoMaintain.plan(store, policy)
    assert(!replan.exists(d => d.op.startsWith("cluster")),
      s"converged table must not re-plan a cluster pass: $replan")
  }
}
