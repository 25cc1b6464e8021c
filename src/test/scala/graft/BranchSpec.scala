package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Append, Branches, Compact, Deletes, ExpireSnapshots, RemoveOrphans}
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Branches: a writable zero-copy fork with its own snapshot log, merged back
 * by an id-for-id fast-forward replay — the multi-commit maintenance-staging
 * workflow (run compact/cluster/deletes on a branch, verify in isolation,
 * fast-forward when blessed). GC on either side must never eat the other's
 * files.
 */
class BranchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def freshTable(n: Long, parts: Int = 4): MetaStore = {
    val dir = Files.createTempDirectory("graft-branch-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store,
      ClipSynth.dataset(spark, n, parts, maxDurMs = 120).toDF())
    store
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("clip_id").collect().map(_.getString(0)).toSet

  test("branch isolates; maintenance + append on branch; fast-forward replays id-for-id") {
    val store = freshTable(60)
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "maint")

    assert(b.currentSnapshotId.contains(fork), "fork keeps the snapshot id")
    assert(b.scanCurrent(spark).count() == 60)

    // maintenance + an append on the branch; main must see none of it
    Compact.run(spark, b, targetBytes = 64L * 1024 * 1024, runId = "br-compact")
    import spark.implicits._
    Append.run(spark, b,
      spark.range(60, 72).map(i => ClipSynth.clip(i, 120)).toDF())
    assert(b.currentSnapshotId.contains(fork + 2), "branch ids chain above fork")
    assert(b.scanCurrent(spark).count() == 72)
    assert(store.scanCurrent(spark).count() == 60, "main isolated from branch")
    assert(store.currentSnapshotId.contains(fork))

    // the blessing gate: every fork row reached the head bit-identically
    // (appended rows are excluded — they have no pre-image)
    val rep = Branches.audit(spark, store, "maint")
    assert(rep.rows == 60 && rep.allPass, s"maintenance audit blesses: $rep")

    val replayed = Branches.fastForward(store, "maint")
    assert(replayed == Seq(fork + 1, fork + 2))
    assert(store.currentSnapshotId.contains(fork + 2))
    assert(store.scanCurrent(spark).count() == 72)
    assert(ids(store.scanCurrent(spark)) == ids(b.scanCurrent(spark)))
    // replayed commits look like ordinary history (ChangeFeed contiguity)
    assert(store.allSnapshotIds == (1L to fork + 2))
    assert(store.snapshot(fork + 1).summary.get("ffFrom").contains("maint"))

    assert(Branches.merged(store, "maint"))
    Branches.drop(store, "maint")
    assert(Branches.list(store).isEmpty)
    assert(!Files.exists(Paths.get(store.tableDir, "branches", "maint")))
    // dropped branch releases nothing main needs: full scan still green
    assert(store.scanCurrent(spark).count() == 72)
  }

  test("equality-delete coverage survives the replay (carried seqs, re-insert rule)") {
    val store = freshTable(40)
    import spark.implicits._
    // a PRE-fork delete: its entries ride into the branch via seedFork
    Deletes.run(spark, store,
      Seq(ClipSynth.clipId(38), ClipSynth.clipId(39)).toDF("clip_id"))
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "del")

    assert(b.scanCurrent(spark).count() == 38, "fork carries the delete set")
    // on the branch: delete k0..k9, then RE-INSERT k5 (must stay visible —
    // the seq < delete.seq rule, exercised across the fork boundary)
    Deletes.run(spark, b,
      (0 until 10).map(i => ClipSynth.clipId(i.toLong)).toDF("clip_id"))
    Append.run(spark, b,
      spark.range(5, 6).map(i => ClipSynth.clip(i, 120)).toDF()
        .withColumn("transcript", lit("reinserted")))
    assert(b.scanCurrent(spark).count() == 29)

    // maintenance audit flags the curation: 10 deletes fail it outright;
    // with deletes allowed, exactly the REWRITTEN re-insert still fails
    assert(!Branches.audit(spark, store, "del").allPass)
    val repDel = Branches.audit(spark, store, "del", allowDeletes = true)
    assert(repDel.failed == 1, s"only the rewritten re-insert flags: $repDel")

    Branches.fastForward(store, "del")
    val main = store.scanCurrent(spark)
    assert(main.count() == 29)
    assert(main.filter(col("clip_id") === ClipSynth.clipId(5))
      .select("transcript").head().getString(0) == "reinserted")
    assert(main.filter(col("clip_id") === ClipSynth.clipId(0)).count() == 0)
    // a delete committed on MAIN after the merge covers replayed files too
    Deletes.run(spark, store, Seq(ClipSynth.clipId(5)).toDF("clip_id"))
    assert(store.scanCurrent(spark).count() == 28)
  }

  test("GC respects branch roots; divergence refused; branch store cannot delete shared data") {
    val store = freshTable(50)
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "stage")
    import spark.implicits._
    Append.run(spark, b,
      spark.range(50, 60).map(i => ClipSynth.clip(i, 120)).toDF())

    // main diverges: a fast-forward must now refuse with a clear error
    Append.run(spark, store,
      spark.range(100, 110).map(i => ClipSynth.clip(i, 120)).toDF())
    val ex = intercept[IllegalArgumentException] {
      Branches.fastForward(store, "stage")
    }
    assert(ex.getMessage.contains("diverged"))

    // expiry on main keeps the fork snapshot (branch root) and its files
    val r = ExpireSnapshots.run(store, keepLast = 1)
    assert(r.retainedSnapshots.contains(fork), "fork pinned like a tag")
    assert(b.scanCurrent(spark).count() == 60, "branch fully readable after expiry")

    // orphan GC on main must not eat branch-reachable files (age floor 0
    // would otherwise delete every branch-only file immediately)
    val o = RemoveOrphans.run(store, minAgeMs = 0L)
    assert(b.scanCurrent(spark).count() == 60, s"branch survives orphan GC ($o)")

    // GC through the branch handle: snapshots may expire, data may not
    intercept[IllegalArgumentException] { RemoveOrphans.run(b, minAgeMs = 0L) }
    Append.run(spark, b,
      spark.range(60, 62).map(i => ClipSynth.clip(i, 120)).toDF())
    val rb = ExpireSnapshots.run(b, keepLast = 1)
    assert(rb.dataFilesDeleted == 0, "branch store never deletes data files")
    assert(store.scanCurrent(spark).count() == 60, "main intact after branch expiry")

    // unmerged drop needs force; afterwards branch-only files become orphans
    intercept[IllegalArgumentException] { Branches.drop(store, "stage") }
    Branches.drop(store, "stage", force = true)
    val o2 = RemoveOrphans.run(store, minAgeMs = 0L)
    assert(o2.orphansDeleted > 0, "dropped branch's own files are collectable")
    assert(store.scanCurrent(spark).count() == 60, "main scan intact")
  }

  test("streaming ingest into a branch: exactly-once ledger survives the fast-forward") {
    import graft.streaming.{ClipStream, StreamAppend}
    val sf = "/root/testdata/sf0.001"
    val srcDir = Files.createTempDirectory("graft-bring-src-").toString
    val ckpt = Files.createTempDirectory("graft-bring-ckpt-").toString
    val tableDir = Files.createTempDirectory("graft-bring-table-").toString
    val store = MetaStore.forClips(tableDir)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.limit(100).write.mode("overwrite").parquet(srcDir)
    val q = StreamAppend.start(store,
      spark.readStream.schema(ClipStream.eventSchema).parquet(srcDir),
      ckpt, "bring_q")
    try q.processAllAvailable() finally q.stop()
    assert(store.scanCurrent(spark).count() == 100)
    val fork = store.currentSnapshotId.get

    // new micro-batches land on a BRANCH — main readers stay at the fork
    // until the ingest window is blessed (the audit-branch ingest pattern)
    val b = Branches.create(store, "ingest")
    ev.orderBy(col("event_id").desc).limit(50)
      .write.mode("append").parquet(srcDir)
    val q2 = StreamAppend.start(b,
      spark.readStream.schema(ClipStream.eventSchema).parquet(srcDir),
      ckpt, "bring_q2")
    try q2.processAllAvailable() finally q2.stop()
    assert(b.scanCurrent(spark).count() == 150)
    assert(store.scanCurrent(spark).count() == 100, "main frozen during ingest")
    val branchBatches = StreamAppend.committedBatchIds(b)

    Branches.fastForward(store, "ingest")
    assert(store.scanCurrent(spark).count() == 150)
    // the replay copies snapshot summaries, so the ingest ledger carries
    // over: an at-least-once replay against MAIN is still a no-op
    assert(branchBatches.subsetOf(StreamAppend.committedBatchIds(store)))
    val snapsBefore = store.allSnapshotIds.size
    StreamAppend.commitBatch(store, ev.limit(100), branchBatches.max)
    assert(store.allSnapshotIds.size == snapsBefore, "ledger dedupes post-merge")
    Branches.drop(store, "ingest")
  }

  test("cherry-pick lands a pure-append branch commit on a diverged main") {
    val store = freshTable(40)
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "pick")
    import spark.implicits._
    // branch: an append (pickable) then a compact (not pickable)
    Append.run(spark, b,
      spark.range(40, 50).map(i => ClipSynth.clip(i, 120)).toDF())
    val appendSnap = b.currentSnapshotId.get
    Compact.run(spark, b, targetBytes = 64L * 1024 * 1024, runId = "pick-compact")
    val compactSnap = b.currentSnapshotId.get
    // main diverges — fast-forward is off the table
    Append.run(spark, store,
      spark.range(200, 205).map(i => ClipSynth.clip(i, 120)).toDF())
    intercept[IllegalArgumentException] { Branches.fastForward(store, "pick") }

    val picked = Branches.cherryPick(store, "pick", appendSnap)
    assert(store.scanCurrent(spark).count() == 55, "base 40 + diverged 5 + picked 10")
    assert(Branches.cherryPick(store, "pick", appendSnap) == picked, "idempotent")
    assert(store.scanCurrent(spark).count() == 55)
    // picked files carry MAIN-side seqs: a later main delete covers them
    Deletes.run(spark, store, Seq(ClipSynth.clipId(45)).toDF("clip_id"))
    assert(store.scanCurrent(spark).count() == 54)
    // rewrites are order-dependent: refused with the append-only message
    val ex = intercept[IllegalArgumentException] {
      Branches.cherryPick(store, "pick", compactSnap)
    }
    assert(ex.getMessage.contains("pure append"))
    Branches.drop(store, "pick", force = true)
  }

  test("review regressions: expiry pins branch files, merged survives expiry, ff resumes past expired replays, staged WAP via branch is GC-rooted, nested branch refused, feed sees cherry-picks") {
    import graft.ops.Wap
    import graft.streaming.ChangeFeed
    val store = freshTable(40)
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "reg")
    import spark.implicits._
    // branch: append X (fork+1), then compact it away (fork+2) — after the
    // ff, main expiry must NOT delete X while the branch log can reach it
    Append.run(spark, b,
      spark.range(40, 50).map(i => ClipSynth.clip(i, 120)).toDF())
    Compact.run(spark, b, targetBytes = 64L * 1024 * 1024, runId = "reg-compact")
    // WAP staged THROUGH the branch store: files live in main's data dir,
    // record in branch meta — must be an orphan-GC root on the main side
    Wap.stage(spark, b,
      spark.range(500, 510).map(i => ClipSynth.clip(i, 120)).toDF(), "pend")
    Branches.fastForward(store, "reg")

    val r = ExpireSnapshots.run(store, keepLast = 1)
    assert(r.retainedSnapshots.contains(fork))
    // every branch snapshot (incl. the pre-compact one) still fully scans
    (fork to fork + 2).foreach { id =>
      assert(b.scan(spark, id).count() == (if (id == fork) 40 else 50),
        s"branch snapshot $id readable after main expiry")
    }
    RemoveOrphans.run(store, minAgeMs = 0L)
    assert(Wap.scanStaged(spark, b, "pend").count() == 10,
      "branch-staged WAP batch survives orphan GC")
    assert(Branches.merged(store, "reg"),
      "merged() durable after the replayed snapshots expired")

    // incremental ff still works though earlier replays were expired
    Append.run(spark, b,
      spark.range(50, 55).map(i => ClipSynth.clip(i, 120)).toDF())
    assert(Branches.fastForward(store, "reg") == Seq(fork + 3))
    assert(store.scanCurrent(spark).count() == 55)

    // nesting refused: a branch's data root belongs to the parent
    intercept[IllegalArgumentException] { Branches.create(b, "nested") }

    // a cherry-pick is feed-visible like any other pure append
    val cur = store.currentSnapshotId.get
    Append.run(spark, b,
      spark.range(60, 63).map(i => ClipSynth.clip(i, 120)).toDF())
    Append.run(spark, store,
      spark.range(300, 302).map(i => ClipSynth.clip(i, 120)).toDF()) // diverge
    Branches.cherryPick(store, "reg", fork + 4)
    val feed = ChangeFeed.poll(spark, store, cur)
    assert(feed.df.count() == 5, "feed delivers diverged append + cherry-pick")
    Wap.discard(b, "pend")
    Branches.drop(store, "reg", force = true)
  }

  test("interrupted fast-forward resumes; repeated fast-forward is incremental") {
    val store = freshTable(30)
    val fork = store.currentSnapshotId.get
    val b = Branches.create(store, "inc")
    import spark.implicits._
    Append.run(spark, b,
      spark.range(30, 35).map(i => ClipSynth.clip(i, 120)).toDF())
    assert(Branches.fastForward(store, "inc") == Seq(fork + 1))
    assert(!Branches.merged(store, "inc") ||
      b.currentSnapshotId.contains(fork + 1))

    // more branch work after a completed ff — the next ff picks up only the
    // delta (this is also exactly the crash-mid-replay resume path: main
    // holds a verified prefix of the branch log)
    Append.run(spark, b,
      spark.range(35, 38).map(i => ClipSynth.clip(i, 120)).toDF())
    assert(Branches.fastForward(store, "inc") == Seq(fork + 2))
    assert(Branches.fastForward(store, "inc") == Seq.empty, "idempotent when caught up")
    assert(store.scanCurrent(spark).count() == 38)
    assert(Branches.merged(store, "inc"))
    Branches.drop(store, "inc")
  }

  test("branch maxRefAge: aged-out staging branch is dropped by expiry, permanent survives") {
    val store = freshTable(40)
    val fork = store.currentSnapshotId.get
    val stale = Branches.create(store, "stale-stage", maxRefAgeMs = 1L)
    Append.run(spark, stale, ClipSynth.dataset(spark, 10, 1, maxDurMs = 80).toDF())
    Branches.create(store, "keep-stage")
    Thread.sleep(5)
    val r = ExpireSnapshots.run(store, keepLast = 100)
    assert(r.branchesExpired == Seq("stale-stage"), s"got $r")
    assert(Branches.list(store).keySet == Set("keep-stage"))
    // main untouched: fork snapshot and every row still readable
    assert(store.scanCurrent(spark).count() == 40)
    assert(store.scan(spark, fork).count() == 40)
    // refs metadata table agrees (only the surviving branch remains)
    val refs = graft.ops.Refs.refsTable(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs == Set(("keep-stage", "branch")), s"got $refs")
  }

  test("fast-forward carries the branch's bloom shards to main") {
    val store = freshTable(40)
    val stage = Branches.create(store, "bloom-stage")
    // a branch-side compact writes its output's per-file blooms into the
    // BRANCH's side-table; after ff + drop, main's point probes must still
    // find bloom rows for the replayed files (else: conservative, unpruned)
    graft.ops.Compact.run(spark, stage, targetBytes = 64L * 1024 * 1024,
      runId = "bloom-stage-compact")
    Branches.fastForward(store, "bloom-stage")
    Branches.drop(store, "bloom-stage")
    val livePaths = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    val bloomPaths = graft.table.FileBloom.table(spark, store)
      .select("path").collect().map(_.getString(0)).toSet
    assert(livePaths.subsetOf(bloomPaths),
      s"ff'd files missing bloom rows: ${livePaths -- bloomPaths}")
  }

  test("branch maxRefAge measures LAST ACTIVITY: an actively-committed " +
    "branch older than its age never expires") {
    val store = freshTable(40)
    val active = Branches.create(store, "active-stage", maxRefAgeMs = 150L)
    Thread.sleep(200) // branch is now OLDER than its max age by creation time
    // ...but a commit just landed: head-snapshot aging must keep it
    Append.run(spark, active, ClipSynth.dataset(spark, 5, 1, maxDurMs = 80).toDF())
    assert(Branches.expireAged(store).isEmpty,
      "a branch with fresh commits must not be destroyed by createdMs aging")
    assert(Branches.list(store).keySet.contains("active-stage"))
    assert(active.scanCurrent(spark).count() == 45, "unmerged work intact")
    // once it actually goes quiet past the age, it expires
    Thread.sleep(200)
    assert(Branches.expireAged(store) == Seq("active-stage"))
  }
}
