package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import graft.ops._
import graft.synth.ClipSynth
import graft.table.{ConcurrentCommitException, MetaStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Concurrent-writer safety of the delete set: the carry-forward and seq
  * stamping live INSIDE the commit section (commitDelta addedDeletes), and
  * replace-mode/rewrite commits CAS on the snapshot they planned against
  * (expectedParent). Without either, an interleaved writer loses deletes or
  * publishes delete seqs below the actual commit id (uncovered rows). */
class CommitRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): MetaStore =
    MetaStore.forClips(Files.createTempDirectory(s"graft-race-$tag").toString)

  private def seed(store: MetaStore): Unit =
    Append.run(spark, store, ClipSynth.dataset(spark, 60, 2, maxDurMs = 40).toDF())

  private def inParallel[T](n: Int)(body: Int => T): Seq[T] = {
    val pool = Executors.newFixedThreadPool(n)
    try pool.invokeAll((0 until n).map(i =>
        new java.util.concurrent.Callable[T] { def call(): T = body(i) }).asJava)
      .asScala.map(_.get()).toSeq
    finally pool.shutdown()
  }

  test("16 concurrent equality deletes: none lost, every seq = its commit id") {
    val store = freshStore("deletes")
    seed(store)
    val base = store.currentSnapshotId.get
    val keys = (0L until 16L).map(ClipSynth.clipId)

    inParallel(16) { i => Deletes.run(spark, store, Seq(keys(i)).toDF("clip_id")) }

    val cur = store.currentSnapshotId.get
    assert(cur == base + 16, "16 contiguous delete commits")
    val dels = store.deleteEntries(cur)
    assert(dels.size == 16, s"all 16 delete files live, got ${dels.size}")
    val visible = store.scanCurrent(spark).select("clip_id").as[String].collect().toSet
    assert(keys.forall(!visible.contains(_)), "every concurrently-deleted key hidden")
    assert(visible.size == 60 - 16)

    // seq-stamp property: a delete file's seq equals the id of the snapshot
    // that INTRODUCED it (so it covers everything up to and including the
    // state it was committed against, and nothing after)
    var seen = Set.empty[String]
    (base + 1 to cur).foreach { id =>
      val here = store.deleteEntries(id)
      val fresh = here.filterNot(e => seen.contains(e.path))
      assert(fresh.size == 1, s"snapshot $id introduces exactly one delete file")
      assert(fresh.head.seq == id,
        s"delete introduced at $id carries seq ${fresh.head.seq}")
      seen ++= fresh.map(_.path)
    }
  }

  test("8 concurrent MOR merges of one key: exactly the last committer's row wins") {
    val store = freshStore("mor")
    seed(store)
    val key = ClipSynth.clipId(7)
    val template = store.scanCurrent(spark).filter(col("clip_id") === key)

    inParallel(8) { i =>
      MergeInto.runMor(spark, store,
        template.withColumn("transcript", lit(s"version-$i")),
        runId = s"race-$i")
    }

    val rows = store.scanCurrent(spark).filter(col("clip_id") === key)
      .select("transcript").as[String].collect()
    assert(rows.length == 1,
      s"one visible version after 8 racing upserts, got ${rows.length}")
    // the winner is the merge that committed LAST (highest snapshot id)
    val lastMerge = store.allSnapshotIds.sorted.reverse
      .map(store.snapshot).find(_.operation == "merge-mor").get
    val winner = lastMerge.summary("runId").stripPrefix("race-")
    assert(rows.head == s"version-$winner",
      s"visible row must come from the last-committed merge (race-$winner)")
    assert(store.scanCurrent(spark).count() == 60, "other rows untouched")
  }

  test("expectedParent CAS: a stale-planned commit fails instead of clobbering") {
    val store = freshStore("cas")
    seed(store)
    val planned = store.currentSnapshotId.get
    // interleaved writer lands after the plan
    Deletes.run(spark, store, Seq(ClipSynth.clipId(3)).toDF("clip_id"))
    val e = intercept[ConcurrentCommitException] {
      store.commitDelta("compact", Nil, expectedParent = Some(planned))
    }
    assert(e.getMessage.contains(s"planned against snapshot $planned"))
    // same guard on full-manifest commits (cluster/transcode path)
    intercept[ConcurrentCommitException] {
      store.commit("cluster", store.entries(store.currentSnapshotId.get),
        expectedParent = Some(planned))
    }
    // and the interleaved delete survived
    assert(store.deleteEntries(store.currentSnapshotId.get).nonEmpty)
  }

  test("compactManifests racing appends never drops an interleaved batch") {
    val store = freshStore("remanifest")
    seed(store)
    // re-shard storms alongside appends: the re-shard serializes a FULL file
    // list, so without its CAS an append landing in between is clobbered
    // (its files vanish from the re-sharded snapshot). withCommitRetry makes
    // every racer eventually succeed; row count proves no batch was lost.
    val results = inParallel(8) { i =>
      if (i % 2 == 0) {
        Append.run(spark, store, // retries internally on commit races
          ClipSynth.dataset(spark, 10, 1, maxDurMs = 40).toDF()
            .withColumn("clip_id", concat(lit(s"r${i}_"), col("clip_id"))))
        10L
      } else { store.compactManifests(); 0L }
    }
    val expected = 60L + results.sum
    assert(store.scanCurrent(spark).count() == expected,
      "an interleaved append was clobbered by a stale manifest re-shard")
  }

  test("batched cluster rerun after an interleaved delete must not resurrect rows") {
    val store = freshStore("clre")
    seed(store)
    // complete a batched cluster run, leaving its checkpoint markers behind
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 32L * 1024,
      runId = "sticky", batches = 2)
    // an equality delete lands; rerunning the SAME runId (an operator retry,
    // a cron with a fixed id) must re-plan against the new base — reusing the
    // saved batch outputs would resurrect the deleted rows under a fresh seq
    val victim = ClipSynth.clipId(5)
    Deletes.run(spark, store, Seq(victim).toDF("clip_id"))
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 32L * 1024,
      runId = "sticky", batches = 2)
    val visible = store.scanCurrent(spark).select("clip_id").as[String].collect()
    assert(!visible.contains(victim), "deleted row resurrected by stale checkpoint")
    assert(visible.length == 59)
  }

  test("concurrent deleteWhere + expireInert converge without losing keys") {
    val store = freshStore("mixed")
    seed(store)
    // full rewrite so every data seq > current delete seqs -> nothing inert yet
    val ulaw = (0L until 60L).filter(i => ClipSynth.codec(i) == "ulaw")
      .map(ClipSynth.clipId).toSet
    val results = inParallel(4) {
      case 0 => Deletes.deleteWhere(spark, store,
        Seq(graft.table.Pred.EqualTo("codec", "ulaw"))); "dw"
      case 1 => Deletes.run(spark, store,
        Seq(ClipSynth.clipId(1)).toDF("clip_id")); "run"
      case 2 => try { Deletes.expireInert(store); "exp" }
        catch { case _: ConcurrentCommitException => "exp-replanned" }
      case _ => Deletes.run(spark, store,
        Seq(ClipSynth.clipId(2)).toDF("clip_id")); "run"
    }
    assert(results.size == 4)
    val visible = store.scanCurrent(spark).select("clip_id").as[String].collect().toSet
    assert(!visible.contains(ClipSynth.clipId(1)))
    assert(!visible.contains(ClipSynth.clipId(2)))
    assert(ulaw.forall(!visible.contains(_)), "predicate delete fully applied")
  }

  test("path-set cache budget never leaks past the cap; frees re-admit") {
    // ADVICE r4: failed admissions and lost putIfAbsent races used to leave
    // their reservation un-refunded, so one cap-exceeding burst drove the
    // budget permanently negative and the cache silently stopped admitting.
    // Invariant under concurrent churn: at quiescence,
    //   initialBudget - Σ size(cached sets) == currentBudget   (no drift)
    // and after forgetting everything the budget returns to its initial
    // value and fresh shards are admitted again.
    val store = freshStore("budget")
    store.manifestShardSize = 4
    Append.run(spark, store,
      ClipSynth.dataset(spark, 60, 6, maxDurMs = 40).toDF())
    val metaDir = java.nio.file.Paths.get(store.tableDir, "meta")
    val names = Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("manifest-")).toVector
    assert(names.size >= 2, s"need several shards, got ${names.size}")
    val sizes = names.map(n => n -> store.readManifestEntries(n).size).toMap
    val largest = sizes.values.max.toLong

    // reset to a cap that can admit roughly one shard, then hammer
    store.manifestPathSets.clear()
    val cap = largest + 1
    store.manifestPathSetBudget.set(cap)
    inParallel(16) { _ =>
      (1 to 25).foreach(_ => names.foreach(store.readManifestEntries))
    }
    val cached = store.manifestPathSets.values.asScala.map(_.size.toLong).sum
    assert(store.manifestPathSetBudget.get == cap - cached,
      s"budget drifted: cap=$cap cached=$cached " +
        s"budget=${store.manifestPathSetBudget.get}")
    assert(store.manifestPathSetBudget.get >= cap - cached - largest,
      "budget below the one-outstanding-reservation floor")

    // free everything: full refund, and the cache admits again
    names.foreach(store.forgetManifest)
    assert(store.manifestPathSets.isEmpty)
    assert(store.manifestPathSetBudget.get == cap,
      "refund after churn did not restore the full budget")
    store.readManifestEntries(names.head)
    assert(store.manifestPathSets.containsKey(names.head),
      "cache permanently stopped admitting after cap-exceeding churn")
  }

  test("partial-rewrite classification: warm path-set cache equals cold parse") {
    // the manifest path-set cache lets a warm driver reuse untouched shards
    // without parsing; a COLD MetaStore on the same dir must classify the
    // identical removal to the identical snapshot (cache is never input)
    val warm = freshStore("pathset")
    warm.manifestShardSize = 1 // one shard per file: reuse-vs-parse is visible
    Append.run(spark, warm, ClipSynth.dataset(spark, 60, 3, maxDurMs = 40).toDF())
    val snap = warm.currentSnapshotId.get
    val all = warm.entries(snap)
    assert(snap > 0 && all.size >= 3)
    val victims = all.take(1).map(_.path).toSet
    val warmId = warm.commitDelta("compact", Seq.empty, removedPaths = victims)
    val warmEntries = warm.entries(warmId).map(_.path).toSet

    val cold = new MetaStore(warm.tableDir, MetaStore.ClipStatsColumns)
    // roll back so the cold instance replays the SAME removal from `snap`
    assert(cold.entries(snap).map(_.path).toSet == all.map(_.path).toSet)
    assert(warmEntries == all.map(_.path).toSet -- victims)
    // cold classification of a FURTHER removal must agree with a warm one
    val victims2 = all.slice(1, 2).map(_.path).toSet
    val coldId = cold.commitDelta("compact", Seq.empty, removedPaths = victims2)
    assert(cold.entries(coldId).map(_.path).toSet ==
      warmEntries -- victims2)
    assert(warm.entries(coldId).map(_.path).toSet ==
      cold.entries(coldId).map(_.path).toSet)
  }
}
