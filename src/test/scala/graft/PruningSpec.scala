package graft

import java.nio.file.Files

import graft.ops.{Append, Cluster, ZOrderCurve}
import graft.synth.ClipSynth
import graft.table.{ColStat, DataFile, MetaStore, Pred, Pruning}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Zonemap file pruning: conservative predicate-vs-stats elimination
 * (unit-level against hand-built DataFiles) and the end-to-end contract —
 * after a curve cluster, a range probe skips files AND returns exactly the
 * rows of scan+filter.
 */
class PruningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def file(rows: Long, stats: (String, ColStat)*): DataFile =
    DataFile("f", rows, 1L, stats.toMap)

  private def num(min: String, max: String, nulls: Long = 0): ColStat =
    ColStat(min, max, numeric = true, nulls)

  test("Pred.mayMatch: numeric ranges, equality, in-set") {
    val f = file(100, "d" -> num("100", "200"))
    assert(Pred.Between("d", 150L, 160L).mayMatch(f))
    assert(Pred.Between("d", 200L, 300L).mayMatch(f)) // touches max
    assert(!Pred.Between("d", 201L, 300L).mayMatch(f))
    assert(!Pred.Between("d", 0L, 99L).mayMatch(f))
    assert(Pred.EqualTo("d", 100L).mayMatch(f))
    assert(!Pred.EqualTo("d", 99L).mayMatch(f))
    assert(Pred.GtEq("d", 200L).mayMatch(f) && !Pred.Gt("d", 200L).mayMatch(f))
    assert(Pred.LtEq("d", 100L).mayMatch(f) && !Pred.Lt("d", 100L).mayMatch(f))
    assert(Pred.InSet("d", Seq(10L, 150L)).mayMatch(f))
    assert(!Pred.InSet("d", Seq(10L, 300L)).mayMatch(f))
    // numeric compare, not lexicographic: "90" > "200" as strings
    assert(!Pred.GtEq("d", 900L).mayMatch(f))
    assert(Pred.GtEq("d", 90L).mayMatch(f))
  }

  test("Pred.mayMatch is conservative on uncertainty") {
    val noStats = file(100)
    assert(Pred.Between("d", 0L, 1L).mayMatch(noStats)) // no stats -> keep
    val allNull = file(100, "d" -> num("", "", nulls = 100))
    assert(!Pred.GtEq("d", 0L).mayMatch(allNull)) // comparisons never match null
    val someNull = file(100, "d" -> num("", "", nulls = 50))
    assert(Pred.GtEq("d", 0L).mayMatch(someNull)) // unparseable min/max -> keep
    val str = file(10, "s" -> ColStat("apple", "pear", numeric = false, 0))
    assert(Pred.EqualTo("s", "banana").mayMatch(str))
    assert(!Pred.EqualTo("s", "zebra").mayMatch(str))
  }

  test("post-cluster range probe skips files and equals scan+filter") {
    val dir = Files.createTempDirectory("graft-prune-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store,
      ClipSynth.dataset(spark, 800, 16, maxDurMs = 300).toDF())
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 512L * 1024,
      runId = "prune-spec", hashCols = Seq.empty,
      rangeCols = Seq("sr_hz", "dur_ms"))

    val preds = Seq(Pred.Between("dur_ms", 120L, 180L))
    val ps = store.scanCurrentPruned(spark, preds)
    assert(ps.filesTotal > 4, s"want several files, got ${ps.filesTotal}")
    assert(ps.filesKept < ps.filesTotal,
      s"range probe should skip files: kept ${ps.filesKept}/${ps.filesTotal}")

    val full = store.scanCurrent(spark)
      .filter(col("dur_ms") >= 120L && col("dur_ms") <= 180L)
      .select("clip_id").collect().map(_.getString(0)).sorted
    val pruned = ps.df.select("clip_id").collect().map(_.getString(0)).sorted
    assert(pruned.sameElements(full), "pruned scan must equal scan+filter")
    assert(ps.rowsKeptUpperBound >= pruned.length)
  }

  test("bloom point-lookup prunes hash-scattered keys; zero false negatives") {
    val dir = Files.createTempDirectory("graft-bloom-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store,
      ClipSynth.dataset(spark, 400, 8, maxDurMs = 150).toDF())
    // curve rewrite interleaves clip_id HASH bits -> every file's clip_id
    // zonemap spans the key space; only the bloom can prune a point probe
    graft.ops.Cluster.run(spark, store, graft.ops.ZOrderCurve,
      targetBytes = 128L * 1024, runId = "bloom-cluster")
    val entries = store.entries(store.currentSnapshotId.get)
    assert(entries.size > 4, s"want several files, got ${entries.size}")

    val key = graft.synth.ClipSynth.clipId(123L)
    val pred = Seq(Pred.EqualTo("clip_id", key))
    // zonemaps alone keep (nearly) everything on this layout
    val zoneOnly = Pruning.keep(entries, pred).size
    assert(zoneOnly == entries.size,
      s"zonemap should not prune a hash-scattered point probe ($zoneOnly/${entries.size})")
    val ps = store.scanCurrentPruned(spark, pred)
    assert(ps.filesKept < ps.filesTotal,
      s"bloom should prune: kept ${ps.filesKept}/${ps.filesTotal}")
    assert(ps.df.count() == 1L)

    // zero false negatives over EVERY key (the safety contract): each clip's
    // point lookup through the bloom path returns exactly its row
    val probes = Seq(0L, 57L, 200L, 399L).map(graft.synth.ClipSynth.clipId)
    val inSet = store.scanCurrentPruned(spark,
      Seq(Pred.InSet("clip_id", probes)))
    assert(inSet.df.select("clip_id").collect().map(_.getString(0)).sorted.toSeq
      == probes.sorted)
    // library-level exhaustive property
    (0 until 400 by 7).foreach { i =>
      val k = graft.synth.ClipSynth.clipId(i.toLong)
      val bits = new Array[Long](1024 / 64)
      graft.table.FileBloom.add(bits, k)
      assert(graft.table.FileBloom.mightContain(graft.table.FileBloom.pack(bits), k),
        s"false negative for $k")
    }
  }

  test("bloom side-table compaction folds shards to live-only and stays correct") {
    val dir = Files.createTempDirectory("graft-bloomgc-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store,
      ClipSynth.dataset(spark, 200, 4, maxDurMs = 120).toDF())
    Append.run(spark, store,
      ClipSynth.dataset(spark, 400, 4, maxDurMs = 120).toDF()
        .filter(col("clip_id") > graft.synth.ClipSynth.clipId(199)))
    // the rewrite strands the two append shards' rows (their files die)
    graft.ops.Cluster.run(spark, store, graft.ops.ZOrderCurve,
      targetBytes = 128L * 1024, runId = "bloomgc-cluster")
    assert(graft.table.FileBloom.shardCount(store) >= 3)

    val res = graft.table.FileBloom.compact(spark, store)
    assert(res.shardsAfter == 1 && res.shardsBefore >= 3)
    assert(res.rowsDropped > 0, "dead files' bloom rows must be dropped")
    val live = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    assert(res.rowsKept == live.size.toLong, "exactly one row per live file")

    // probes after the fold: still pruning, still zero false negatives
    val key = graft.synth.ClipSynth.clipId(123L)
    val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("clip_id", key)))
    assert(ps.filesKept < ps.filesTotal, "bloom pruning survives the fold")
    assert(ps.df.count() == 1L)

    // the AutoMaintain trigger plans and clears it
    val policy = graft.ops.MaintenancePolicy(maxBloomShards = 1,
      maxSmallFiles = Int.MaxValue, maxOverlapDepth = Double.MaxValue,
      expireKeepLast = Int.MaxValue)
    Append.run(spark, store,
      ClipSynth.dataset(spark, 410, 1, maxDurMs = 120).toDF()
        .filter(col("clip_id") > graft.synth.ClipSynth.clipId(399)))
    assert(graft.table.FileBloom.shardCount(store) == 2)
    val plan = graft.ops.AutoMaintain.plan(store, policy)
    assert(plan.exists(_.op == "compact-blooms"))
    graft.ops.AutoMaintain.run(spark, store, policy)
    assert(graft.table.FileBloom.shardCount(store) == 1)
    assert(graft.ops.AutoMaintain.plan(store, policy)
      .forall(_.op != "compact-blooms"), "trigger clears at the fixed point")
  }

  test("prune-all preserves schema; match-all keeps every file") {
    val dir = Files.createTempDirectory("graft-prune2-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store,
      ClipSynth.dataset(spark, 100, 4, maxDurMs = 200).toDF())
    val none = store.scanCurrentPruned(spark,
      Seq(Pred.Gt("dur_ms", 100000L)))
    assert(none.filesKept == 0 && none.df.count() == 0)
    assert(none.df.columns.contains("clip_id")) // schema survives full prune
    val all = store.scanCurrentPruned(spark, Seq(Pred.GtEq("dur_ms", 0L)))
    assert(all.filesKept == all.filesTotal)
    assert(all.df.count() == store.scanCurrent(spark).count())
  }
}
