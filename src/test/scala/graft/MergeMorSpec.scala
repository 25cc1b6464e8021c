package graft

import java.nio.file.Files

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read MERGE ([[MergeInto.runMor]]): copy-on-write parity, O(batch)
  * commit shape (zero data files rewritten), read-debt payoff via
  * [[Deletes.materialize]] (seq promotion + rewrite), and the AutoMaintain
  * delete-debt trigger. */
class MergeMorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): MetaStore =
    MetaStore.forClips(Files.createTempDirectory(s"graft-mor-$tag").toString)

  /** ids [0,30) then [30,60) in two appends (seqs 1 and 2). */
  private def seed(store: MetaStore): Unit = {
    Append.run(spark, store, ClipSynth.dataset(spark, 30, 2, maxDurMs = 40).toDF())
    Append.run(spark, store,
      ClipSynth.dataset(spark, 60, 2, maxDurMs = 40).toDF()
        .filter(col("clip_id") > ClipSynth.clipId(29)))
  }

  private def updateBatch() = // 10 updates of existing keys + 5 inserts
    ClipSynth.dataset(spark, 15, 1, maxDurMs = 40).toDF()
      .filter(col("clip_id") <= ClipSynth.clipId(9))
      .withColumn("transcript", concat(col("transcript"), lit(" upd")))
      .unionByName(
        spark.range(60, 65).map(i => ClipSynth.clip(i, 40)).toDF()
          .withColumn("transcript", concat(col("transcript"), lit(" ins"))))

  private def rows(store: MetaStore): Set[(String, String)] =
    store.scanCurrent(spark).select("clip_id", "transcript")
      .as[(String, String)].collect().toSet

  test("merge-on-read result equals copy-on-write; zero data files rewritten") {
    val cow = freshStore("cow"); seed(cow)
    val mor = freshStore("mor"); seed(mor)
    // clipId(5) is ALSO in the update batch: delete must win, as in COW
    val delKeys = Seq(ClipSynth.clipId(20), ClipSynth.clipId(21), ClipSynth.clipId(5))
      .toDF("clip_id")

    MergeInto.run(spark, cow, updateBatch(), deleteKeys = Some(delKeys))
    val beforePaths = mor.entries(mor.currentSnapshotId.get).map(_.path).toSet
    val res = MergeInto.runMor(spark, mor, updateBatch(), deleteKeys = Some(delKeys))

    assert(rows(cow) == rows(mor), "MOR and COW merge must produce identical rows")
    assert(res.filesTouched == 0)
    assert(res.deleteRows == 17, "10 update keys + 5 insert keys + 2 delete keys")
    val afterPaths = mor.entries(res.snapshotId).map(_.path).toSet
    assert(beforePaths.subsetOf(afterPaths), "no parent data file may be rewritten")
    assert(mor.deleteEntries(res.snapshotId).size == 1, "one delete era per merge")
  }

  test("successive MOR merges: last write wins; materialize retires all debt") {
    val store = freshStore("succ"); seed(store)
    val k = ClipSynth.clipId(5)
    (1 to 3).foreach { v =>
      val upd = ClipSynth.dataset(spark, 6, 1, maxDurMs = 40).toDF()
        .filter(col("clip_id") === k)
        .withColumn("transcript", lit(s"version $v"))
      MergeInto.runMor(spark, store, upd, runId = s"mor-$v")
    }
    val snap = store.currentSnapshotId.get
    assert(store.deleteEntries(snap).size == 3, "three delete eras accumulated")
    val before = rows(store)
    assert(before.count(_._1 == k) == 1)
    assert(before.find(_._1 == k).get._2 == "version 3")

    val m = Deletes.materialize(spark, store)
    assert(m.deletesRetired == 3)
    assert(store.deleteEntries(m.snapshotId).isEmpty)
    assert(rows(store) == before, "materialize must not change visible rows")
    // every data file now sits at/above every retired delete's seq
    assert(store.entries(m.snapshotId).map(_.seq).min >= snap)
  }

  test("materialize promotes provably-clean files metadata-only") {
    val store = freshStore("promote"); seed(store)
    // delete keys land only in the [0,30) file(s): the [30,60) files must be
    // PROMOTED (zonemap/bloom prove absence), not rewritten
    val upd = ClipSynth.dataset(spark, 3, 1, maxDurMs = 40).toDF()
      .withColumn("transcript", lit("touched"))
    MergeInto.runMor(spark, store, upd)
    val before = rows(store)
    val entriesBefore = store.entries(store.currentSnapshotId.get)

    val m = Deletes.materialize(spark, store)
    val covered = entriesBefore.filter(e =>
      store.deleteEntries(store.snapshot(m.snapshotId).parentId)
        .exists(_.seq > e.seq))
    assert(m.filesPromoted > 0, "files not containing any delete key must be promoted")
    assert(m.filesRewritten > 0, "files containing delete keys must be rewritten")
    assert(m.filesPromoted + m.filesRewritten == covered.size)
    assert(rows(store) == before)
    // promoted files keep their exact paths (metadata-only), with seq lifted
    val after = store.entries(m.snapshotId)
    val promoted = covered.map(_.path).toSet.intersect(after.map(_.path).toSet)
    assert(promoted.size == m.filesPromoted)
    promoted.foreach { p =>
      assert(after.find(_.path == p).get.seq == m.snapshotId,
        "promoted file's seq must be the materialize commit id")
    }
  }

  test("AutoMaintain diagnoses MOR debt and converges after materialize") {
    val store = freshStore("auto"); seed(store)
    val policy = MaintenancePolicy(maxDeleteEras = 2, expireKeepLast = 1000)
    (1 to 4).foreach { v =>
      val upd = ClipSynth.dataset(spark, 2, 1, maxDurMs = 40).toDF()
        .withColumn("transcript", lit(s"u$v"))
      MergeInto.runMor(spark, store, upd, runId = s"auto-mor-$v")
    }
    val before = rows(store)
    val plan = AutoMaintain.plan(store, policy)
    assert(plan.exists(_.op == "materialize-deletes"),
      s"4 delete eras must trigger materialize (plan: $plan)")
    AutoMaintain.run(spark, store, policy)
    assert(store.deleteEntries(store.currentSnapshotId.get).isEmpty)
    assert(rows(store) == before)
    assert(!AutoMaintain.plan(store, policy).exists(_.op.contains("delete")),
      "delete debt must be cleared")
  }

  test("streaming upsert in MOR mode: parity with relational replay, zero rewrites") {
    val store = freshStore("stream"); seed(store)
    val basePaths = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    val batches = (0 until 3).map { v =>
      ClipSynth.dataset(spark, 10, 1, maxDurMs = 40).toDF()
        .filter(col("clip_id") <= ClipSynth.clipId(3 + v))
        .withColumn("transcript", lit(s"batch $v"))
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamAppend.commitMergeBatch(store, b, i.toLong, mor = true)
    }
    // replay of batch 1 must be a no-op (exactly-once ledger)
    graft.streaming.StreamAppend.commitMergeBatch(store, batches(1), 1L, mor = true)
    val expect = rows(freshStoreWithReplay(batches))
    assert(rows(store) == expect)
    assert(basePaths.subsetOf(
      store.entries(store.currentSnapshotId.get).map(_.path).toSet),
      "MOR streaming upsert must never rewrite base files")
  }

  /** Relational replay: base ∪ batches, last batch wins per key. */
  private def freshStoreWithReplay(batches: Seq[org.apache.spark.sql.DataFrame]): MetaStore = {
    val store = freshStore("replay"); seed(store)
    batches.foreach(b => MergeInto.run(spark, store, b)) // COW as the oracle
    store
  }

  test("auto merge picks the write mode by estimated rewrite amplification") {
    val store = freshStore("auto-mode"); seed(store)
    def upd(i: Long, tag: String) =
      ClipSynth.dataset(spark, 60, 1, maxDurMs = 40).toDF()
        .filter(col("clip_id") === ClipSynth.clipId(i))
        .withColumn("transcript", lit(tag))
    // forced-COW regime: any amplification below a huge threshold
    val cow = MergeInto.auto(spark, store, upd(2, "cow write"),
      morThreshold = 1e9, runId = "auto-cow")
    assert(cow.filesTouched > 0 && cow.deleteRows == 0)
    val cowSnap = store.snapshot(cow.snapshotId)
    assert(cowSnap.summary("mergeMode") == "cow")
    assert(cowSnap.summary("rewriteAmplificationEst").toDouble > 1.0,
      "rewriting a whole file for a one-row update must estimate > 1x")
    // forced-MOR regime: any amplification above zero
    val mor = MergeInto.auto(spark, store, upd(3, "mor write"),
      morThreshold = 0.0, runId = "auto-mor")
    assert(mor.filesTouched == 0 && mor.deleteRows == 1)
    assert(store.snapshot(mor.snapshotId).summary("mergeMode") == "mor")
    val r = rows(store)
    assert(r.find(_._1 == ClipSynth.clipId(2)).get._2 == "cow write")
    assert(r.find(_._1 == ClipSynth.clipId(3)).get._2 == "mor write")
  }

  test("streaming MOR upsert with in-loop maintenance keeps delete debt bounded") {
    val srcDir = Files.createTempDirectory("graft-morups-src-").toString
    val ckpt = Files.createTempDirectory("graft-morups-ckpt-").toString
    val store = freshStore("morups"); seed(store)
    (0 until 4).foreach { k =>
      val upd = ClipSynth.dataset(spark, 60, 1, maxDurMs = 40).toDF()
        .filter(col("clip_id") <= ClipSynth.clipId(4 + k))
        .withColumn("transcript", lit(s"mor batch $k"))
      upd.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/b$k")
      val part = new java.io.File(s"$srcDir/b$k").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"f$k.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (k + 1)) // pin batch order
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$srcDir/b$k"))
    }
    val src = spark.readStream.option("maxFilesPerTrigger", 1)
      .schema(spark.read.parquet(s"$srcDir/f0.parquet").schema).parquet(srcDir)
    val q = graft.streaming.StreamAppend.startUpsert(store, src, ckpt,
      "morups_q", mor = true, maintainEvery = 2,
      policy = MaintenancePolicy(maxDeleteEras = 1, expireKeepLast = 1000))
    try q.processAllAvailable() finally q.stop()

    assert(store.deleteEntries(store.currentSnapshotId.get).isEmpty,
      "in-loop maintenance must have materialized the accumulated delete eras")
    val r = rows(store)
    assert(r.find(_._1 == ClipSynth.clipId(3)).get._2 == "mor batch 3",
      "last batch wins for keys present in every batch")
    assert(r.find(_._1 == ClipSynth.clipId(7)).get._2 == "mor batch 3")
    assert(r.size == 60, "updates only — no row count change")
  }

  test("CDC across a MOR merge: updates are updates, not phantom inserts") {
    val store = freshStore("cdc"); seed(store)
    val from = store.currentSnapshotId.get
    val delKeys = Seq(ClipSynth.clipId(25)).toDF("clip_id")
    MergeInto.runMor(spark, store, updateBatch(), deleteKeys = Some(delKeys))
    val to = store.currentSnapshotId.get

    val ch = Changes.rowChanges(spark, store, from, to)
      .as[(String, String)].collect().groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    assert(ch.getOrElse("update", Set.empty) ==
      (0L to 9L).map(ClipSynth.clipId).toSet,
      s"updated keys must classify as update, got $ch")
    assert(ch.getOrElse("insert", Set.empty) ==
      (60L until 65L).map(ClipSynth.clipId).toSet)
    assert(ch.getOrElse("delete", Set.empty) == Set(ClipSynth.clipId(25)))
  }

  test("runEvolving: batch-only columns evolve the target metadata-only, types never coerce") {
    val store = freshStore("evolve")
    seed(store)
    val filesBefore = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    val upd = ClipSynth.dataset(spark, 5, 1, maxDurMs = 40).toDF()
      .withColumn("transcript", concat(col("transcript"), lit(" scored")))
      .withColumn("quality_score", lit(0.9))
    MergeInto.runEvolving(spark, store, upd, runId = "mor-evolve-1")
    val cur = store.scanCurrent(spark)
    assert(cur.schema.fieldNames.contains("quality_score"))
    assert(cur.filter(col("quality_score") === 0.9).count() === 5)
    // every row the merge did not touch reads the NULL default — the
    // widening itself rewrote nothing (old files still live)
    assert(cur.filter(col("quality_score").isNull).count() === 55)
    val filesNow = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    assert((filesBefore -- filesNow).size <= 1,
      "widening + small merge must not rewrite the whole table")

    // same-name different-type batch is refused, not coerced
    val bad = ClipSynth.dataset(spark, 1, 1, maxDurMs = 40).toDF()
      .withColumn("quality_score", lit("high"))
    val e = intercept[IllegalArgumentException] {
      MergeInto.runEvolving(spark, store, bad, runId = "mor-evolve-2")
    }
    assert(e.getMessage.contains("quality_score"))

    // a narrow batch aimed at MOR is refused loudly (wholesale row
    // replacement cannot keep absent columns; a narrower file would poison
    // later scans)
    val narrowMor = ClipSynth.dataset(spark, 1, 1, maxDurMs = 40).toDF()
    val e2 = intercept[IllegalArgumentException] {
      MergeInto.runMor(spark, store, narrowMor, runId = "mor-evolve-narrow")
    }
    assert(e2.getMessage.contains("quality_score"))

    // a narrow batch (no score column) still merges against the wide target
    val narrow = ClipSynth.dataset(spark, 1, 1, maxDurMs = 40).toDF()
      .withColumn("transcript", lit("narrow"))
    MergeInto.runEvolving(spark, store, narrow, runId = "mor-evolve-3")
    val row0 = store.scanCurrent(spark)
      .filter(col("clip_id") === ClipSynth.clipId(0))
      .select("transcript", "quality_score").head()
    assert(row0.getString(0) == "narrow")
  }

  test("merge resolves batch columns case-insensitively like the session") {
    val store = freshStore("case")
    seed(store)
    // batch carries TRANSCRIPT (case-drifted, the usual upstream-rename
    // accident): Spark resolves it to the target column, so the merge must
    // APPLY the update — a case-sensitive membership test silently kept the
    // target's old values on matched rows
    val upd = ClipSynth.dataset(spark, 3, 1, maxDurMs = 40).toDF()
      .withColumnRenamed("transcript", "TRANSCRIPT")
      .withColumn("TRANSCRIPT", lit("case-applied"))
    MergeInto.run(spark, store, upd, runId = "case-cow")
    assert(store.scanCurrent(spark)
      .filter(col("transcript") === "case-applied").count() === 3)
    // MOR path: guard accepts the full-but-case-drifted batch and the
    // physically written file carries the target's exact column spelling
    val upd2 = ClipSynth.dataset(spark, 2, 1, maxDurMs = 40).toDF()
      .withColumnRenamed("transcript", "Transcript")
      .withColumn("Transcript", lit("case-mor"))
    MergeInto.runMor(spark, store, upd2, runId = "case-mor")
    val cur = store.scanCurrent(spark)
    assert(cur.schema.fieldNames.count(_.equalsIgnoreCase("transcript")) == 1)
    assert(cur.filter(col("transcript") === "case-mor").count() === 2)
  }

  test("runEvolving rolls the widening back when the merge half fails") {
    val store = freshStore("evolve-atomic")
    seed(store)
    val before = store.scanCurrent(spark).schema.fieldNames.toSet
    // new column AND a type conflict in the same batch — the new column
    // FIRST in schema order, so addColumn lands durably before the conflict
    // aborts the merge; the widening must not stay durable without the data
    // that justified it
    val bad0 = ClipSynth.dataset(spark, 2, 1, maxDurMs = 40).toDF()
      .withColumn("brand_new_col", lit(1.5))
      .withColumn("sr_hz", lit("not-an-int"))
    val bad = bad0.select(col("brand_new_col") +:
      bad0.columns.filter(_ != "brand_new_col").map(col).toSeq: _*)
    intercept[IllegalArgumentException] {
      MergeInto.runEvolving(spark, store, bad, runId = "evolve-fail")
    }
    val after = store.scanCurrent(spark).schema.fieldNames.toSet
    assert(after == before,
      s"failed evolve+merge left schema residue: ${after -- before}")
  }
}
