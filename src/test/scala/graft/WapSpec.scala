package graft

import java.nio.file.{Files, Paths}

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-Audit-Publish staging ([[Wap]]): isolation before publish, the
  * audit gate, atomic publication, discard, GC-root protection, and the
  * schema-era guard. */
class WapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(tag: String): MetaStore =
    MetaStore.forClips(Files.createTempDirectory(s"graft-wap-$tag").toString)

  private def seed(store: MetaStore): Unit =
    Append.run(spark, store, ClipSynth.dataset(spark, 40, 2, maxDurMs = 40).toDF())

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).map(i => ClipSynth.clip(i, 40)).toDF()

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("clip_id").as[String].collect().toSet

  test("staged rows are invisible until publish; publish is O(batch) append") {
    val store = freshStore("iso"); seed(store)
    val before = ids(store.scanCurrent(spark))
    val manifestsBefore = store.snapshot(store.currentSnapshotId.get).manifests.toSet

    Wap.stage(spark, store, batch(40, 50), "nightly")
    assert(ids(store.scanCurrent(spark)) == before, "staged rows must be invisible")
    assert(ids(Wap.scanStaged(spark, store, "nightly")) ==
      (40L until 50L).map(ClipSynth.clipId).toSet)
    assert(ids(Wap.scanWith(spark, store, "nightly")) ==
      before ++ (40L until 50L).map(ClipSynth.clipId))

    assert(Wap.audit(spark, store, "nightly").isEmpty)
    val id = Wap.publish(store, "nightly")
    assert(ids(store.scanCurrent(spark)) ==
      before ++ (40L until 50L).map(ClipSynth.clipId))
    // O(batch): every parent manifest reused by the publish commit
    assert(manifestsBefore.subsetOf(store.snapshot(id).manifests.toSet))
    assert(Wap.list(store).isEmpty, "record must be dropped after publish")
    assert(store.snapshot(id).summary("wapName") == "nightly")
  }

  test("publish requires a clean audit; violations block and discard cleans up") {
    val store = freshStore("audit"); seed(store)
    val bad = batch(40, 46).withColumn("sr_hz", lit(999)) // out of range
    Wap.stage(spark, store, bad, "suspect")
    intercept[IllegalArgumentException](Wap.publish(store, "suspect"))
    val v = Wap.audit(spark, store, "suspect")
    assert(v.nonEmpty && v.exists(_.constraint.startsWith("in_range(sr_hz")))
    assert(v.find(_.constraint.startsWith("in_range(sr_hz")).get.rows == 6)
    intercept[IllegalArgumentException](Wap.publish(store, "suspect"))

    val paths = Wap.get(store, "suspect").entries.map(_.path)
    assert(paths.forall(p => Files.exists(Paths.get(p))))
    val deleted = Wap.discard(store, "suspect")
    assert(deleted == paths.size)
    assert(paths.forall(p => !Files.exists(Paths.get(p))))
    assert(Wap.list(store).isEmpty)
    // force bypasses the audit gate on a fresh stage
    Wap.stage(spark, store, batch(50, 52), "forced")
    Wap.publish(store, "forced", force = true)
    assert(ids(store.scanCurrent(spark)).contains(ClipSynth.clipId(51)))
  }

  test("RemoveOrphans never collects a staged batch") {
    val store = freshStore("gc"); seed(store)
    val rec = Wap.stage(spark, store, batch(40, 45), "pending")
    val res = RemoveOrphans.run(store, minAgeMs = 0L) // no age floor at all
    assert(res.orphansDeleted == 0)
    assert(rec.entries.forall(e => Files.exists(Paths.get(e.path))))
    // after discard the files are already gone; GC stays a no-op
    Wap.discard(store, "pending")
    assert(RemoveOrphans.run(store, minAgeMs = 0L).orphansDeleted == 0)
  }

  test("publish retry after simulated crash does not double-commit") {
    val store = freshStore("idem2"); seed(store)
    val rec = Wap.stage(spark, store, batch(40, 45), "crashy2")
    Wap.audit(spark, store, "crashy2")
    val recAudited = Wap.get(store, "crashy2")
    val id = Wap.publish(store, "crashy2")
    // resurrect the record as if the process died before deleting it
    val p = Paths.get(store.tableDir, "meta", "staged", "crashy2.json")
    Files.write(p, graft.table.Json.mapper.writeValueAsString(recAudited)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val id2 = Wap.publish(store, "crashy2")
    assert(id2 == id, "retried publish must return the original snapshot, not re-commit")
    assert(store.currentSnapshotId.get == id, "no new snapshot was minted")
    assert(ids(store.scanCurrent(spark))
      .count(k => (40L until 45L).map(ClipSynth.clipId).contains(k)) == 5)
    assert(Wap.list(store).isEmpty)
  }

  test("crash-interrupted publish is acknowledgeable after a schema evolution") {
    val store = freshStore("evo2"); seed(store)
    val rec0 = Wap.stage(spark, store, batch(50, 55), "preEvo")
    Wap.audit(spark, store, "preEvo")
    val recAudited = Wap.get(store, "preEvo")
    val id = Wap.publish(store, "preEvo")
    // crash window: record resurrected, then the table evolves
    val p = Paths.get(store.tableDir, "meta", "staged", "preEvo.json")
    Files.write(p, graft.table.Json.mapper.writeValueAsString(recAudited)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Evolve.addColumn(spark, store, "lang", "string", "'und'")
    // the retried publish must acknowledge the EXISTING snapshot — the era
    // guard ('discard and re-stage') only applies to batches not yet committed
    assert(Wap.publish(store, "preEvo") == id)
    assert(Wap.list(store).isEmpty)
    assert(rec0.stagedAtSnapshot == 1L, "probe bound recorded at stage time")
  }

  test("discard after a crash-interrupted publish keeps the committed files") {
    val store = freshStore("disc2"); seed(store)
    Wap.stage(spark, store, batch(60, 64), "keepers")
    Wap.audit(spark, store, "keepers")
    val recAudited = Wap.get(store, "keepers")
    Wap.publish(store, "keepers")
    val before = ids(store.scanCurrent(spark))
    val p = Paths.get(store.tableDir, "meta", "staged", "keepers.json")
    Files.write(p, graft.table.Json.mapper.writeValueAsString(recAudited)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // an operator 'cleaning up' the stale record must NOT delete live data
    assert(Wap.discard(store, "keepers") == 0, "no data file may be deleted")
    assert(Wap.list(store).isEmpty, "stale record dropped")
    assert(ids(store.scanCurrent(spark)) == before, "table intact after discard")
  }

  test("Changes.appendedRows accepts a range crossing a WAP publish") {
    val store = freshStore("rows"); seed(store)
    val from = store.currentSnapshotId.get
    Wap.stage(spark, store, batch(70, 75), "feedable")
    Wap.audit(spark, store, "feedable")
    Wap.publish(store, "feedable")
    Append.run(spark, store, batch(75, 78))
    val got = ids(Changes.appendedRows(spark, store, from, store.currentSnapshotId.get))
    assert(got == (70L until 78L).map(ClipSynth.clipId).toSet)
  }

  test("a published batch reaches ChangeFeed consumers like any append") {
    val store = freshStore("feed"); seed(store)
    val cursor = store.currentSnapshotId.get
    Wap.stage(spark, store, batch(40, 48), "release")
    assert(graft.streaming.ChangeFeed.poll(spark, store, cursor).isEmpty,
      "staged rows must not reach the feed before publish")
    Wap.audit(spark, store, "release")
    Wap.publish(store, "release")
    val poll = graft.streaming.ChangeFeed.poll(spark, store, cursor)
    assert(ids(poll.df) == (40L until 48L).map(ClipSynth.clipId).toSet,
      "the published batch is the feed delta")
  }

  test("publish survives interleaved appends; refuses across schema evolution") {
    val store = freshStore("race"); seed(store)
    Wap.stage(spark, store, batch(40, 44), "w1")
    Wap.audit(spark, store, "w1")
    Append.run(spark, store, batch(100, 105)) // someone else commits first
    val id = Wap.publish(store, "w1")
    assert(store.currentSnapshotId.get == id)
    assert(ids(store.scanCurrent(spark)).contains(ClipSynth.clipId(42)))
    assert(ids(store.scanCurrent(spark)).contains(ClipSynth.clipId(101)))

    Wap.stage(spark, store, batch(50, 53), "w2")
    Wap.audit(spark, store, "w2")
    Evolve.addColumn(spark, store, "lang", "string", "'und'")
    val e = intercept[IllegalArgumentException](Wap.publish(store, "w2"))
    assert(e.getMessage.contains("schema era"))
    Wap.discard(store, "w2")
  }
}
