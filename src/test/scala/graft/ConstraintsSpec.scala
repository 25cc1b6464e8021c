package graft

import java.nio.file.Files

import graft.ops.{Append, Constraint, Constraints, ConstraintViolationException}
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-time quality gates: clean batches pass, each violation class is
 * counted exactly, and a rejected append commits nothing. */
class ConstraintsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("single-pass check counts each violation class; append aborts atomically") {
    val good = ClipSynth.dataset(spark, 40, 2, maxDurMs = 120).toDF()
    assert(Constraints.check(good, Constraint.clipDefaults).isEmpty)

    // corrupt: 2 null ids, 3 duplicated ids, 1 bad rate, 1 bad codec
    val nulls = good.limit(2).withColumn("clip_id", lit(null).cast("string"))
    val dups = good.limit(3)
    val badRate = good.limit(1).withColumn("sr_hz", lit(96000))
    val badCodec = good.limit(1).withColumn("codec", lit("mp3"))
    val bad = good.unionByName(nulls).unionByName(dups)
      .unionByName(badRate).unionByName(badCodec)

    val report = Constraints.check(bad, Constraint.clipDefaults)
      .map(v => v.constraint -> v.rows).toMap
    assert(report("not_null(clip_id)") == 2)
    // 3 re-appended ids + the badRate/badCodec rows reuse ids too
    assert(report("unique(clip_id)") == 5)
    assert(report("in_range(sr_hz,8000,48000)") == 1)
    assert(report("one_of(codec)") == 1)

    val dir = Files.createTempDirectory("graft-constraints-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, good, constraints = Constraint.clipDefaults)
    val before = store.currentSnapshotId.get
    val ex = intercept[ConstraintViolationException] {
      Append.run(spark, store, bad, constraints = Constraint.clipDefaults)
    }
    assert(ex.violations.nonEmpty)
    assert(store.currentSnapshotId.get == before, "rejected append commits nothing")
    assert(store.scanCurrent(spark).count() == 40)
  }
}
