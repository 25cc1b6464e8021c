package graft

import java.nio.file.Files

import graft.ops.{Append, Cluster, Compact, ZOrderCurve}
import graft.synth.ClipSynth
import graft.table.{MetaStore, PartitionSpec, Partitioning, Pred}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hidden partitioning (table/Partitioning.scala): spec-declared derived
 * partition fields, one-tuple-per-file layout, manifest tuples, exact
 * partition elimination ahead of zonemaps, and tuple preservation through
 * compaction and cluster rewrites. The load-bearing safety property is
 * bucket-prune agreement: the DRIVER-side xxhash64 of a probe value must
 * equal the EXECUTOR-side xxhash64 of the column, or a point lookup would
 * silently drop its matching file.
 */
class PartitioningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def newStore(): MetaStore =
    MetaStore.forClips(Files.createTempDirectory("graft-partspec").toString)

  private val clipSpec = PartitionSpec(Seq(
    Partitioning.identity("codec"),
    Partitioning.bucket("clip_id", 8),
    Partitioning.truncate("dur_ms", 100, sourceType = "int")))

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("clip_id", "codec", "dur_ms").collect()
      .map(_.mkString("|")).sorted.toSeq

  test("partitioned append: one tuple per file, tuple in the manifest") {
    val store = newStore()
    store.setPartitionSpec(clipSpec)
    Append.run(spark, store, ClipSynth.dataset(spark, 300, 6, maxDurMs = 250).toDF())
    val es = store.entries(store.currentSnapshotId.get)
    assert(es.nonEmpty)
    assert(es.forall(_.partition.keySet ==
      Set("codec", "clip_id_bucket", "dur_ms_trunc")))
    // every file is single-valued on the identity source
    val df = store.scanCurrent(spark)
    assert(!df.columns.exists(_.startsWith(Partitioning.ColPrefix)),
      "derived partition columns must stay hidden from readers")
    es.foreach { e =>
      val codecs = spark.read.parquet(e.path).select("codec").distinct().collect()
      assert(codecs.length == 1 && codecs.head.getString(0) == e.partition("codec"))
    }
  }

  test("partition pruning: identity + truncate eliminate files, results exact") {
    val store = newStore()
    store.setPartitionSpec(clipSpec)
    Append.run(spark, store, ClipSynth.dataset(spark, 600, 6, maxDurMs = 400).toDF())
    val preds = Seq(Pred.EqualTo("codec", "ulaw"), Pred.Between("dur_ms", 120L, 180L))
    val ps = store.scanCurrentPruned(spark, preds)
    assert(ps.filesKept < ps.filesTotal, s"expected skips, kept ${ps.filesKept}/${ps.filesTotal}")
    val expected = sortedRows(store.scanCurrent(spark).filter(Pred.and(preds)))
    assert(sortedRows(ps.df) == expected)
    // the tuple alone (before zonemaps) must already exclude non-ulaw and
    // out-of-range truncation windows
    val es = store.entries(store.currentSnapshotId.get)
    val tupleKept = es.filter(f => preds.forall(clipSpec.mayMatch(f, _)))
    assert(tupleKept.forall(f => f.partition("codec") == "ulaw"))
    assert(tupleKept.forall { f =>
      val t = f.partition("dur_ms_trunc").toLong
      t <= 180 && t + 99 >= 120
    })
  }

  test("bucket prune never drops a matching row (driver/executor hash parity)") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.bucket("clip_id", 16))))
    Append.run(spark, store, ClipSynth.dataset(spark, 500, 8, maxDurMs = 120).toDF())
    val total = store.entries(store.currentSnapshotId.get).size
    var skippedSomewhere = false
    (0L until 500L by 23L).foreach { i =>
      val id = ClipSynth.clipId(i)
      val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("clip_id", id)))
      if (ps.filesKept < total) skippedSomewhere = true
      val got = ps.df.select("clip_id").collect().map(_.getString(0)).toSeq
      assert(got == Seq(id), s"point lookup for $id returned $got")
    }
    assert(skippedSomewhere, "bucket tuples never pruned anything")
    // absent key: still exact (empty), and in-set probes keep union semantics
    val miss = store.scanCurrentPruned(spark,
      Seq(Pred.EqualTo("clip_id", "clip_999999999999")))
    assert(miss.df.isEmpty)
    val inSet = store.scanCurrentPruned(spark, Seq(Pred.InSet("clip_id",
      Seq(ClipSynth.clipId(3), ClipSynth.clipId(499)))))
    assert(inSet.df.count() == 2)
  }

  test("compaction is tuple-pure and preserves pruning") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    // several small appends -> many small files per codec
    // tens digit of the 12-digit id varies over 0..149 — each append drops a
    // different ~tenth, none empties
    (0 until 4).foreach { k =>
      Append.run(spark, store, ClipSynth.dataset(spark, 150, 3, maxDurMs = 150)
        .toDF().filter(col("clip_id").substr(16, 1) =!= lit(k.toString)))
    }
    val before = store.entries(store.currentSnapshotId.get)
    val expected = sortedRows(store.scanCurrent(spark).filter(col("codec") === "ulaw"))
    val res = Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "part-compact")
    assert(res.filesAfter < res.filesBefore)
    val after = store.entries(store.currentSnapshotId.get)
    // merged outputs carry the tuple and stay single-codec
    assert(after.forall(_.partition.contains("codec")))
    after.foreach { e =>
      val codecs = spark.read.parquet(e.path).select("codec").distinct().collect()
      assert(codecs.length == 1 && codecs.head.getString(0) == e.partition("codec"))
    }
    val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("codec", "ulaw")))
    assert(ps.filesKept < ps.filesTotal)
    assert(sortedRows(ps.df) == expected)
  }

  test("scoped compaction touches only the scope's files") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    (0 until 3).foreach { _ =>
      Append.run(spark, store, ClipSynth.dataset(spark, 120, 2, maxDurMs = 120).toDF())
    }
    val before = store.entries(store.currentSnapshotId.get)
    val expected = sortedRows(store.scanCurrent(spark))
    val res = Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "scoped-compact",
      scope = Seq(Pred.EqualTo("codec", "ulaw")))
    val after = store.entries(store.currentSnapshotId.get)
    // non-ulaw files are carried byte-identically; ulaw files merged
    val beforeOther = before.filter(_.partition.get("codec") != Some("ulaw")).map(_.path).toSet
    val afterOther = after.filter(_.partition.get("codec") != Some("ulaw")).map(_.path).toSet
    assert(beforeOther == afterOther, "out-of-scope files must be untouched")
    assert(after.count(_.partition.get("codec") == Some("ulaw")) <
      before.count(_.partition.get("codec") == Some("ulaw")))
    assert(res.filesAfter < res.filesBefore)
    assert(sortedRows(store.scanCurrent(spark)) == expected)
  }

  test("single-job compaction keeps tuples too") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    (0 until 3).foreach { _ =>
      Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 120).toDF())
    }
    val expected = sortedRows(store.scanCurrent(spark))
    Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "part-compact-sj", singleJob = true)
    val after = store.entries(store.currentSnapshotId.get)
    assert(after.forall(_.partition.contains("codec")))
    assert(sortedRows(store.scanCurrent(spark)) == expected)
    val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("codec", "pcm8")))
    assert(ps.filesKept < ps.filesTotal)
  }

  test("cluster rewrite preserves tuples (fanout writer)") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    Append.run(spark, store, ClipSynth.dataset(spark, 400, 8, maxDurMs = 200).toDF())
    val expected = sortedRows(store.scanCurrent(spark))
    Cluster.run(spark, store, ZOrderCurve, targetBytes = 256L * 1024,
      runId = "part-cluster", hashCols = Seq.empty,
      rangeCols = Seq("sr_hz", "dur_ms"))
    val after = store.entries(store.currentSnapshotId.get)
    assert(after.forall(_.partition.contains("codec")))
    assert(sortedRows(store.scanCurrent(spark)) == expected)
    // both tiers now bite: tuple on codec, zonemap on the clustered dims
    val ps = store.scanCurrentPruned(spark,
      Seq(Pred.EqualTo("codec", "ulaw"), Pred.Between("dur_ms", 100L, 140L)))
    assert(ps.filesKept < ps.filesTotal)
    assert(sortedRows(ps.df) == sortedRows(store.scanCurrent(spark)
      .filter(col("codec") === "ulaw" && col("dur_ms").between(100, 140))))
  }

  test("spec evolution: new fields apply forward, redefinition rejected") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 100).toDF())
    val preSpecFiles = store.entries(store.currentSnapshotId.get).map(_.path).toSet
    // additive evolution OK; pre-evolution files lack the new tuple entry
    store.setPartitionSpec(PartitionSpec(Seq(
      Partitioning.identity("codec"), Partitioning.bucket("clip_id", 4))))
    Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 100)
      .toDF().withColumn("clip_id", concat(lit("b_"), col("clip_id"))))
    val es = store.entries(store.currentSnapshotId.get)
    assert(es.filter(e => preSpecFiles.contains(e.path))
      .forall(!_.partition.contains("clip_id_bucket")))
    assert(es.filterNot(e => preSpecFiles.contains(e.path))
      .forall(_.partition.contains("clip_id_bucket")))
    // old files are conservatively kept on the new field's probes
    val ps = store.scanCurrentPruned(spark,
      Seq(Pred.EqualTo("clip_id", "b_" + ClipSynth.clipId(7))))
    assert(ps.df.count() == 1)
    // a redefinition of an existing name must throw
    intercept[IllegalArgumentException] {
      store.setPartitionSpec(PartitionSpec(Seq(Partitioning.bucket("codec", 2)
        .copy(name = "codec"))))
    }
  }

  test("empty partitioned append commits zero entries (no files, no crash)") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    val snap = Append.run(spark, store,
      ClipSynth.dataset(spark, 10, 1).toDF().filter(lit(false)))
    assert(store.entries(snap).isEmpty)
    Append.run(spark, store, ClipSynth.dataset(spark, 50, 1, maxDurMs = 100).toDF())
    assert(store.scanCurrent(spark).count() == 50)
  }

  test("metadata tables: files/snapshots as queryable DataFrames") {
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    Append.run(spark, store, ClipSynth.dataset(spark, 200, 4, maxDurMs = 120).toDF())
    Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 120)
      .toDF().withColumn("clip_id", concat(lit("m_"), col("clip_id"))))
    val files = store.filesTableCurrent(spark)
    // rows-per-tuple from the metadata table == rows-per-codec from the data
    val byTuple = files.selectExpr("partition['codec'] AS codec", "rows")
      .groupBy("codec").agg(sum("rows").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byData = store.scanCurrent(spark).groupBy("codec").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTuple == byData)
    // per-column stats are queryable structs
    val minDur = files.selectExpr("CAST(stats['dur_ms'].min AS INT) AS mn")
      .agg(min("mn")).collect().head.getInt(0)
    assert(minDur == store.scanCurrent(spark).agg(min("dur_ms"))
      .collect().head.getInt(0))
    // snapshots table carries the operation log
    val snaps = store.snapshotsTable(spark)
    assert(snaps.count() == 2)
    assert(snaps.filter(col("operation") === "append").count() == 2)
    assert(snaps.selectExpr("CAST(summary['rows'] AS LONG)").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(200L, 300L))
    // partitions table: per-tuple rollup equals the data's group-by
    val parts = store.partitionsTableCurrent(spark)
      .selectExpr("partition['codec'] AS codec", "n_rows", "n_files")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(parts.view.mapValues(_._1).toMap == byData)
    assert(parts.values.map(_._2).sum ==
      store.entries(store.currentSnapshotId.get).size)
  }

  test("partition values with '+', space, and '%' round-trip exactly") {
    // Spark's partitionBy leaves '+' literal; a URL-decoding parser would
    // record "a+b" as "a b" — pruned scans then skip the file and a
    // partition-drop delete on "a b" would remove the WRONG rows
    val store = newStore()
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    val tricky = Seq("a+b", "a b", "a%2Bb")
    Append.run(spark, store, ClipSynth.dataset(spark, 60, 2, maxDurMs = 40)
      .toDF().withColumn("codec",
        element_at(typedLit(tricky), ((xxhash64(col("clip_id")) % 3 + 3) % 3 + 1).cast("int"))))
    val tuples = store.entries(store.currentSnapshotId.get)
      .flatMap(_.partition.get("codec")).toSet
    assert(tuples == tricky.toSet, s"manifest tuples must be exact: $tuples")
    tricky.foreach { v =>
      val want = sortedRows(store.scanCurrent(spark).filter(col("codec") === v))
      assert(want.nonEmpty, s"fixture must cover $v")
      val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("codec", v)))
      assert(sortedRows(ps.df) == want, s"pruned scan wrong for '$v'")
      assert(ps.filesKeptPartition < ps.filesTotal, s"tuple tier must prune for '$v'")
    }
    // partition-drop delete removes EXACTLY the "a b" rows, not "a+b"'s
    val keepPlus = store.scanCurrent(spark).filter(col("codec") === "a+b").count()
    graft.ops.Deletes.deleteWhere(spark, store,
      Seq(Pred.EqualTo("codec", "a b")))
    assert(store.scanCurrent(spark).filter(col("codec") === "a b").count() == 0)
    assert(store.scanCurrent(spark).filter(col("codec") === "a+b").count() == keepPlus,
      "'a+b' rows must survive a delete of 'a b'")
  }

  test("pre-spec history: empty tuples are always kept") {
    val store = newStore()
    Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 100).toDF())
    store.setPartitionSpec(PartitionSpec(Seq(Partitioning.identity("codec"))))
    Append.run(spark, store, ClipSynth.dataset(spark, 100, 2, maxDurMs = 100)
      .toDF().withColumn("clip_id", concat(lit("n_"), col("clip_id"))))
    val expected = sortedRows(store.scanCurrent(spark).filter(col("codec") === "ulaw"))
    val ps = store.scanCurrentPruned(spark, Seq(Pred.EqualTo("codec", "ulaw")))
    assert(sortedRows(ps.df) == expected)
    // pruning still bites on the NEW files only
    val es = store.entries(store.currentSnapshotId.get)
    val preSpec = es.count(_.partition.isEmpty)
    assert(preSpec > 0 && ps.filesKept < ps.filesTotal)
  }
}
