package graft

import java.nio.file.Files

import graft.functions.VecExprs
import graft.ops.{Append, Compact, VecIndex}
import graft.table.MetaStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The persisted ANN index must SURVIVE a maintenance pass: compaction
 * rewrites the table's files, but rows are unchanged, so the write-time
 * bucket/centroid side-tables stay valid and the probe answers from the
 * index must equal a fresh brute-force computed over the post-maintenance
 * scan.
 */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic embeddings: 200 vecs x 8 dims, 4 labels. */
  private def synthEmbeddings = {
    (0 until 200).map { i =>
      val v = (0 until 8).map(j =>
        (((i * 31 + j * 17) % 97) - 48).toFloat / 48.0f).toArray
      (i.toLong, s"label_${i % 4}", v)
    }.toDF("vec_id", "label", "embedding")
  }

  test("bucket/centroid index survives compaction (rows unchanged)") {
    val tableDir = Files.createTempDirectory("graft-ann-table-").toString
    val indexDir = Files.createTempDirectory("graft-ann-index-").toString
    val store = new MetaStore(tableDir, Seq("vec_id", "label"))

    // append as many SMALL files so compaction has work to do
    Append.run(spark, store, synthEmbeddings.repartition(16))
    val preScan = store.scanCurrent(spark)
    VecIndex.build(spark, preScan, indexDir, sourceFingerprint = "spec")

    val c = Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "ann-spec-compact")
    assert(c.binsRewritten > 0, "compaction must actually rewrite files")
    val postScan = store.scanCurrent(spark)
    assert(postScan.count() === 200)

    // 1. stored buckets still match a fresh recompute over the REWRITTEN table
    val stored = VecIndex.buckets(spark, indexDir)
      .select(col("vec_id"), col("bkt"))
    val fresh = postScan
      .select(col("vec_id"), expr(VecExprs.bucketSpark).as("bkt_fresh"))
    val stale = stored.join(fresh, "vec_id")
      .filter(col("bkt") =!= col("bkt_fresh")).count()
    assert(stale === 0L, "persisted buckets diverged after maintenance")

    // 2. index-probed top-5 for a query vector == brute-force top-5 on the
    //    post-maintenance scan, restricted to the query's bucket
    val qid = 7L
    val qbkt = stored.filter(col("vec_id") === qid).select("bkt").as[Int].head()
    val q = postScan.filter(col("vec_id") === qid)
      .select(col("embedding").as("q"))
    def topk(cands: org.apache.spark.sql.DataFrame) = cands
      .filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr(VecExprs.dotExpr) /
          (expr(VecExprs.normExpr) * expr(VecExprs.qnormExpr)), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val viaIndex = topk(postScan.join(
      stored.filter(col("bkt") === qbkt).select("vec_id"), "vec_id"))
    val bruteInBucket = topk(postScan.join(
      postScan.select(col("vec_id"),
        expr(VecExprs.bucketSpark).as("b2")).filter(col("b2") === qbkt)
        .select("vec_id"), "vec_id"))
    assert(viaIndex === bruteInBucket)
    assert(viaIndex.nonEmpty)

    // 3. centroids from the index equal centroids recomputed post-maintenance
    val storedCent = VecIndex.centroids(spark, indexDir)
    val freshCent = postScan
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg(col("x").cast("double")).as("mean_fresh"))
    val centDiff = storedCent.join(freshCent, Seq("label", "pos"))
      .filter(abs(col("mean_x") - col("mean_fresh")) > 1e-9).count()
    assert(centDiff === 0L)
  }

  test("store-keyed index lives inside meta/, invalidates on commit, prunes old") {
    val tableDir = Files.createTempDirectory("graft-ann-store-").toString
    val store = new MetaStore(tableDir, Seq("vec_id", "label"))
    Append.run(spark, store, synthEmbeddings.repartition(4))

    val d1 = VecIndex.ensureForStore(spark, store)
    assert(d1.startsWith(tableDir),
      s"index must live inside the table dir, got $d1")
    assert(VecIndex.buckets(spark, d1).count() === 200)
    // unchanged snapshot: same dir, no rebuild
    val marker = java.nio.file.Paths.get(d1, "_COMPLETE")
    val m1 = Files.getLastModifiedTime(marker)
    assert(VecIndex.ensureForStore(spark, store) === d1)
    assert(Files.getLastModifiedTime(marker) == m1, "no rebuild without a commit")

    // any commit invalidates: the new snapshot's index sees the new rows and
    // the superseded snapshot's index is pruned
    Append.run(spark, store, (200 until 250).map { i =>
      (i.toLong, s"label_${i % 4}",
        (0 until 8).map(j => (i + j).toFloat / 100f).toArray)
    }.toDF("vec_id", "label", "embedding"))
    val d2 = VecIndex.ensureForStore(spark, store)
    assert(d2 !== d1)
    assert(d2.startsWith(tableDir))
    assert(VecIndex.buckets(spark, d2).count() === 250)
    assert(!Files.exists(java.nio.file.Paths.get(d1)),
      "superseded snapshot index must be pruned")
  }

  test("append-only commits maintain the index incrementally; rewrites rebuild") {
    val tableDir = Files.createTempDirectory("graft-ann-inc-").toString
    val store = new MetaStore(tableDir, Seq("vec_id", "label"))
    Append.run(spark, store, synthEmbeddings.repartition(4))
    val d1 = VecIndex.ensureForStore(spark, store)

    def eras(d: String): Set[String] = {
      val s = Files.list(java.nio.file.Paths.get(d, "eras"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSet
      } finally s.close()
    }
    assert(eras(d1) == Set("full"))

    // append -> the new snapshot's index reuses the parent era (hard links,
    // zero data movement) and indexes ONLY the appended rows as a new era
    Append.run(spark, store, (200 until 260).map { i =>
      (i.toLong, s"label_${i % 4}",
        (0 until 8).map(j => (i + j).toFloat / 100f).toArray)
    }.toDF("vec_id", "label", "embedding"))
    val snap2 = store.currentSnapshotId.get
    val d2 = VecIndex.ensureForStore(spark, store)
    assert(eras(d2) == Set("full", s"inc-$snap2"),
      "append must add an era, not rebuild")
    assert(VecIndex.buckets(spark, d2).count() === 260)
    assert(!Files.exists(java.nio.file.Paths.get(d1)), "old snapshot dir pruned")

    // IVF centroids from the era partials are EXACT vs a fresh recompute
    val fresh = store.scanCurrent(spark)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg(col("x").cast("double")).as("mean_fresh"))
    val drift = VecIndex.centroids(spark, d2).join(fresh, Seq("label", "pos"))
      .filter(abs(col("mean_x") - col("mean_fresh")) > 1e-9).count()
    assert(drift === 0L, "incremental centroid partials must aggregate exactly")

    // a rewrite (rows may change) must rebuild from scratch
    Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "ann-inc-compact")
    val d3 = VecIndex.ensureForStore(spark, store)
    assert(eras(d3) == Set("full"), "rewrite commits rebuild, never link eras")
    assert(VecIndex.buckets(spark, d3).count() === 260)
  }

  test("ensure() rebuilds when the source parquet changes") {
    val src = Files.createTempDirectory("graft-ann-src-").toString
    synthEmbeddings.repartition(2).write.mode("overwrite").parquet(src)
    val d1 = VecIndex.ensure(spark, src)
    val n1 = VecIndex.buckets(spark, d1).count()
    assert(n1 === 200)
    // append more rows -> fingerprint changes -> rebuild picks them up
    (200 until 250).map { i =>
      (i.toLong, s"label_${i % 4}",
        (0 until 8).map(j => (i + j).toFloat / 100f).toArray)
    }.toDF("vec_id", "label", "embedding")
      .write.mode("append").parquet(src)
    val d2 = VecIndex.ensure(spark, src)
    assert(d2 === d1)
    assert(VecIndex.buckets(spark, d2).count() === 250)
  }

  test("raw-source index never lives under java.io.tmpdir") {
    // tmp cleaners wiped era files out from under a valid _COMPLETE marker
    // in r3; the index root must be a durable, shared-mountable location
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      .toAbsolutePath.normalize
    val idx = java.nio.file.Paths.get(VecIndex.dirFor("/some/embeddings.parquet"))
      .toAbsolutePath.normalize
    assert(!idx.startsWith(tmp),
      s"raw-source vec index $idx must not live under java.io.tmpdir $tmp")
  }

  test("ensure() self-heals when era files vanish but _COMPLETE survives") {
    val src = Files.createTempDirectory("graft-ann-src2-").toString
    synthEmbeddings.repartition(2).write.mode("overwrite").parquet(src)
    val d1 = VecIndex.ensure(spark, src)
    assert(VecIndex.buckets(spark, d1).count() === 200)
    // simulate a cleaner: delete every bucket parquet, keep the marker
    val w = Files.walk(java.nio.file.Paths.get(d1, "eras"))
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.toSeq
        .filter(p => p.toString.endsWith(".parquet"))
        .foreach(Files.delete(_))
    } finally w.close()
    assert(Files.exists(java.nio.file.Paths.get(d1, "_COMPLETE")))
    val d2 = VecIndex.ensure(spark, src) // must rebuild, not serve the husk
    assert(d2 === d1)
    assert(VecIndex.buckets(spark, d2).count() === 200)
  }

  test("dedup plane ladder: +1 plane per row-doubling past 4k, capped, " +
    "and the SQL ladder agrees with the Scala one") {
    // anchor: sf0.1's doubled corpus (4000 rows) keeps the historical 10
    assert(VecExprs.dedupPlanes(4000L) === 10)
    assert(VecExprs.dedupPlanes(4001L) === 11)
    assert(VecExprs.dedupPlanes(40000L) === 14) // the sf1 audit regime
    assert(VecExprs.dedupPlanes(Long.MaxValue) === 16) // ladder cap
    // the Spark-SQL rendering of the same ladder must agree value-for-value
    // (the DuckDB oracle uses the identical CASE text modulo dialect)
    for (n <- Seq(1L, 4000L, 4001L, 8000L, 8001L, 40000L, 1000000L)) {
      val sql = VecExprs.dedupPlanesSql(n.toString)
      val fromSql = spark.sql(s"SELECT $sql AS p").head().getInt(0)
      assert(fromSql === VecExprs.dedupPlanes(n), s"n=$n")
    }
    // a dynamic-plane bucket never exceeds 2^planes
    val df = synthEmbeddings
      .selectExpr(s"${VecExprs.bucketSparkN(VecExprs.dedupPlanes(4001L))} AS b")
    assert(df.agg(max($"b")).head().getInt(0) < (1 << 11))
  }

  test("ANN plane ladder pins at build, persists beside the eras, and " +
    "incremental eras inherit the parent's planes") {
    assert(VecExprs.annPlanes(200L) === 6)  // every current test scale
    assert(VecExprs.annPlanes(20000L) === 9) // the sf1 audit regime
    assert(VecExprs.annPlanes(Long.MaxValue) === 16)
    for (n <- Seq(1L, 4000L, 4001L, 20000L, 3000000L)) {
      val fromSql = spark.sql(
        s"SELECT ${VecExprs.annPlanesSql(n.toString)} AS p").head().getInt(0)
      assert(fromSql === VecExprs.annPlanes(n), s"n=$n")
    }
    // store-backed index: full build on half the rows pins planes; the
    // incremental era for the other half must reuse them (planes.csv equal)
    val dir = Files.createTempDirectory("graft-ann-planes-").toString
    val store = new MetaStore(dir, Seq("vec_id", "label"))
    val all = synthEmbeddings
    Append.run(spark, store, all.filter($"vec_id" % 2 === 0))
    val d1 = VecIndex.ensureForStore(spark, store)
    val p1 = VecIndex.planesOf(d1)
    assert(p1 === VecExprs.annPlanes(100L))
    Append.run(spark, store, all.filter($"vec_id" % 2 === 1))
    val d2 = VecIndex.ensureForStore(spark, store)
    assert(VecIndex.planesOf(d2) === p1, "incremental era re-tuned planes")
    assert(VecIndex.buckets(spark, d2).count() === 200)
    // a dir with no planes.csv reads as the legacy 6-plane layout
    val legacy = Files.createTempDirectory("graft-ann-legacy-").toString
    assert(VecIndex.planesOf(legacy) === 6)
  }
}
