package graft.cli

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import graft.verify.ScanEquality
import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry point for the maintenance loop (north_rule: "run via
 * spark-submit on a multi-executor cluster"). In cluster mode the master and
 * resource flags come from spark-submit; this main only declares the job.
 *
 * Usage:
 *   spark-submit --class graft.cli.Maintain columnarspark.jar <tableDir> <op> [args]
 *   ops:
 *     synth <nClips> <files>        append a deterministic synthetic batch
 *     compact [targetMB]            bin-pack small files
 *     cluster [zorder|hilbert] [targetMB] [batches]
 *     merge-synth <lo> <hi>         upsert resynthesized clips lo..hi
 *     expire [keepLast]             snapshot expiry + GC
 *     verify <preSnap> <postSnap>   scan-equality gate
 *     lineage                       dump the metrics side-table
 */
object Maintain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Maintain <tableDir> <op> [args]")
    val tableDir = args(0)
    val op = args(1)
    val rest = args.drop(2)

    val spark = SparkSession.builder()
      .appName(s"graft-maintain-$op")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val store = MetaStore.forClips(tableDir)

    op match {
      case "synth" =>
        val n = rest(0).toLong
        val files = rest(1).toInt
        val id = Append.run(spark, store, ClipSynth.dataset(spark, n, files).toDF())
        println(s"committed snapshot $id: $n clips in $files files")
      case "compact" =>
        val mb = rest.headOption.map(_.toLong).getOrElse(128L)
        val r = Compact.run(spark, store, targetBytes = mb * 1024 * 1024)
        println(s"snapshot ${r.snapshotId}: ${r.filesBefore} -> ${r.filesAfter} files" +
          s" (${r.binsRewritten} bins, ${r.binsSkippedByCheckpoint} resumed)")
      case "cluster" =>
        val curve = if (rest.headOption.contains("hilbert")) HilbertCurve else ZOrderCurve
        val mb = rest.lift(1).map(_.toLong).getOrElse(128L)
        val batches = rest.lift(2).map(_.toInt).getOrElse(1)
        val r = Cluster.run(spark, store, curve, targetBytes = mb * 1024 * 1024,
          batches = batches)
        println(s"snapshot ${r.snapshotId}: clustered ${r.rows} rows into ${r.filesAfter} files ($curve)")
      case "merge-synth" =>
        val lo = rest(0).toLong
        val hi = rest(1).toLong
        val updates = spark.range(lo, hi).map(i => ClipSynth.clip(i)).toDF()
        val r = MergeInto.run(spark, store, updates)
        println(s"snapshot ${r.snapshotId}: touched=${r.filesTouched} untouched=${r.filesUntouched}")
      case "expire" =>
        val keep = rest.headOption.map(_.toInt).getOrElse(2)
        val r = ExpireSnapshots.run(store, keepLast = keep)
        println(s"expired ${r.expiredSnapshots.size} snapshots, " +
          s"deleted ${r.dataFilesDeleted} data files, ${r.manifestsDeleted} manifests")
      case "verify" =>
        val rep = ScanEquality.report(ScanEquality.compareSnapshots(
          spark, store, rest(0).toLong, rest(1).toLong))
        println(s"verify: rows=${rep.rows} passed=${rep.passed} failed=${rep.failed} " +
          s"minSnrDb=${rep.minSnrDb} passRate=${rep.passRate}")
        if (!rep.allPass) sys.exit(2)
      case "lineage" =>
        store.lineage(spark).orderBy("tsMs").show(100, truncate = false)
      case other => sys.error(s"unknown op: $other")
    }
    spark.stop()
  }
}
