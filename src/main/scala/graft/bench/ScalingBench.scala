package graft.bench

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import graft.verify.ScanEquality
import org.apache.spark.sql.SparkSession

/**
 * Two-parallelism maintenance throughput bench (BASELINE.md section 3 protocol):
 * the SAME deterministic clip table is built and maintained at local[N] and
 * local[4N]; clips/sec over the timed phases (compact + Z-order cluster) at
 * both levels gives scaling efficiency = (thr_4N / thr_N) / 4, with the
 * north_rule pass bar at 0.8. Scan-equality verification gates every run.
 *
 * Usage: runMain graft.bench.ScalingBench [nClips] [reps] [coresN]
 */
object ScalingBench {

  final case class RunResult(
      cores: Int,
      synthSec: Double,
      compactSec: Double,
      clusterSec: Double,
      verifySec: Double,
      clipsPerSec: Double,
      filesBefore: Int,
      filesAfterCompact: Int,
      filesAfterCluster: Int,
      verifyPassRate: Double)

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def runOnce(spark: SparkSession, cores: Int, nClips: Long): RunResult = {
    val dir = Files.createTempDirectory(s"graft-bench-$cores-").toString
    val store = MetaStore.forClips(dir)
    // synth: many small files (16 rows/task groups into cores*8 files)
    val (_, synthSec) = timed {
      Append.run(spark, store,
        ClipSynth.dataset(spark, nClips, cores * 8, maxDurMs = 150).toDF())
    }
    val s0 = store.currentSnapshotId.get
    val filesBefore = store.entries(s0).size

    // bin size chosen so the bin count comfortably exceeds 4N cores — at
    // this sandbox scale a 96 MB target would yield ~8 single-task bins and
    // cap compaction parallelism at 8 regardless of cores, poisoning the
    // scaling measurement (at production scale bins >> cores always holds)
    val (cRes, compactSec) = timed {
      Compact.run(spark, store, targetBytes = 32L * 1024 * 1024,
        runId = s"bench-compact-$cores", maxConcurrentBins = cores)
    }
    val (zRes, clusterSec) = timed {
      Cluster.run(spark, store, ZOrderCurve, targetBytes = 32L * 1024 * 1024,
        runId = s"bench-cluster-$cores")
    }
    val (rep, verifySec) = timed {
      ScanEquality.report(
        ScanEquality.compareSnapshots(spark, store, s0, zRes.snapshotId,
          checkSynth = false))
    }
    require(rep.allPass, s"verification failed at cores=$cores: $rep")
    val maintSec = compactSec + clusterSec
    // cleanup to keep /tmp bounded
    ExpireSnapshots.run(store, keepLast = 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    RunResult(cores, synthSec, compactSec, clusterSec, verifySec,
      nClips / maintSec, filesBefore, cRes.filesAfter, zRes.filesAfter,
      rep.passRate)
  }

  def main(args: Array[String]): Unit = {
    val nClips = args.lift(0).map(_.toLong).getOrElse(200000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val coresN = args.lift(2).map(_.toInt).getOrElse(8)
    val levels = Seq(coresN, coresN * 4)

    val results = levels.map { cores =>
      val spark = session(cores)
      try {
        runOnce(spark, cores, math.min(nClips, 20000L)) // warm-up, discarded
        val runs = (1 to reps).map(_ => runOnce(spark, cores, nClips))
        cores -> runs.sortBy(_.clipsPerSec).apply(runs.size / 2) // median
      } finally spark.stop()
    }

    val Seq((_, rN), (_, r4N)) = results
    val eff = (r4N.clipsPerSec / rN.clipsPerSec) / 4.0
    val pass = eff >= 0.8

    val md =
      s"""# BENCH/BASELINE -- two-parallelism maintenance throughput
         |
         |Protocol: BASELINE.md section 3. Same deterministic clip table
         |(${nClips} clips, FIXTURES.md §1 generator, maxDurMs=150),
         |identical confs except core count; timed phases = bin-pack
         |compaction + Z-order cluster rewrite; every run gated by
         |scan-equality verification (SNR>=30dB + transcript). Median of
         |$reps reps after 1 discarded warm-up.
         |
         || metric | local[${rN.cores}] (N) | local[${r4N.cores}] (4N) |
         ||---|---|---|
         || synth+append sec (untimed phase) | ${f"${rN.synthSec}%.1f"} | ${f"${r4N.synthSec}%.1f"} |
         || compact sec | ${f"${rN.compactSec}%.1f"} | ${f"${r4N.compactSec}%.1f"} |
         || cluster sec | ${f"${rN.clusterSec}%.1f"} | ${f"${r4N.clusterSec}%.1f"} |
         || verify sec | ${f"${rN.verifySec}%.1f"} | ${f"${r4N.verifySec}%.1f"} |
         || files before -> compacted -> clustered | ${rN.filesBefore} -> ${rN.filesAfterCompact} -> ${rN.filesAfterCluster} | ${r4N.filesBefore} -> ${r4N.filesAfterCompact} -> ${r4N.filesAfterCluster} |
         || verify pass rate | ${rN.verifyPassRate} | ${r4N.verifyPassRate} |
         || **maintenance clips/sec** | **${f"${rN.clipsPerSec}%.0f"}** | **${f"${r4N.clipsPerSec}%.0f"}** |
         |
         |Scaling efficiency (thr_4N / thr_N) / 4 = **${f"$eff%.3f"}**
         |(north_rule bar: >= 0.8 -> ${if (pass) "PASS" else "FAIL"})
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    Files.write(Paths.get("BENCH/BASELINE.md"), md.getBytes(StandardCharsets.UTF_8))
    println(md)
    println(s"""{"metric":"maintenance_clips_per_sec","n":${r4N.clipsPerSec.toLong},""" +
      s""""scaling_efficiency":${f"$eff%.3f"},"pass":$pass}""")
  }
}
