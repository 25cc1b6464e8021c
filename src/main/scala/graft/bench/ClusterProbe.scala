package graft.bench

import java.nio.file.{Files, Paths}

import graft.ops._
import graft.synth.ClipSynth
import graft.table.MetaStore
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Diagnostic: per-stage wall/task times for the cluster rewrite, to find
 * which stage stops scaling with cores. Not part of the driver contract.
 *
 * Usage: runMain graft.bench.ClusterProbe [nClips] [cores] [reps]
 */
object ClusterProbe {

  final class StageTimer extends SparkListener {
    case class S(name: String, tasks: Int, wallMs: Long, taskMsSum: Long, taskMsMax: Long)
    val stages = scala.collection.mutable.ArrayBuffer[S]()
    private val taskAgg = scala.collection.mutable.Map[Int, (Long, Long)]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val (sum, mx) = taskAgg.getOrElse(t.stageId, (0L, 0L))
      val d = t.taskInfo.duration
      taskAgg(t.stageId) = (sum + d, math.max(mx, d))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      val i = sc.stageInfo
      val wall = (for {s <- i.submissionTime; e <- i.completionTime} yield e - s).getOrElse(-1L)
      val (sum, mx) = taskAgg.getOrElse(i.stageId, (0L, 0L))
      stages += S(i.name.takeWhile(_ != '\n').take(60), i.numTasks, wall, sum, mx)
    }
    def drainAndPrint(tag: String): Unit = synchronized {
      stages.foreach { s =>
        System.err.println(f"[stage $tag] ${s.name}%-60s tasks=${s.tasks}%3d wall=${s.wallMs / 1000.0}%6.1fs cpuSum=${s.taskMsSum / 1000.0}%7.1fs taskMax=${s.taskMsMax / 1000.0}%6.1fs")
      }
      stages.clear(); taskAgg.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val nClips = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(16)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val benchRoot = ScalingBench.benchRoot
    Files.createDirectories(Paths.get(benchRoot))

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"cluster-probe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.local.dir", s"$benchRoot/spark-local")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.hadoop.io.file.buffer.size", "1048576")
      // sort-based shuffle writer: ONE sequential stream per map task
      // instead of bypass-merge's per-reducer stream fan-out + concat pass
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new StageTimer
    spark.sparkContext.addSparkListener(timer)

    val dir = Files.createTempDirectory(Paths.get(benchRoot), s"probe-$cores-").toString
    val store = MetaStore.forClips(dir)
    Append.run(spark, store, ClipSynth.dataset(spark, nClips, 256, maxDurMs = 150).toDF())
    Compact.run(spark, store, targetBytes = 64L * 1024 * 1024,
      runId = "probe-compact", maxConcurrentBins = cores)
    Thread.sleep(500); timer.drainAndPrint("setup-discard")

    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      Cluster.run(spark, store, ZOrderCurve, targetBytes = 64L * 1024 * 1024,
        runId = s"probe-cluster-$r")
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      timer.drainAndPrint(s"c$cores-r$r")
      System.err.println(f"[probe] cores=$cores rep=$r clusterSec=$sec%.1f")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
