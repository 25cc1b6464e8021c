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
    case class T(wall: Long = 0, cpu: Long = 0, gc: Long = 0, fetchWait: Long = 0,
                 shufWrite: Long = 0, mx: Long = 0)
    case class S(name: String, tasks: Int, wallMs: Long, t: T)
    val stages = scala.collection.mutable.ArrayBuffer[S]()
    private val taskAgg = scala.collection.mutable.Map[Int, T]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val a = taskAgg.getOrElse(t.stageId, T())
      val m = t.taskMetrics
      val (cpu, gc, fw, sw) =
        if (m == null) (0L, 0L, 0L, 0L)
        else (m.executorCpuTime / 1000000, m.jvmGCTime,
          m.shuffleReadMetrics.fetchWaitTime,
          m.shuffleWriteMetrics.writeTime / 1000000)
      taskAgg(t.stageId) = T(a.wall + t.taskInfo.duration, a.cpu + cpu,
        a.gc + gc, a.fetchWait + fw, a.shufWrite + sw,
        math.max(a.mx, t.taskInfo.duration))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      val i = sc.stageInfo
      val wall = (for {s <- i.submissionTime; e <- i.completionTime} yield e - s).getOrElse(-1L)
      stages += S(i.name.takeWhile(_ != '\n').take(40), i.numTasks, wall,
        taskAgg.getOrElse(i.stageId, T()))
    }
    def drainAndPrint(tag: String): Unit = synchronized {
      stages.foreach { s =>
        System.err.println(f"[stage $tag] ${s.name}%-40s tasks=${s.tasks}%3d " +
          f"wall=${s.wallMs / 1000.0}%6.1fs taskSum=${s.t.wall / 1000.0}%7.1fs " +
          f"cpu=${s.t.cpu / 1000.0}%7.1fs gc=${s.t.gc / 1000.0}%5.1fs " +
          f"fetchWait=${s.t.fetchWait / 1000.0}%5.1fs shufWrite=${s.t.shufWrite / 1000.0}%5.1fs " +
          f"taskMax=${s.t.mx / 1000.0}%6.1fs")
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
