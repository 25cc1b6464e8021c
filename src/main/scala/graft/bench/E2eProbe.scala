package graft.bench

import org.apache.spark.sql.SparkSession

/**
 * Diagnostic: run one SparkEntry query N times in a single warm JVM with the
 * exact graft.Bench session configuration, printing per-rep wall seconds.
 * Separates three effects the one-shot driver bench conflates: JVM/codegen
 * warm-up (rep 1 vs rest), host co-tenancy noise (rep-to-rep spread), and
 * genuine plan cost (the rep minimum). Not part of the driver contract.
 *
 * Usage: runMain graft.bench.E2eProbe [queryName] [reps] [sfDir] [cores]
 */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("q63_maintenance_e2e")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(3).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Bench.tempWarehouse())
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "1m")
      .config("spark.hadoop.io.file.buffer.size", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val walls = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[e2e-probe] $name rep=$r rows=$rows wall=$sec%.2f s")
      sec
    }
    val sortedW = walls.sorted
    val median = // true median: average the middles on an even rep count
      if (sortedW.size % 2 == 1) sortedW(sortedW.size / 2)
      else (sortedW(sortedW.size / 2 - 1) + sortedW(sortedW.size / 2)) / 2.0
    System.err.println(f"[e2e-probe] $name min=${walls.min}%.2f " +
      f"median=$median%.2f max=${walls.max}%.2f")
    spark.stop()
  }
}
