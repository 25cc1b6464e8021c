package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.functions.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Write-time ANN side-tables: the LSH bucket assignment and the per-label
 * IVF centroids are computed ONCE when the index is built and persisted as
 * parquet next to (not inside) the source table; probes read the index, not
 * the corpus. At 100 TB this is the difference between an O(corpus) rebuild
 * per query and an O(candidates) pruned join — the same role the reference's
 * persisted cluster indexes play (vec/util/BloomFilter.kt:18-121 keys its
 * bloom filters by cluster at build time, not per probe).
 *
 * Index layout under [[dirFor]]:
 * {{{
 *   buckets/    vec_id, label, bkt        (one row per vector)
 *   centroids/  label, pos, mean_x        (IVF coarse cells)
 *   _COMPLETE   fingerprint of the source at build time
 * }}}
 *
 * The fingerprint (file names + sizes of the source parquet) makes `ensure`
 * rebuild automatically when the source table changes, so a maintenance
 * rewrite of the SOURCE invalidates cleanly while an unchanged source keeps
 * serving the persisted index.
 */
object VecIndex {

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /**
   * Index location for a PLAIN parquet source path (no metastore): keyed by
   * the full SHA-256 of the path (r2's 32-bit `String.hashCode` was
   * collision-prone). This variant is a single-process convenience for
   * loose parquet directories the caller cannot write next to — on a real
   * cluster the local dir is invisible to other drivers, so MetaStore-backed
   * tables should use [[ensureForStore]], which persists the index INSIDE
   * the table's own `meta/` keyed by snapshot id.
   */
  def dirFor(sourcePath: String): String = {
    val h = sha256Hex(sourcePath).take(32)
    Paths.get(System.getProperty("java.io.tmpdir"), s"graft-vecindex-$h").toString
  }

  /** Index location for a snapshot of a MetaStore table: inside the table's
   * own metadata tree, so every reader of the table (any driver, any
   * executor mounting the table path) sees the same index, and snapshot id
   * keying makes invalidation exact — a maintenance commit changes the id,
   * an unchanged table keeps serving the built index. */
  def dirForStore(store: graft.table.MetaStore, snapshotId: Long): String =
    Paths.get(store.tableDir, "meta", "vecindex", s"snap-$snapshotId").toString

  private def fingerprint(sourcePath: String): String = {
    val p = Paths.get(sourcePath)
    if (!Files.exists(p)) return "missing"
    val files =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          while (it.hasNext) {
            val f = it.next()
            buf += s"${f.getFileName}:${Files.size(f)}"
          }
          buf.sorted.toSeq
        } finally s.close()
      } else Seq(s"${p.getFileName}:${Files.size(p)}")
    files.mkString("|")
  }

  /** Build both side-tables from an embeddings dataframe. */
  def build(spark: SparkSession, embeddings: DataFrame, indexDir: String,
            sourceFingerprint: String): Unit = {
    val dir = Paths.get(indexDir)
    Files.createDirectories(dir)
    embeddings
      .select(col("vec_id"), col("label"), expr(VecExprs.bucketSpark).as("bkt"))
      .write.mode("overwrite").parquet(s"$indexDir/buckets")
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg(col("x").cast("double")).as("mean_x"))
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    Files.write(dir.resolve("_COMPLETE"),
      sourceFingerprint.getBytes(StandardCharsets.UTF_8))
  }

  /**
   * Ensure an up-to-date index exists for the embeddings parquet at
   * `sourcePath`; builds (or rebuilds on source change) at most once.
   * Returns the index directory.
   */
  def ensure(spark: SparkSession, sourcePath: String): String = synchronized {
    val indexDir = dirFor(sourcePath)
    val marker = Paths.get(indexDir, "_COMPLETE")
    val fp = fingerprint(sourcePath)
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == fp
    if (!fresh)
      build(spark, spark.read.parquet(sourcePath), indexDir, fp)
    indexDir
  }

  /**
   * Ensure an index for the CURRENT snapshot of a MetaStore table, persisted
   * under `<tableDir>/meta/vecindex/snap-<id>/`. Rebuilds exactly when the
   * snapshot id changes (any commit — append, compact, merge — invalidates);
   * indexes of superseded snapshots are pruned once a newer one completes,
   * keeping the metadata tree bounded. Returns the index directory.
   */
  def ensureForStore(spark: SparkSession, store: graft.table.MetaStore): String =
    synchronized {
      val snapId = store.currentSnapshotId.getOrElse(
        sys.error(s"vecindex: ${store.tableDir} has no current snapshot"))
      val indexDir = dirForStore(store, snapId)
      val marker = Paths.get(indexDir, "_COMPLETE")
      val fp = s"snapshot-$snapId"
      val fresh = Files.exists(marker) &&
        new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == fp
      if (!fresh) {
        build(spark, store.scan(spark, snapId), indexDir, fp)
        // prune superseded snapshot indexes (GC after successful build)
        val root = Paths.get(store.tableDir, "meta", "vecindex")
        val stream = Files.list(root)
        val old = try {
          val it = stream.iterator()
          val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString != s"snap-$snapId") buf += p
          }
          buf.toSeq
        } finally stream.close()
        old.foreach { p =>
          val walk = Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
          } finally walk.close()
        }
      }
      indexDir
    }

  def buckets(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/buckets")

  def centroids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/centroids")
}
