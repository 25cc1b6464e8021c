package graft.ops

import java.nio.file.{Files, Path, Paths}

import graft.table.MetaStore

import scala.jdk.CollectionConverters._

final case class OrphanResult(scanned: Int, orphansDeleted: Int, bytesFreed: Long)

/**
 * Orphan-file GC: a writer that crashes AFTER writing data files but BEFORE
 * its commit leaves files on disk that no snapshot references — invisible to
 * readers (snapshot isolation) and to [[ExpireSnapshots]] (which only walks
 * committed snapshots), but costing storage forever. This action deletes
 * data files unreachable from ANY snapshot, with an age floor so an
 * in-flight (written-but-not-yet-committed) maintenance pass is never
 * clobbered — the same contract as Iceberg's remove_orphan_files.
 */
object RemoveOrphans {

  /** @param minAgeMs only files older than this are deletable (default 1 h);
   *    must exceed the longest plausible write-to-commit window. */
  def run(store: MetaStore, minAgeMs: Long = 3600L * 1000): OrphanResult = {
    val reachable: Set[String] =
      store.allSnapshotIds.flatMap(store.entries).map(_.path).toSet
    val dataDir = Paths.get(store.tableDir, "data")
    val cutoff = System.currentTimeMillis() - minAgeMs
    var scanned = 0
    var deleted = 0
    var freed = 0L
    val stream = Files.walk(dataDir)
    try {
      stream.iterator().asScala.foreach { p: Path =>
        if (Files.isRegularFile(p) && p.toString.endsWith(".parquet")) {
          scanned += 1
          val norm = store.normalizePath(p.toString)
          if (!reachable.contains(norm) &&
              Files.getLastModifiedTime(p).toMillis < cutoff) {
            freed += Files.size(p)
            Files.delete(p)
            deleted += 1
          }
        }
      }
    } finally stream.close()
    OrphanResult(scanned, deleted, freed)
  }
}
