package graft.ops

import java.nio.file.{Files, Path, Paths}

import graft.table.MetaStore

import scala.jdk.CollectionConverters._

final case class OrphanResult(scanned: Int, orphansDeleted: Int, bytesFreed: Long,
                              commitDebrisDeleted: Int = 0)

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

  /** Data-file paths recorded in checkpoint result payloads — outputs of an
   * IN-PROGRESS (interrupted, resumable) maintenance run that no snapshot
   * references yet. They must be GC roots: deleting them would make the
   * run's resume path commit entries pointing at vanished files. Payloads
   * that are not DataFile JSON (e.g. persisted range bounds) parse-fail and
   * contribute nothing. */
  private def checkpointRoots(store: MetaStore): Set[String] = {
    val cpDir = Paths.get(store.tableDir, "meta", "checkpoints")
    if (!Files.exists(cpDir)) return Set.empty
    val stream = Files.walk(cpDir)
    try stream.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("result-"))
      .flatMap { p =>
        try graft.table.Json.mapper
          .readValue[Seq[graft.table.DataFile]](
            new String(Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8))
          .map(e => store.normalizePath(e.path))
        catch { case _: Exception => Seq.empty[String] }
      }.toSet
    finally stream.close()
  }

  /** @param minAgeMs only files older than this are deletable (default 1 h);
   *    must exceed the longest plausible write-to-commit window. */
  def run(store: MetaStore, minAgeMs: Long = 3600L * 1000): OrphanResult = {
    require(store.ownsData,
      s"${store.tableDir}: orphan GC must run on the owning table, not a " +
        "branch store (branch data lives in the parent's data directory)")
    val reachable: Set[String] =
      store.allSnapshotIds.flatMap(id =>
        store.entries(id) ++ store.deleteEntries(id)).map(_.path).toSet ++
        checkpointRoots(store) ++
        // staged-but-unpublished WAP batches: no snapshot references them,
        // but they are pending work, not garbage
        Wap.stagedRoots(store) ++
        // branch-reachable files sit in THIS data dir but no main snapshot
        // references them until fast-forward — pending work, not garbage;
        // likewise work staged THROUGH a branch store (WAP batches,
        // checkpointed run outputs) is recorded in the branch's meta while
        // its files live here
        Branches.dataRoots(store) ++
        Branches.pendingRoots(store) ++
        Branches.list(store).keys.flatMap(n =>
          checkpointRoots(Branches.store(store, n)))
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
    OrphanResult(scanned, deleted, freed, removeCommitDebris(store, cutoff))
  }

  /** A commit that crashed between its snap-file claim and the CURRENT
   * rename leaves `snap-<k>.json` with k > CURRENT — unreachable, and
   * blocking the next writer's claim of that id (MetaStore.commit allocates
   * CURRENT + 1). Deletes such debris (and its manifests) behind the same
   * age floor that protects in-flight commits. */
  private def removeCommitDebris(store: MetaStore, cutoffMs: Long): Int = {
    val cur = store.currentSnapshotId.getOrElse(return 0)
    var removed = 0
    store.allSnapshotIds.filter(_ > cur).foreach { id =>
      val p = Paths.get(store.tableDir, "meta", s"snap-$id.json")
      if (Files.exists(p) && Files.getLastModifiedTime(p).toMillis < cutoffMs) {
        val snap = store.snapshot(id)
        // delta commits REUSE manifests by name (and inherit delete
        // manifests) — only remove the files this crashed commit wrote
        // itself, identified by the id baked into the name
        val own = snap.manifests.filter(_.startsWith(s"manifest-$id-")) ++
          snap.deleteManifests.filter(_.startsWith(s"delmanifest-$id-"))
        Files.delete(p)
        own.foreach(m =>
          Files.deleteIfExists(Paths.get(store.tableDir, "meta", m)))
        removed += 1
      }
    }
    removed
  }
}
