package graft.ops

import java.nio.file.{Files, Paths}

import graft.table.MetaStore

final case class ExpireResult(
    expiredSnapshots: Seq[Long],
    retainedSnapshots: Seq[Long],
    dataFilesDeleted: Int,
    manifestsDeleted: Int,
    tagsExpired: Seq[String] = Nil,
    branchesExpired: Seq[String] = Nil)

/**
 * Snapshot expiry with reachability GC: drop all snapshots except the most
 * recent `keepLast`, then delete every manifest and data file no retained
 * snapshot can reach. This realizes the reference's aspired
 * "consolidate ... to absorb journalized mutations" / idempotent-volume GC
 * (reference README.md:141-142,163-165) over our snapshot log.
 *
 * Reachability is computed over the retained snapshot set only — a file
 * shared by an expired and a retained snapshot survives (files are
 * content-immutable, so sharing across snapshots is the common case after
 * partial rewrites).
 */
object ExpireSnapshots {

  /** @param minAgeMs only snapshots at least this old are expirable — the
   *    retention window incremental consumers ([[graft.streaming.ChangeFeed]])
   *    rely on: a consumer lagging less than the window never loses a batch.
   *    0 = age is no protection (keepLast/current/tags still are). */
  def run(store: MetaStore, keepLast: Int = 1, minAgeMs: Long = 0L): ExpireResult = {
    val current = store.currentSnapshotId.getOrElse(sys.error("expire: empty table"))
    // only COMMITTED history participates: a snap file with id > CURRENT is
    // either crash debris or a commit in flight — counting it toward the
    // keepLast window would silently shrink real retention by one per such
    // file (and expire a snapshot a lagging ChangeFeed consumer was
    // promised), and deleting it could kill a commit mid-publish. Debris is
    // RemoveOrphans' job (age-floored), not expiry's.
    val all = store.allSnapshotIds.filter(_ <= current)
    // per-ref retention first: a tag past its declared maxRefAgeMs stops
    // being a GC root NOW, in the same pass — otherwise an aged-out nightly
    // tag pins its snapshot for one extra expiry cycle
    val droppedTags = Refs.expireTags(store)
    // same rule for branches that declared maxRefAgeMs at create time: an
    // aged-out staging branch stops pinning its fork point and data roots
    val droppedBranches = Branches.expireAged(store)
    // tags and branch fork points are GC roots: a tagged snapshot (and its
    // files) survives expiry for as long as the tag exists (Refs.scala), and
    // a live branch pins the snapshot it forked from — every parent file a
    // branch commit carries is reachable from that fork (Branches.scala)
    val tagged = (Refs.tags(store).values.toSeq ++ Branches.forkRoots(store))
      .filter(all.contains)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val young =
      if (minAgeMs <= 0L) Seq.empty
      else all.filter(id => store.snapshot(id).timestampMs > cutoff)
    val retained =
      (all.takeRight(keepLast) ++ tagged ++ young :+ current).distinct.sorted
    val expired = all.filterNot(retained.contains)

    // delete files and their manifests participate in reachability exactly
    // like data files: a retained snapshot's equality-delete parquets must
    // survive (dropping one would resurrect its deleted rows), an expired
    // snapshot's go once nothing retained shares them
    val reachableData = retained.flatMap(id =>
      store.entries(id) ++ store.deleteEntries(id)).map(_.path).toSet
    val reachableManifests = retained.map(store.snapshot)
      .flatMap(s => s.manifests ++ s.deleteManifests).toSet
    val expiredData = expired.flatMap(id =>
      store.entries(id) ++ store.deleteEntries(id)).map(_.path).toSet
    val expiredManifests = expired.map(store.snapshot)
      .flatMap(s => s.manifests ++ s.deleteManifests).toSet

    var dataDeleted = 0
    var manifestsDeleted = 0
    // a branch store shares data files with its parent table: expiring
    // branch HISTORY (snap/manifest JSONs, branch-local) is fine, but data
    // files it can reach may also be reachable from parent snapshots this
    // store cannot see — only the owning store may delete data. On the
    // owning side, files reachable from any LIVE BRANCH's log are pinned
    // even when every main snapshot referencing them expires (a replayed
    // intermediate can expire while the branch still needs its files).
    if (store.ownsData) {
      val branchPinned = Branches.dataRoots(store)
      (expiredData -- reachableData).foreach { p =>
        if (!branchPinned.contains(store.normalizePath(p)) &&
            Files.deleteIfExists(Paths.get(p))) dataDeleted += 1
      }
    }
    (expiredManifests -- reachableManifests).foreach { m =>
      if (Files.deleteIfExists(Paths.get(store.tableDir, "meta", m))) {
        manifestsDeleted += 1
        store.forgetManifest(m)
      }
    }
    expired.foreach { id =>
      Files.deleteIfExists(Paths.get(store.tableDir, "meta", s"snap-$id.json"))
    }
    ExpireResult(expired, retained, dataDeleted, manifestsDeleted,
      droppedTags, droppedBranches)
  }
}
