package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.table.{Json, MetaStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot ids are stored as strings: Jackson erases Map[String, Long] to
 * boxed Integers on read, which blows up at the first unboxing access.
 * `retention` (optional, absent in files written before it existed) maps a
 * tag name to "createdAtMs,maxRefAgeMs" — the Iceberg per-ref retention
 * pair; a tag without an entry is permanent. */
final case class RefsFile(tags: Map[String, String],
                          retention: Map[String, String] = Map.empty)

/**
 * Named snapshot refs (tags) + rollback over the snapshot log — the
 * release-management layer of the lakehouse: tag a snapshot a training run
 * consumed ("dataset-v3"), keep reading it by name while maintenance moves
 * CURRENT forward, and roll the table back to any live snapshot by
 * committing its file list as a NEW snapshot (history stays intact; no file
 * is touched). [[ExpireSnapshots]] treats tagged snapshots as GC roots, so a
 * tag pins its files for as long as it exists.
 *
 * Durability model: refs state is a chain of immutable version files
 * (`meta/refs/v<N>.json`), each published by a filesystem compare-and-swap
 * ([[casWrite]] — hard-link claim of the next version name), so concurrent
 * read-modify-writes SERIALIZE by construction: the loser's claim fails and
 * its RMW re-runs against the winner's state ([[rmwRefs]]). The advisory
 * lock ([[withRefsLock]]) only reduces CAS contention. Tables written
 * before versioning read their legacy single `refs.json` until the first
 * mutation migrates them.
 */
object Refs {

  private def refsPath(store: MetaStore) =
    Paths.get(store.tableDir, "meta", "refs.json")

  private def refsDir(store: MetaStore) =
    Paths.get(store.tableDir, "meta", "refs")

  private def parseRefs(bytes: Array[Byte]): RefsFile = {
    val f = Json.mapper.readValue[RefsFile](
      new String(bytes, StandardCharsets.UTF_8))
    // files written before retention existed deserialize it as null
    if (f.retention == null) f.copy(retention = Map.empty) else f
  }

  /** Committed version numbers present under meta/refs/, ascending. */
  private def versionsOf(store: MetaStore): Seq[Long] = {
    val dir = refsDir(store)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      val it = s.iterator()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("v") && n.endsWith(".json"))
          n.stripPrefix("v").stripSuffix(".json").toLongOption.foreach(out += _)
      }
      out.sorted.toSeq
    } finally s.close()
  }

  /** (version, state). Version 0 = no CAS commit yet — state comes from the
   * legacy single refs.json (or is empty); the first [[casWrite]] migrates
   * it to v1. Every version file is published complete (hard-link of a
   * fully written temp), so a parse failure means external damage, not a
   * torn write — surfaced, same as the legacy path. */
  private[graft] def readVersioned(store: MetaStore): (Long, RefsFile) = {
    var attempt = 0
    while (true) {
      versionsOf(store).lastOption match {
        case Some(v) =>
          // the listed TOP version can only vanish if 4+ newer commits land
          // between the list and this read (gcVersions' keep window) — an
          // astronomically narrow race, but a reader must re-list rather
          // than crash on it
          try return (v,
            parseRefs(Files.readAllBytes(refsDir(store).resolve(s"v$v.json"))))
          catch {
            case _: java.nio.file.NoSuchFileException if attempt < 20 =>
              attempt += 1
          }
        case None =>
          val p = refsPath(store)
          return if (Files.exists(p)) (0L, parseRefs(Files.readAllBytes(p)))
          else (0L, RefsFile(Map.empty))
      }
    }
    sys.error("unreachable")
  }

  private def readFile(store: MetaStore): RefsFile = readVersioned(store)._2

  /** Publish `f` as version `expected + 1` IFF no other writer got there
   * first — a true filesystem compare-and-swap: the content is fully
   * written to a temp file, then HARD-LINKED to the versioned name, and
   * link(2) fails atomically with EEXIST when the version already exists.
   * Exactly one concurrent writer per version wins; losers re-read and
   * re-run their read-modify-write ([[rmwRefs]]). This is what makes refs
   * durability independent of the advisory lock: even a mistaken lock
   * steal (a GC-paused holder evicted past the heartbeat) cannot LOSE an
   * update — the conflicting writer's CAS fails instead. */
  private[graft] def casWrite(store: MetaStore, expected: Long,
                              f: RefsFile): Boolean = {
    val dir = refsDir(store)
    Files.createDirectories(dir)
    val target = dir.resolve(s"v${expected + 1}.json")
    if (Files.exists(target)) return false
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp,
      Json.mapper.writeValueAsString(f).getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: UnsupportedOperationException =>
        // no hard links (exotic fs): claim the version name atomically with
        // CREATE_NEW, then replace the (briefly empty) claim with the full
        // content; readers of THIS version between the two steps would
        // parse-fail, which readVersioned surfaces — acceptable on a
        // fallback path that never runs on POSIX
        try {
          Files.write(target, Array.emptyByteArray,
            java.nio.file.StandardOpenOption.CREATE_NEW)
          Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
  }

  /** Retire versions well behind `latest` (keep a few for readers that
   * resolved a version just before a burst of commits). Best-effort. */
  private def gcVersions(store: MetaStore, latest: Long): Unit =
    versionsOf(store).filter(_ <= latest - 4).foreach { v =>
      try Files.deleteIfExists(refsDir(store).resolve(s"v$v.json"))
      catch { case _: java.io.IOException => () }
    }

  /** Run a refs read-modify-write with CAS publication: `body` maps the
   * current state to (Some(newState) to commit | None for read-only, plus
   * the caller's result). On a lost CAS race the body RE-RUNS against the
   * winner's state, so no update is ever silently clobbered — the advisory
   * [[withRefsLock]] wrapper only keeps concurrent writers from burning
   * retries, it is not load-bearing for correctness. */
  private[graft] def rmwRefs[A](store: MetaStore)
                               (body: RefsFile => (Option[RefsFile], A)): A =
    withRefsLock(store) {
      var attempts = 0
      var out: Option[A] = None
      while (out.isEmpty) {
        val (v, cur) = readVersioned(store)
        val (next, result) = body(cur)
        next match {
          case None => out = Some(result)
          case Some(nf) =>
            if (casWrite(store, v, nf)) {
              gcVersions(store, v + 1)
              out = Some(result)
            } else {
              attempts += 1
              if (attempts > 100)
                sys.error(s"refs CAS: lost $attempts races in a row " +
                  s"(${store.tableDir}) — giving up rather than spinning")
              Thread.sleep(1)
            }
        }
      }
      out.get
    }

  def tags(store: MetaStore): Map[String, Long] =
    readFile(store).tags.map { case (k, v) => k -> v.toLong }

  /** Per-tag retention: name -> (createdAtMs, maxRefAgeMs). Tags without an
   * entry are permanent. */
  def retention(store: MetaStore): Map[String, (Long, Long)] =
    readFile(store).retention.flatMap { case (k, v) =>
      v.split(",") match {
        case Array(c, a) => Some(k -> (c.toLong, a.toLong))
        case _ => None
      }
    }

  /** Steal a lock only once its MTIME is older than this (overridable for
   * tests via -Dgraft.refs.lockStaleMs). The holder heartbeats the mtime at
   * a fraction of this period, so a live-but-slow holder never looks stale;
   * only a crashed holder's lock ages past the threshold. */
  private def staleLockMs: Long =
    sys.props.get("graft.refs.lockStaleMs").map(_.toLong).getOrElse(30000L)

  /**
   * ADVISORY serialization of refs mutators (tag / deleteTag / expireTags)
   * with an O_EXCL lock file — a contention reducer, NOT the correctness
   * mechanism: durability is carried by [[casWrite]]'s version CAS, so even
   * a wrongly-stolen lock (a GC-paused holder evicted past its heartbeat —
   * the irreducible failure mode of any mtime lease, r5 review) cannot lose
   * an update; the two writers' CAS attempts conflict and the loser re-runs.
   * Crash recovery: a waiter may steal a lock ONLY when the lock file's own
   * mtime is stale (not when the waiter has waited long — ADVICE r4), the
   * steal is claimed by atomic rename so exactly one stealer wins AND the
   * claimed file's content must still be the token the waiter observed as
   * stale — a fresh lock recreated between the stat and the move is
   * restored, not destroyed (r5 review: without this, two waiters past the
   * same stale observation could leapfrog-steal each other's fresh locks).
   * A shared heartbeat refreshes the holder's mtime so a slow live holder
   * is never evicted, and the finally-path deletes the lock only if it
   * still carries this holder's token.
   */
  private[graft] def withRefsLock[A](store: MetaStore)(body: => A): A = {
    val lock = Paths.get(store.tableDir, "meta", "refs.lock")
    Files.createDirectories(lock.getParent)
    val token = java.util.UUID.randomUUID().toString
    acquire(lock, token)
    val beat = startHeartbeat(lock)
    try body finally {
      beat.cancel(false)
      try {
        if (Files.exists(lock) &&
            new String(Files.readAllBytes(lock),
              StandardCharsets.UTF_8) == token)
          Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () }
      ()
    }
  }

  /** O_EXCL create, with token-revalidated stale-steal (scaladoc above). */
  private def acquire(lock: java.nio.file.Path, token: String): Unit = {
    var held = false
    while (!held) {
      try {
        Files.write(lock, token.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val ageMs =
            try System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            catch { case _: java.io.IOException => -1L } // gone → retry create
          if (ageMs > staleLockMs) {
            // content read deferred to here: the 2 ms contention poll needs
            // only the stat; per-poll readAllBytes would be pure I/O waste
            // (r5 review)
            val observed =
              try new String(Files.readAllBytes(lock), StandardCharsets.UTF_8)
              catch { case _: java.io.IOException => "" }
            // re-confirm staleness AFTER the content read: a fresh lock
            // replacing the stale one between the first stat and the read
            // would otherwise be observed as its own content and pass the
            // claimed==observed check below
            val stillStale =
              try System.currentTimeMillis() -
                Files.getLastModifiedTime(lock).toMillis > staleLockMs
              catch { case _: java.io.IOException => false }
            // claim the stale lock via atomic rename: the one waiter whose
            // move succeeds owns the claim; losers see IOException and
            // re-loop. The claim is deleted ONLY if it is still the file
            // observed stale — a fresh lock that raced in is moved back.
            val claim = lock.resolveSibling(s"refs.lock.stale-${token.take(8)}")
            if (stillStale) try {
              Files.move(lock, claim,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              val claimed = new String(Files.readAllBytes(claim),
                StandardCharsets.UTF_8)
              if (claimed == observed) Files.deleteIfExists(claim)
              else
                // we grabbed a LIVE lock recreated after our stat: put it
                // back (the refs CAS covers the sub-race where a third
                // waiter locked in between — no update can be lost)
                try Files.move(claim, lock,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                catch { case _: java.io.IOException =>
                  Files.deleteIfExists(claim); ()
                }
            } catch { case _: java.io.IOException => () }
          } else Thread.sleep(2)
      }
    }
  }

  /** One shared daemon scheduler for every lock's heartbeat: the typical
   * critical section (a refs.json read-modify-write) is sub-millisecond,
   * far under the first beat interval, so per-mutation thread
   * create/start/interrupt would be pure overhead (r5 review) — a
   * scheduled task that is cancelled before it ever fires costs ~nothing. */
  private lazy val beatPool = {
    val p = new java.util.concurrent.ScheduledThreadPoolExecutor(1, { r =>
      val t = new Thread(r, "graft-refs-lock-heartbeat")
      t.setDaemon(true)
      t
    }: java.util.concurrent.ThreadFactory)
    // a hot mutation loop cancels thousands of never-fired beats; without
    // this they linger in the delay queue until their first fire time
    // (r5 review)
    p.setRemoveOnCancelPolicy(true)
    p
  }

  private def startHeartbeat(
      lock: java.nio.file.Path): java.util.concurrent.ScheduledFuture[_] = {
    val beatMs = math.max(1L, staleLockMs / 6)
    beatPool.scheduleAtFixedRate(() => {
      try Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
      catch { case _: java.io.IOException => () } // lock vanished (stolen)
    }, beatMs, beatMs, java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  /** Tag `snapshotId` (default: current) as `name`; overwrites an existing
   * tag of the same name. `maxRefAgeMs > 0` gives the tag an Iceberg-style
   * ref retention: once the tag is older than this, [[expireTags]] (run
   * automatically at the start of every [[ExpireSnapshots]] pass) drops it,
   * un-pinning its snapshot — so a "keep the nightly export for 30 days"
   * tag cannot quietly pin 10^5 files forever. `0` makes the tag
   * EXPLICITLY permanent (drops any existing retention); the default `-1`
   * keeps whatever retention the name already carries — so re-pointing a
   * retained nightly tag does not silently convert it into a permanent GC
   * root (ADVICE r3). */
  def tag(store: MetaStore, name: String, snapshotId: Long = -1L,
          maxRefAgeMs: Long = -1L): Long = {
    val id = if (snapshotId >= 0) snapshotId
      else store.currentSnapshotId.getOrElse(sys.error("tag: empty table"))
    require(store.allSnapshotIds.contains(id), s"tag: no snapshot $id")
    rmwRefs(store) { f =>
      val ret =
        if (maxRefAgeMs > 0L)
          f.retention + (name -> s"${System.currentTimeMillis()},$maxRefAgeMs")
        else if (maxRefAgeMs == 0L) f.retention - name
        else f.retention // keep-existing sentinel
      (Some(RefsFile(f.tags + (name -> id.toString), ret)), ())
    }
    id
  }

  def deleteTag(store: MetaStore, name: String): Unit =
    rmwRefs(store) { f =>
      (Some(RefsFile(f.tags - name, f.retention - name)), ())
    }

  /** Drop every tag whose age exceeds its declared maxRefAgeMs; returns the
   * dropped names. Permanent tags (no retention entry) never expire. */
  def expireTags(store: MetaStore,
                 nowMs: Long = System.currentTimeMillis()): Seq[String] =
    rmwRefs(store) { f =>
      val expired = f.retention.flatMap { case (k, v) =>
        v.split(",") match {
          case Array(c, a) if nowMs - c.toLong > a.toLong => Some(k)
          case _ => None
        }
      }.toSeq.sorted
      (if (expired.isEmpty) None
       else Some(RefsFile(f.tags -- expired, f.retention -- expired)),
        expired)
    }

  def snapshotFor(store: MetaStore, name: String): Long =
    tags(store).getOrElse(name, sys.error(s"no tag named $name"))

  /** Read the table as of a tag — snapshot isolation by name. ROWS are
   * frozen; the SCHEMA follows the table's latest declared schema: a later
   * `Evolve.addColumn` makes tagged reads grow the new column filled with
   * its default (same latest-schema-wins rule Delta applies to time
   * travel). Consumers needing byte-stable exports should [[Publish]] the
   * tag instead of re-reading it. */
  def scanTag(spark: SparkSession, store: MetaStore, name: String): DataFrame =
    store.scan(spark, snapshotFor(store, name))

  /** One row per named ref — tags AND branches — as a DataFrame (the
   * Iceberg `table$refs` metadata-table analog): name, type, the snapshot
   * it points at (a branch's current head), creation time and max ref age
   * where declared (-1 = permanent / unknown). Answered from metadata
   * alone; zero data IO. */
  def refsTable(spark: SparkSession, store: MetaStore): DataFrame = {
    import spark.implicits._
    val ret = retention(store)
    val tagRows = tags(store).toSeq.map { case (n, id) =>
      val (c, a) = ret.getOrElse(n, (-1L, -1L))
      (n, "tag", id, c, a)
    }
    val branchRows = Branches.list(store).toSeq.map { case (n, rec) =>
      val head = Branches.store(store, n).currentSnapshotId.getOrElse(-1L)
      (n, "branch", head, rec.createdMs,
        if (rec.maxRefAgeMs > 0L) rec.maxRefAgeMs else -1L)
    }
    (tagRows ++ branchRows).sortBy(r => (r._2, r._1))
      .toDF("name", "type", "snapshot_id", "created_at_ms", "max_age_ms")
  }

  /**
   * Roll the table back to `toSnapshotId`: commits that snapshot's exact
   * file list as a NEW snapshot (operation "rollback"). Metadata-only and
   * non-destructive — the rolled-back-over snapshots stay in history until
   * expiry.
   */
  def rollback(store: MetaStore, toSnapshotId: Long): Long = {
    require(store.allSnapshotIds.contains(toSnapshotId),
      s"rollback: no snapshot $toSnapshotId")
    // restore the target's equality-delete set too: its entries carry their
    // original seqs, so the target's deletes land on exactly the same rows
    // (inheriting the CURRENT delete set instead would apply deletes
    // committed after the target to a pre-delete file list)
    store.commit("rollback", store.entries(toSnapshotId),
      Map("rolledBackTo" -> toSnapshotId.toString),
      deletes = Some(store.deleteEntries(toSnapshotId)))
  }
}
