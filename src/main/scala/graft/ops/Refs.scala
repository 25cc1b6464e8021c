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
 */
object Refs {

  private def refsPath(store: MetaStore) =
    Paths.get(store.tableDir, "meta", "refs.json")

  private def readFile(store: MetaStore): RefsFile = {
    val p = refsPath(store)
    if (!Files.exists(p)) RefsFile(Map.empty)
    else {
      val f = Json.mapper.readValue[RefsFile](
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      // files written before retention existed deserialize it as null
      if (f.retention == null) f.copy(retention = Map.empty) else f
    }
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
   * Serialize every refs.json read-modify-write (tag / deleteTag /
   * expireTags) with an O_EXCL lock file next to refs.json — the same
   * cross-process primitive as the snapshot commit claim. Without it a
   * concurrent `tag()` landing between an expiry pass's read and its
   * atomic-rename write was silently lost, and the snapshot that tag pinned
   * could be GC'd by the SAME expiry pass (data deletion, not just a lost
   * ref). Crash recovery: a waiter may steal a lock ONLY when the lock
   * file's own mtime is stale (not when the waiter has waited long — ADVICE
   * r4: the old waiter-deadline steal could evict a live holder on every
   * retry), the steal is claimed by atomic rename so exactly one stealer
   * wins AND the claimed file's content must still be the token the waiter
   * observed as stale — a fresh lock recreated between the stat and the
   * move is restored, not destroyed (r5 review: without this, two waiters
   * past the same stale observation could leapfrog-steal each other's
   * fresh locks). A heartbeat thread refreshes the holder's mtime so a
   * slow live holder is never evicted, and the finally-path deletes the
   * lock only if it still carries this holder's token. Defense in depth:
   * the lock is treated as a LEASE — after the body runs, the holder
   * verifies its token is still in place; if it was stolen mid-body (only
   * reachable through a further sub-race of the restore path), the
   * read-modify-write re-runs under a fresh acquisition so the update a
   * concurrent winner may have clobbered is re-applied. All bodies are
   * pure refs.json read-modify-writes, so re-running is safe.
   */
  private[graft] def withRefsLock[A](store: MetaStore)(body: => A): A = {
    val lock = Paths.get(store.tableDir, "meta", "refs.lock")
    Files.createDirectories(lock.getParent)
    var attempt = 0
    while (true) {
      val token = java.util.UUID.randomUUID().toString
      acquire(lock, token)
      val beat = startHeartbeat(lock)
      var result: Option[A] = None
      try result = Some(body) finally {
        beat.cancel(false)
        val stillOwn =
          try Files.exists(lock) &&
            new String(Files.readAllBytes(lock),
              StandardCharsets.UTF_8) == token
          catch { case _: java.io.IOException => false }
        if (stillOwn)
          try Files.deleteIfExists(lock)
          catch { case _: java.io.IOException => () }
        // stolen mid-body on a SUCCESSFUL body → loop re-runs it (a body
        // that threw propagates from this finally's enclosing try as usual)
        if (result.isDefined && !stillOwn && attempt < 5) result = None
      }
      result match {
        case Some(a) => return a
        case None => attempt += 1 // lease lost: re-acquire and re-run
      }
    }
    sys.error("unreachable")
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
          val (ageMs, observed) =
            try {
              val a = System.currentTimeMillis() -
                Files.getLastModifiedTime(lock).toMillis
              val c = new String(Files.readAllBytes(lock),
                StandardCharsets.UTF_8)
              (a, c)
            } catch { case _: java.io.IOException => (-1L, "") } // gone → retry
          if (ageMs > staleLockMs) {
            // claim the stale lock via atomic rename: the one waiter whose
            // move succeeds owns the claim; losers see IOException and
            // re-loop. The claim is deleted ONLY if it is still the file
            // observed stale — a fresh lock that raced in is moved back.
            val claim = lock.resolveSibling(s"refs.lock.stale-${token.take(8)}")
            try {
              Files.move(lock, claim,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              val claimed = new String(Files.readAllBytes(claim),
                StandardCharsets.UTF_8)
              if (claimed == observed) Files.deleteIfExists(claim)
              else
                // we grabbed a LIVE lock recreated after our stat: put it
                // back (its holder's lease check covers the sub-race where
                // a third waiter locked in between)
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
  private lazy val beatPool =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-refs-lock-heartbeat")
      t.setDaemon(true)
      t
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

  /** Temp + atomic rename (the CURRENT / evolutions.json pattern): a torn
   * refs.json would make [[tags]] throw, which blocks ExpireSnapshots (tags
   * are GC roots) and every tag/rollback/publish-by-tag until repaired. */
  private def write(store: MetaStore, f: RefsFile): Unit = {
    val p = refsPath(store)
    val tmp = p.resolveSibling(
      s"refs.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp,
      Json.mapper.writeValueAsString(f).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    withRefsLock(store) {
      val f = readFile(store)
      val ret =
        if (maxRefAgeMs > 0L)
          f.retention + (name -> s"${System.currentTimeMillis()},$maxRefAgeMs")
        else if (maxRefAgeMs == 0L) f.retention - name
        else f.retention // keep-existing sentinel
      write(store, RefsFile(f.tags + (name -> id.toString), ret))
    }
    id
  }

  def deleteTag(store: MetaStore, name: String): Unit =
    withRefsLock(store) {
      val f = readFile(store)
      write(store, RefsFile(f.tags - name, f.retention - name))
    }

  /** Drop every tag whose age exceeds its declared maxRefAgeMs; returns the
   * dropped names. Permanent tags (no retention entry) never expire. */
  def expireTags(store: MetaStore,
                 nowMs: Long = System.currentTimeMillis()): Seq[String] =
    withRefsLock(store) {
      val f = readFile(store)
      val expired = f.retention.flatMap { case (k, v) =>
        v.split(",") match {
          case Array(c, a) if nowMs - c.toLong > a.toLong => Some(k)
          case _ => None
        }
      }.toSeq.sorted
      if (expired.nonEmpty)
        write(store, RefsFile(f.tags -- expired, f.retention -- expired))
      expired
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
