package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Filesystem-backed snapshot store with atomic commits.
 *
 * Layout:
 * {{{
 *   <tableDir>/data/<snapshotTag>/...parquet   data files (immutable once committed)
 *   <tableDir>/meta/snap-<id>.json             snapshot descriptors
 *   <tableDir>/meta/manifest-<id>-<uuid>.json  file lists + stats
 *   <tableDir>/meta/CURRENT                    atomic pointer (current snapshot id)
 *   <tableDir>/meta/lineage/                   lineage/metrics side-table (parquet)
 *   <tableDir>/meta/checkpoints/<runId>/       per-item completion markers
 * }}}
 *
 * Commits are single-writer: CURRENT is replaced via write-temp + atomic
 * rename, with a parent check beforehand (SURVEY.md §7.5 risk item). Data
 * files are never mutated — maintenance writes new files and commits a new
 * snapshot, so a reader holding a snapshot id sees a frozen file list
 * (snapshot isolation). This is the engine analog of the reference's
 * immutable/idempotent access doctrine (reference README.md:128-132).
 */
class MetaStore(val tableDir: String, val statsColumns: Seq[String],
                dataRootOverride: Option[String] = None) {

  /** Key column to build per-file bloom filters for (point-lookup pruning,
   * [[FileBloom]]); default = the leading stats column (the table key).
   * None disables bloom maintenance. */
  var bloomColumn: Option[String] = statsColumns.headOption

  /** False when this store writes into ANOTHER table's data directory
   * (a branch store, [[graft.ops.Branches]]): its snapshot log shares data
   * files with the owning table, so GC actions must never delete data files
   * through this handle — [[graft.ops.ExpireSnapshots]] skips file deletion
   * and [[graft.ops.RemoveOrphans]] refuses outright. */
  def ownsData: Boolean = dataRootOverride.isEmpty

  private val metaDir: JPath = Paths.get(tableDir, "meta")
  private val dataDir: JPath =
    dataRootOverride.map(Paths.get(_)).getOrElse(Paths.get(tableDir, "data"))
  Files.createDirectories(metaDir)
  Files.createDirectories(dataDir)
  Files.createDirectories(metaDir.resolve("lineage"))
  Files.createDirectories(metaDir.resolve("checkpoints"))

  private def currentPath = metaDir.resolve("CURRENT")

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentPath))
      Some(new String(Files.readAllBytes(currentPath), StandardCharsets.UTF_8).trim.toLong)
    else None

  def snapshot(id: Long): Snapshot =
    Json.readSnapshot(new String(
      Files.readAllBytes(metaDir.resolve(s"snap-$id.json")), StandardCharsets.UTF_8))

  def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshot)

  def allSnapshotIds: Seq[Long] = {
    val stream = Files.list(metaDir)
    try {
      val it = stream.iterator()
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("snap-") && name.endsWith(".json"))
          out += name.stripPrefix("snap-").stripSuffix(".json").toLong
      }
      out.sorted.toSeq
    } finally stream.close()
  }

  def entries(snapshotId: Long): Seq[DataFile] = {
    val snap = snapshot(snapshotId)
    snap.manifests.flatMap { m =>
      Json.readManifest(new String(
        Files.readAllBytes(metaDir.resolve(m)), StandardCharsets.UTF_8)).entries
    }
  }

  /** Equality-delete files live for `snapshotId` (empty = no deletes). Each
   * entry's parquet holds key values; `seq` = the delete's commit id. */
  def deleteEntries(snapshotId: Long): Seq[DataFile] = {
    val snap = snapshot(snapshotId)
    snap.deleteManifests.flatMap { m =>
      Json.readManifest(new String(
        Files.readAllBytes(metaDir.resolve(m)), StandardCharsets.UTF_8)).entries
    }
  }

  /** Snapshot-isolated scan: the file list is frozen at commit time. With a
   * non-empty evolution log the read goes through the evolution-aware path
   * (declared schema + per-era defaults, graft.ops.Evolve.scan) — that keeps
   * every maintenance rewrite (compact/cluster read through here) silently
   * MATERIALIZING evolved defaults into its output files. */
  def scan(spark: SparkSession, snapshotId: Long): DataFrame = {
    val snap = snapshot(snapshotId)
    if (snap.deleteManifests.nonEmpty)
      return graft.ops.Deletes.scan(spark, this, snapshotId)
    if (graft.ops.Evolve.evolutions(this).nonEmpty)
      return graft.ops.Evolve.scan(spark, this, snapshotId)
    // above the planning threshold the path listing is a Spark job over
    // manifest shards — the driver never parses K entries' stats/tuples
    // just to keep the path strings (PlanScan Scaladoc has the numbers)
    val paths =
      if (planDistributed(snap))
        PlanScan.listPaths(spark, this, snap)
      else entries(snapshotId).map(_.path)
    if (paths.isEmpty) emptyLike(spark)
    else spark.read.parquet(paths: _*)
  }

  /** Zero-row frame that still CARRIES THE TABLE SCHEMA when any historical
   * data file is reachable (footer-only read under a constant-false filter)
   * — so `scan().filter(col(...))` keeps working after an operation empties
   * the table (e.g. a whole-table partition-drop delete). A table that
   * never held data falls back to a schemaless empty frame. */
  private[graft] def emptyLike(spark: SparkSession): DataFrame = {
    // an evolution log declares the schema outright (a raw historical file
    // would carry its ERA's physical layout — pre-rename names, dropped
    // columns); without one any reachable file's footer is authoritative
    val evos = graft.ops.Evolve.evolutions(this)
    if (evos.nonEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.DataType.fromJson(evos.last.schemaAfterJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    val anyFile = allSnapshotIds.reverseIterator
      .flatMap(id => entries(id).iterator)
      .find(e => Files.exists(Paths.get(e.path)))
    anyFile match {
      case Some(e) => spark.read.parquet(e.path).filter(lit(false))
      case None => spark.emptyDataFrame
    }
  }

  def scanCurrent(spark: SparkSession): DataFrame =
    scan(spark, currentSnapshotId.getOrElse(sys.error(s"$tableDir: no current snapshot")))

  /** Time travel by wall clock: the newest snapshot committed at or before
   * `tsMs` (expired history is gone — pin a tag for durable reads). */
  def snapshotAsOf(tsMs: Long): Long = {
    val ids = allSnapshotIds.filter(id => snapshot(id).timestampMs <= tsMs)
    if (ids.isEmpty) sys.error(s"$tableDir: no snapshot at or before $tsMs")
    ids.max
  }

  def scanAsOf(spark: SparkSession, tsMs: Long): DataFrame =
    scan(spark, snapshotAsOf(tsMs))

  /** Above this many files (estimated O(1) from the snapshot summary),
   * scan PLANNING runs as a Spark job over manifest shards instead of a
   * driver-side parse of every entry ([[PlanScan]]). Default 100k files
   * ≈ a 12 TB table at 128 MB files — below it the driver parse is
   * single-digit-ms and job overhead would dominate; above it driver
   * planning time stays ~flat in K instead of linear. Overridable per
   * store, or process-wide via -Dgraft.plan.distributedThreshold. */
  var distributedPlanThreshold: Long =
    sys.props.get("graft.plan.distributedThreshold").map(_.toLong)
      .getOrElse(100000L)

  /** The one tier-selection decision (scan, scanPruned, partitionsTable,
   * FileBloom.compact all route through it — a drifted copy of the
   * predicate would silently plan on the wrong tier). */
  def planDistributed(snap: Snapshot): Boolean =
    PlanScan.estimatedFiles(this, snap) >= distributedPlanThreshold

  /** Zonemap scan: skip whole data files whose manifest min/max stats prove
   * they cannot match `preds` (see [[Pruning]]); result rows are identical to
   * `scan(...).filter(Pred.and(preds))` by construction. Plans distributed
   * above [[distributedPlanThreshold]]. */
  def scanPruned(spark: SparkSession, snapshotId: Long,
                 preds: Seq[Pred]): PrunedScan = {
    val snap = snapshot(snapshotId)
    if (planDistributed(snap))
      Pruning.scanDistributed(spark, this, snapshotId, snap, preds)
    else
      Pruning.scan(spark, this, snapshotId, entries(snapshotId), preds)
  }

  def scanCurrentPruned(spark: SparkSession, preds: Seq[Pred]): PrunedScan =
    scanPruned(spark,
      currentSnapshotId.getOrElse(sys.error(s"$tableDir: no current snapshot")), preds)

  /**
   * Metadata-only aggregate: row count and per-column min/max answered from
   * the MANIFEST alone — zero data files opened. The lakehouse classic
   * (Iceberg answers count(*)/min/max from manifests the same way); at
   * 100 TB this turns a full-table aggregate into a driver-side fold over
   * file entries. Only exact when no entry has nulls in `column` beyond the
   * recorded nullCount semantics: min/max stats ignore nulls, matching SQL
   * aggregate semantics.
   *
   * Refuses under LIVE equality deletes: manifest row counts include rows a
   * delete file masks, so the fold would silently over-count (Iceberg
   * disables count(*) pushdown under delete files for the same reason).
   * Retire the debt first ([[graft.ops.Deletes.materialize]] /
   * `expireInert`) or aggregate through a scan.
   */
  def statsAggregate(snapshotId: Long, column: String): (Long, Option[Long], Option[Long]) = {
    require(deleteEntries(snapshotId).isEmpty,
      s"statsAggregate: snapshot $snapshotId carries live equality deletes; " +
        "manifest counts would over-count masked rows (materialize deletes first)")
    val es = entries(snapshotId)
    val rows = es.map(_.rows).sum
    // min/max only when EVERY file carries a numeric stat for the column:
    // a file without one (written before an add/rename evolution, or with
    // non-numeric stats) may hold rows outside the partial range, so a
    // skip-the-gaps aggregate would be confidently wrong — None says
    // "recompute from data", never a narrower-than-true answer
    val mins = es.map(_.statLong(column, lower = true))
    val maxs = es.map(_.statLong(column, lower = false))
    (rows,
      if (es.isEmpty || mins.exists(_.isEmpty)) None else Some(mins.flatten.min),
      if (es.isEmpty || maxs.exists(_.isEmpty)) None else Some(maxs.flatten.max))
  }

  // ---- hidden partitioning ----
  private def specPath = metaDir.resolve("partition-spec.json")

  /** The table's hidden-partition spec, if declared ([[Partitioning]]). */
  def partitionSpec: Option[PartitionSpec] =
    if (Files.exists(specPath))
      Some(Json.mapper.readValue[PartitionSpec](
        new String(Files.readAllBytes(specPath), StandardCharsets.UTF_8)))
    else None

  /** Declare (or additively evolve) the partition spec. Existing field
   * names must keep their exact definition — files already carry tuples
   * under those names and the pruner trusts them; NEW fields only apply to
   * files written afterwards (older files lack the tuple entry and are
   * kept conservatively, the Iceberg spec-evolution rule). */
  def setPartitionSpec(spec: PartitionSpec): Unit = {
    partitionSpec.foreach { old =>
      val byName = old.fields.map(f => f.name -> f).toMap
      spec.fields.foreach { f =>
        byName.get(f.name).foreach { prev =>
          require(prev == f,
            s"partition field '${f.name}' already declared as $prev; " +
              "field definitions are immutable (add a new name instead)")
        }
      }
    }
    val tmp = metaDir.resolve(s"partition-spec.tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, Json.write(spec).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, specPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write a batch under `dir` honoring the partition spec when one is
   * declared (one tuple per output file, tuple in the path) — the write
   * path for every op that doesn't manage its own layout. */
  def writeData(df: DataFrame, dir: String): Unit = partitionSpec match {
    case Some(spec) => spec.write(df, dir)
    case None => df.write.mode("overwrite").parquet(dir)
  }

  // ---- declared sort order ----
  private def sortOrderPath = metaDir.resolve("sort-order.json")

  /** The table's declared cluster order, if any ([[SortOrder]]). */
  def sortOrder: Option[SortOrder] =
    if (Files.exists(sortOrderPath))
      Some(Json.mapper.readValue[SortOrder](
        new String(Files.readAllBytes(sortOrderPath), StandardCharsets.UTF_8)))
    else None

  /** Declare (or replace — unlike partition fields, a sort order carries no
   * per-file state, so redeclaring is always safe: the next cluster pass
   * simply rewrites toward the new order) the table's cluster order. */
  def setSortOrder(order: SortOrder): Unit = {
    require(order.rangeCols.nonEmpty,
      "sort order needs at least one range column (it is also the decay-trigger column)")
    require(Set("zorder", "hilbert")(order.curve),
      s"unknown curve '${order.curve}' (zorder|hilbert)")
    val tmp = metaDir.resolve(s"sort-order.tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, Json.write(order).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, sortOrderPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- metadata tables (Iceberg's table$files / table$snapshots analog) ----

  /** One row per data file of `snapshotId`: path, rows, size, sequence
   * number, partition tuple (map), and per-column stats (map of structs) —
   * the manifest AS a DataFrame, so layout questions ("rows per partition
   * tuple", "files under 10 MB", "min/max drift per column") are plain
   * Spark queries instead of driver loops. Driver-side construction is
   * O(files) — the same cost any metadata read pays. */
  def filesTable(spark: SparkSession, snapshotId: Long): DataFrame = {
    import org.apache.spark.sql.Encoders
    spark.createDataset(entries(snapshotId))(Encoders.product[DataFile]).toDF()
  }

  def filesTableCurrent(spark: SparkSession): DataFrame =
    filesTable(spark,
      currentSnapshotId.getOrElse(sys.error(s"$tableDir: no current snapshot")))

  /** One row per retained snapshot: id, parent, timestamp, operation,
   * manifest names, summary map, delete manifests — the history log AS a
   * DataFrame (ops/rows/bytes trends, commit cadence, operation mix). */
  def snapshotsTable(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Encoders
    spark.createDataset(allSnapshotIds.map(snapshot))(
      Encoders.product[Snapshot]).toDF()
  }

  /** One row per partition tuple of `snapshotId`: file/row/byte totals and
   * the seq range — Iceberg's `table$partitions` analog, answered from the
   * manifest alone (zero data IO). Files written without tuple
   * reconstruction group under the empty tuple; `max_seq - min_seq` spread
   * per tuple is the per-partition compaction-debt signal
   * [[graft.ops.AutoMaintain]] reads file-wise. */
  def partitionsTable(spark: SparkSession, snapshotId: Long): DataFrame = {
    // folded DRIVER-side over the already-loaded manifest entries: routing
    // the rollup through filesTable() single-thread-encodes every DataFile
    // into Catalyst rows first (measured 23.5 s at 10^6 entries in
    // bench/MetaScale) only to reduce them to ~|partitions| rows; the plain
    // Scala fold is one O(K) pass and only the tiny aggregate is encoded.
    // Above the planning threshold the fold runs per-shard in executors
    // (map-side combine to ~|partitions| rows each) — same rollup, no
    // driver entry list.
    val snap = snapshot(snapshotId)
    val rows =
      if (planDistributed(snap))
        PlanScan.partitionsFold(spark, this, snap)
      else entries(snapshotId).groupBy(_.partition).map { case (p, fs) =>
        (p, fs.size.toLong, fs.map(_.rows).sum, fs.map(_.sizeBytes).sum,
          fs.map(_.seq).min, fs.map(_.seq).max)
      }.toSeq
    import org.apache.spark.sql.Encoders
    spark.createDataset(rows)(
      Encoders.product[(Map[String, String], Long, Long, Long, Long, Long)])
      .toDF("partition", "n_files", "n_rows", "total_bytes",
        "min_seq", "max_seq")
  }

  def partitionsTableCurrent(spark: SparkSession): DataFrame =
    partitionsTable(spark,
      currentSnapshotId.getOrElse(sys.error(s"$tableDir: no current snapshot")))

  /** Fresh output directory for one maintenance pass. */
  def newDataDir(tag: String): String = {
    val d = dataDir.resolve(s"$tag-${UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(d)
    d.toString
  }

  /**
   * Collect manifest entries for every parquet file under `dir` (recursive):
   * per-file min/max/nullCount for `statsColumns` + row count, via ONE
   * column-pruned Spark scan grouped by `input_file_name()` — the distributed
   * analog of the reference's single-pass `featureRange` stats
   * (vector-like/src/main/java/vec/ml/FeatureRange.kt:14-33).
   */
  def collectStats(spark: SparkSession, dir: String): Seq[DataFile] = {
    // a PARTITIONED write of an empty batch produces zero files (the
    // dynamic-partition writer has no tuple to open a file for, unlike the
    // plain writer's schema-bearing empty part file) — an empty append must
    // commit zero entries, not crash schema inference
    val hasParquet = {
      val s = Files.walk(Paths.get(dir))
      try s.anyMatch(p => p.toString.endsWith(".parquet")) finally s.close()
    }
    if (!hasParquet) return Seq.empty
    val df = spark.read.parquet(dir)
    val present = statsColumns.filter(df.columns.contains)
    val numeric = present.filter { c =>
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }.toSet
    // bloom maintenance rides the SAME grouped pass as the stats: the
    // output dir is scanned once, with the per-file key bloom as one more
    // aggregate column (an r3 separate bloom pass re-read every maintenance
    // output and cost the scaling bench's cluster phase ~1.6x)
    val bloomKey = bloomColumn.filter(df.columns.contains)
    val aggs = present.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    } ++ Seq(count(lit(1)).as("_rows")) ++
      bloomKey.map(c => FileBloom.aggColumn(col(c))).toSeq
    val grouped = df
      .withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
    val rows = bloomKey match {
      case Some(_) =>
        // two consumers (bloom side-table write + driver stats collect) of
        // one data scan: cache the grouped rows — #files x ~16 KiB,
        // distributed — so the underlying output dir is read exactly once
        grouped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          FileBloom.writeShard(this, grouped.select(col("_file"), col("_bloom")))
          grouped.drop("_bloom").collect()
        } finally {
          grouped.unpersist()
          ()
        }
      case None => grouped.collect()
    }
    rows.map { r =>
      val rawPath = r.getAs[String]("_file")
      val path = normalizePath(rawPath)
      val stats = present.map { c =>
        c -> ColStat(
          Option(r.getAs[String](s"min_$c")).getOrElse(""),
          Option(r.getAs[String](s"max_$c")).getOrElse(""),
          numeric.contains(c),
          r.getAs[Long](s"nulls_$c"))
      }.toMap
      DataFile(path, r.getAs[Long]("_rows"), fileSize(path), stats,
        partition = Partitioning.tupleOf(path))
    }.toSeq.sortBy(_.path)
  }

  def normalizePath(p: String): String = MetaStore.decodePath(p)

  private def fileSize(path: String): Long = {
    val f = new java.io.File(path)
    if (f.exists()) f.length() else -1L
  }

  /** Max data-file entries per manifest shard. One giant JSON manifest
   * makes the driver's commit/read O(table files) in a single blob — at
   * 10^12 rows (~10^5-10^6 files at 128 MB) that is the known Iceberg
   * bottleneck Iceberg shards manifests for. Sharding keeps each manifest
   * bounded; `entries()` already concatenates over `snap.manifests`. */
  var manifestShardSize: Int = 10000

  /**
   * Atomically commit a new snapshot holding exactly `entries`.
   * Returns the new snapshot id.
   *
   * Cross-PROCESS safe, not just JVM-local. The id is always `parent + 1`
   * (parent = CURRENT at entry), claimed by an O_EXCL (`CREATE_NEW`) create
   * of `snap-<id>.json` — so the id claim IS the check-and-set: CURRENT can
   * only ever advance to `CURRENT + 1`, and of N writers racing from the
   * same base the filesystem admits exactly one; every loser (including one
   * holding an arbitrarily stale base, whose `parent + 1` file already
   * exists) gets [[ConcurrentCommitException]] and may re-read + retry.
   * Snapshot ids therefore stay CONTIGUOUS with `parentId == id - 1` by
   * construction — the invariant [[graft.streaming.ChangeFeed]]'s
   * retention-gap detection relies on. One corner needs the post-claim
   * re-check of CURRENT: a claim of an id that expiry deleted earlier (a
   * writer stale by more than the retention window) wins CREATE_NEW against
   * a ghost — the CAS sees CURRENT ≠ parent, deletes the claim, and throws.
   * A commit that crashes between claim and CURRENT rename leaves a
   * snap-file > CURRENT that would block the next writer's claim;
   * [[RemoveOrphans]] GCs such debris behind its age floor.
   */
  /** @param deletes equality-delete entries for the NEW snapshot:
   *   `None` (the default) inherits the parent's delete manifests verbatim —
   *   the right behavior for every op that doesn't touch deletes (append,
   *   compact with carried files, merge, evolve): rewritten files get a new
   *   `seq` above every delete so deletes are inert on them, while
   *   carried-over files keep their old `seq` and stay covered.
   *   `Some(xs)` writes a fresh delete-manifest set (add a delete, expire
   *   inert ones, restore a rollback target's set). */
  def commit(operation: String, entries: Seq[DataFile],
             summary: Map[String, String] = Map.empty,
             deletes: Option[Seq[DataFile]] = None,
             expectedParent: Option[Long] = None): Long = synchronized {
    val parent = currentSnapshotId.getOrElse(-1L)
    expectedParent.foreach { p =>
      if (p != parent) throw new ConcurrentCommitException(
        s"commit planned against snapshot $p but current is $parent")
    }
    val id = if (parent == -1L) 1L else parent + 1L
    // stamp data sequence numbers: an entry carried from an older snapshot
    // arrives with its original seq (> 0, from the manifest) and keeps it; a
    // NEW entry (collectStats constructs seq = 0) gets this commit's id —
    // unless the parent already tracked the path (legacy seq-0 manifests
    // stay 0 = oldest, conservatively covered by every delete)
    lazy val parentSeq: Map[String, Long] =
      if (parent == -1L) Map.empty
      else this.entries(parent).map(e => e.path -> e.seq).toMap
    val stamped = entries.map { e =>
      if (e.seq > 0L) e
      else e.copy(seq = parentSeq.getOrElse(e.path, id))
    }
    val shards = if (stamped.isEmpty) Seq(stamped) else
      stamped.grouped(manifestShardSize).toSeq
    val manifestNames = shards.map(writeManifest(id, _))
    publish(operation, parent, id, manifestNames, manifestNames,
      deleteManifestNames(parent, id, deletes),
      deletes.isDefined,
      summary ++ Map("files" -> stamped.size.toString,
                     "rows" -> stamped.map(_.rows).sum.toString,
                     "bytes" -> stamped.map(_.sizeBytes).sum.toString))
  }

  /**
   * O(churn) commit: reuse every parent manifest untouched by the change —
   * the Iceberg manifest-reuse discipline. `commit` rewrites the COMPLETE
   * file list (O(table files) of driver JSON per commit — fine for full
   * rewrites like a cluster pass, ruinous for a streaming append against
   * 10^5-10^6 files); this publishes a snapshot as parent manifests minus
   * `removedPaths` plus a fresh manifest for `added`:
   *
   *  - pure append / metadata-only op (`removedPaths` empty): NO parent
   *    manifest is read or rewritten — commit cost is O(added), manifests
   *    shared structurally with the parent;
   *  - partial rewrite (compact/merge): only manifests CONTAINING a removed
   *    path are rewritten (minus those paths); disjoint shards are reused.
   *
   * Shared manifests are immutable and GC'd by name-set difference
   * (ExpireSnapshots), same as shared data files. Many delta commits
   * accumulate small manifests; [[compactManifests]] re-shards.
   *
   * @param deletes REPLACE the delete-file set wholesale (rewrites /
   *   rollback / retirement). The caller planned that set against a specific
   *   parent — pass `expectedParent` alongside, or an interleaved delete
   *   commit is silently clobbered.
   * @param addedDeletes APPEND these delete files to the parent's live set,
   *   stamped `seq` = this commit's id, with the carry-forward read INSIDE
   *   the commit section. Callers must NOT pre-read the parent's delete set
   *   or pre-stamp seq themselves: between that read and the commit another
   *   writer can land, and the stale union either loses the interleaved
   *   delete or stamps a seq below the actual id (uncovered rows). On an
   *   empty table they are dropped — there is nothing older to mask.
   * @param expectedParent optimistic-concurrency check: throw
   *   [[ConcurrentCommitException]] (retryable) if the current snapshot is
   *   no longer this — for commits whose removedPaths / delete set were
   *   planned from a read of that snapshot.
   */
  def commitDelta(operation: String, added: Seq[DataFile],
                  removedPaths: Set[String] = Set.empty,
                  summary: Map[String, String] = Map.empty,
                  deletes: Option[Seq[DataFile]] = None,
                  addedDeletes: Seq[DataFile] = Nil,
                  expectedParent: Option[Long] = None): Long = synchronized {
    require(deletes.isEmpty || addedDeletes.isEmpty,
      "commitDelta: pass deletes (replace) or addedDeletes (append), not both")
    val parent = currentSnapshotId.getOrElse(-1L)
    expectedParent.foreach { p =>
      if (p != parent) throw new ConcurrentCommitException(
        s"commit planned against snapshot $p but current is $parent")
    }
    val id = if (parent == -1L) 1L else parent + 1L
    val effDeletes: Option[Seq[DataFile]] =
      if (addedDeletes.nonEmpty && parent != -1L)
        Some(deleteEntries(parent) ++
          addedDeletes.map(d => if (d.seq > 0L) d else d.copy(seq = id)))
      else deletes
    val stampedAdded = added.map(e => if (e.seq > 0L) e else e.copy(seq = id))
    val parentManifests = if (parent == -1L) Nil else snapshot(parent).manifests
    var removedRows = 0L; var removedBytes = 0L; var removedFiles = 0L
    // ONE JSON parse per parent manifest: classify and rewrite in the same
    // pass (a second read per touched shard doubled the dominant cost of a
    // partial rewrite at the 10^5-file regime — measured by MetaScale)
    val reused = Seq.newBuilder[String]
    val rewrittenNames = Seq.newBuilder[String]
    var rewrittenCount = 0
    // path-set fast path: a cached shard containing none of the removed
    // paths is reused by name without a JSON parse (exact, not a summary).
    // Above the planning threshold, UNCACHED shards are classified by a
    // Spark job instead of a driver parse-all (PlanScan.touchedShards —
    // at 10^7 entries a cold/over-budget cache made every partial rewrite
    // parse 1000 shards driver-side, 14 s measured in MetaScale); the
    // driver then parses only the touched shards. Opportunistic: without
    // an active session (pure-metadata callers) the driver parse stands.
    val jobClassified: Option[Set[String]] =
      if (removedPaths.nonEmpty &&
          parentManifests.size.toLong * manifestShardSize >= distributedPlanThreshold)
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .map { spark =>
            val unknown = parentManifests.filter(m => manifestPathSets.get(m) == null)
            PlanScan.touchedShards(spark, this, unknown, removedPaths)
          }
      else None
    def mayContainRemoved(m: String): Boolean =
      manifestPathSets.get(m) match {
        case null => jobClassified match {
          case Some(touched) => touched.contains(m) // job-exact
          case None => true // unknown shard: must parse
        }
        case s => removedPaths.exists(s.contains)
      }
    parentManifests.foreach { m =>
      if (removedPaths.isEmpty || !mayContainRemoved(m)) reused += m
      else {
        val es = readManifestEntries(m)
        if (es.forall(e => !removedPaths.contains(e.path))) reused += m
        else {
          rewrittenCount += 1
          val kept = es.filter { e =>
            val out = removedPaths.contains(e.path)
            if (out) { removedRows += e.rows; removedBytes += e.sizeBytes; removedFiles += 1 }
            !out
          }
          if (kept.nonEmpty) rewrittenNames += writeManifest(id, kept)
        }
      }
    }
    val addedNames = stampedAdded.grouped(manifestShardSize).map(writeManifest(id, _)).toSeq
    val reusedNames = reused.result()
    val ownNames = rewrittenNames.result() ++ addedNames
    val manifestNames = reusedNames ++ ownNames
    // totals incrementally from the parent's recorded summary (avoids the
    // O(table) manifest read the delta commit exists to skip)
    def parentCount(k: String): Long =
      if (parent == -1L) 0L
      else snapshot(parent).summary.get(k).flatMap(_.toLongOption).getOrElse {
        val es = this.entries(parent)
        k match {
          case "files" => es.size.toLong
          case "rows" => es.map(_.rows).sum
          case _ => es.map(_.sizeBytes).sum
        }
      }
    publish(operation, parent, id, manifestNames, ownNames,
      deleteManifestNames(parent, id, effDeletes),
      effDeletes.isDefined,
      summary ++ Map(
        "files" -> (parentCount("files") - removedFiles + stampedAdded.size).toString,
        "rows" -> (parentCount("rows") - removedRows + stampedAdded.map(_.rows).sum).toString,
        "bytes" -> (parentCount("bytes") - removedBytes + stampedAdded.map(_.sizeBytes).sum).toString,
        "manifestsReused" -> reusedNames.size.toString,
        "manifestsRewritten" -> rewrittenCount.toString))
  }

  /** Re-shard the current snapshot's manifests into full-size shards
   * (metadata-only): many delta commits leave one small manifest each; this
   * folds them back to ceil(files / manifestShardSize) shards. Returns
   * (new snapshot id, manifests before, after). */
  def compactManifests(): (Long, Int, Int) = MetaStore.withCommitRetry() {
    val cur = currentSnapshotId.getOrElse(sys.error(s"$tableDir: no current snapshot"))
    val before = snapshot(cur).manifests.size
    // CAS on the snapshot whose full entry list we serialized: without it an
    // append landing between entries(cur) and the commit would be silently
    // clobbered by this stale re-shard (retry re-reads and re-shards)
    val id = commit("rewrite-manifests", entries(cur),
      Map("manifestsBefore" -> before.toString),
      expectedParent = Some(cur))
    (id, before, snapshot(id).manifests.size)
  }

  /** Seed an EMPTY store with `from`'s snapshot `snapshotId`, kept under the
   * SAME id — the zero-copy branch fork ([[graft.ops.Branches]]): entries
   * (and the equality-delete set) point at `from`'s files with their data
   * sequence numbers carried verbatim. Preserving the id matters twice:
   * every carried seq is ≤ `snapshotId`, so fork-local commits (minted at
   * `snapshotId + 1`, `+2`, …) stay strictly above them — the invariant
   * equality-delete coverage (`seq < delete.seq`) relies on — and a
   * fast-forward replay onto the parent lines up id-for-id, keeping one
   * coherent sequence space across both logs. */
  def seedFork(from: MetaStore, snapshotId: Long): Long = synchronized {
    require(currentSnapshotId.isEmpty, s"$tableDir: seedFork on a non-empty store")
    val es = from.entries(snapshotId)
    val shards = if (es.isEmpty) Seq(es) else es.grouped(manifestShardSize).toSeq
    val names = shards.map(writeManifest(snapshotId, _))
    val dels = from.deleteEntries(snapshotId)
    publish("branch-fork", -1L, snapshotId, names, names,
      deleteManifestNames(-1L, snapshotId, if (dels.isEmpty) None else Some(dels)),
      dels.nonEmpty,
      Map("forkOf" -> from.tableDir, "forkSnapshot" -> snapshotId.toString,
        "files" -> es.size.toString, "rows" -> es.map(_.rows).sum.toString,
        "bytes" -> es.map(_.sizeBytes).sum.toString))
  }

  /** Manifest shards are IMMUTABLE per name, so each one's path SET can be
   * cached the first time it is written or parsed; a partial rewrite then
   * reuses every shard containing none of the removed paths WITHOUT
   * parsing its JSON. (A [min,max]-range summary was tried first and is
   * useless under hidden partitioning: the codec/window path segments
   * interleave within every shard, so every range spans the whole path
   * space.) The sets hold REFERENCES to the entry path strings (~40 B/path
   * of overhead), capped globally; past the cap a shard simply stays
   * uncached and is parsed — the cache is never a correctness input.
   * Cold-cache commits (a fresh driver) parse everything once and are
   * cached from then on — the long-lived maintenance-loop driver pays
   * O(touched shards) per partial rewrite, not O(table shards)
   * (MetaScale measured parse-all at 3.7-5.5 s per rewrite at 10^6
   * entries). */
  private[graft] val manifestPathSets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()
  private[graft] val manifestPathSetBudget = new java.util.concurrent.atomic.AtomicLong(4000000L)

  /** Reserve budget, build, publish via putIfAbsent. Every reservation that
   * does NOT end with this thread's set living in the map is refunded —
   * failed admission and lost putIfAbsent races alike (ADVICE r4: the old
   * version leaked both, so one cap-exceeding burst drove the budget
   * permanently negative and the cache silently stopped admitting). */
  private def cachePathSet(name: String, shard: Seq[DataFile]): Unit =
    if (!manifestPathSets.containsKey(name)) {
      if (manifestPathSetBudget.addAndGet(-shard.size) < 0L) {
        manifestPathSetBudget.addAndGet(shard.size.toLong) // refund: not admitted
      } else {
        val s = new java.util.HashSet[String](shard.size * 2)
        shard.foreach(e => s.add(e.path))
        if (manifestPathSets.putIfAbsent(name, s) != null)
          manifestPathSetBudget.addAndGet(shard.size.toLong) // lost race: refund
      }
      ()
    } else ()

  /** Release a deleted manifest's cached path set (expiry / failed-commit
   * cleanup) so the budget recycles; names are UUIDs and never reused, so
   * a missed call only costs budget, never correctness. */
  private[graft] def forgetManifest(name: String): Unit = {
    val old = manifestPathSets.remove(name)
    if (old != null) manifestPathSetBudget.addAndGet(old.size.toLong)
    ()
  }

  private[graft] def readManifestEntries(name: String): Seq[DataFile] = {
    val es = Json.readManifest(new String(
      Files.readAllBytes(metaDir.resolve(name)), StandardCharsets.UTF_8)).entries
    cachePathSet(name, es)
    es
  }

  private def writeManifest(id: Long, shard: Seq[DataFile]): String = {
    val name = s"manifest-$id-${UUID.randomUUID().toString.take(8)}.json"
    Files.write(metaDir.resolve(name),
      Json.write(ManifestFile(shard)).getBytes(StandardCharsets.UTF_8))
    cachePathSet(name, shard)
    name
  }

  /** Delete manifests: inherited by NAME (immutable, shared across
   * snapshots like data files), or rewritten when the op changes the set. */
  private def deleteManifestNames(parent: Long, id: Long,
                                  deletes: Option[Seq[DataFile]]): Seq[String] =
    deletes match {
      case None =>
        if (parent == -1L) Nil else snapshot(parent).deleteManifests
      case Some(ds) if ds.isEmpty => Nil
      case Some(ds) =>
        ds.grouped(manifestShardSize).map { shard =>
          val name = s"delmanifest-$id-${UUID.randomUUID().toString.take(8)}.json"
          Files.write(metaDir.resolve(name),
            Json.write(ManifestFile(shard)).getBytes(StandardCharsets.UTF_8))
          name
        }.toSeq
    }

  /** Claim snap-<id>.json (O_EXCL), CAS CURRENT, atomic-rename publish.
   * `ownManifests` / `ownDeletes` = files THIS commit wrote (cleaned up on
   * failure); reused/inherited names are never touched. */
  private def publish(operation: String, parent: Long, id: Long,
                      manifestNames: Seq[String], ownManifests: Seq[String],
                      delManifestNames: Seq[String], ownDeletes: Boolean,
                      summary: Map[String, String]): Long = {
    val snap = Snapshot(id, parent, System.currentTimeMillis(), operation,
      manifestNames, summary, delManifestNames)
    val snapPath = metaDir.resolve(s"snap-$id.json")
    def dropClaim(): Unit = {
      Files.deleteIfExists(snapPath)
      ownManifests.foreach { n =>
        Files.deleteIfExists(metaDir.resolve(n)); forgetManifest(n)
      }
      if (ownDeletes)
        delManifestNames.foreach(n => Files.deleteIfExists(metaDir.resolve(n)))
    }
    try
      Files.write(snapPath, Json.write(snap).getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        ownManifests.foreach { n =>
          Files.deleteIfExists(metaDir.resolve(n)); forgetManifest(n)
        }
        if (ownDeletes)
          delManifestNames.foreach(n => Files.deleteIfExists(metaDir.resolve(n)))
        throw new ConcurrentCommitException(
          s"snapshot id $id was claimed by another writer (parent $parent)")
    }
    val tmp = metaDir.resolve(s"CURRENT.tmp-${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    // check-and-set: re-read CURRENT after winning the id claim
    val nowParent = currentSnapshotId.getOrElse(-1L)
    if (nowParent != parent) {
      dropClaim()
      Files.deleteIfExists(tmp)
      throw new ConcurrentCommitException(
        s"CURRENT moved $parent -> $nowParent during commit of snapshot $id")
    }
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    id
  }

  // ---- lineage side-table ----
  def appendLineage(spark: SparkSession, recs: Seq[LineageRecord]): Unit = {
    if (recs.isEmpty) return
    import spark.implicits._
    // unique subdir per batch (same discipline as the blooms side-table):
    // concurrent writers — racing merges/appends are a supported shape —
    // must not share one FileOutputCommitter _temporary dir, where the
    // first job to commit deletes it and aborts the others mid-task
    val out = metaDir.resolve("lineage")
      .resolve(UUID.randomUUID().toString.take(12))
    recs.toDS().write.mode("overwrite").parquet(out.toString)
  }

  def lineage(spark: SparkSession): DataFrame = {
    val dir = metaDir.resolve("lineage")
    val hasData = {
      val s = Files.walk(dir)
      try s.anyMatch(_.toString.endsWith(".parquet")) finally s.close()
    }
    // recursive lookup reads both layouts: flat legacy files and the
    // per-batch subdirs appendLineage writes now
    if (hasData) spark.read.option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    else spark.emptyDataFrame
  }

  /** Lineage shard count (per-batch subdirs + legacy flat files) — the
   * [[compactLineage]] trigger. */
  def lineageShardCount: Int = {
    val dir = metaDir.resolve("lineage")
    if (!Files.isDirectory(dir)) return 0
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.count(p =>
        Files.isDirectory(p) || p.toString.endsWith(".parquet"))
    } finally s.close()
  }

  /** Fold the per-batch lineage subdirs into ONE (rows preserved): each
   * append/merge/maintenance batch writes its own subdir so concurrent
   * writers never share a committer dir, which leaves one dir per batch —
   * a long-running stream accumulates unbounded metadata file count.
   * Captured-first like FileBloom.compact: a shard added mid-fold is
   * neither folded nor deleted. Lineage is diagnostics; a reader racing
   * the swap may briefly see duplicate or partial rows. Returns
   * (shards before, after). */
  def compactLineage(spark: SparkSession): (Int, Int) = {
    val dir = metaDir.resolve("lineage")
    if (!Files.isDirectory(dir)) return (0, 0)
    val shards = {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          Files.isDirectory(p) || p.toString.endsWith(".parquet")).toSeq
      } finally s.close()
    }
    if (shards.size <= 1) return (shards.size, shards.size)
    val out = dir.resolve(UUID.randomUUID().toString.take(12))
    spark.read.option("recursiveFileLookup", "true")
      .parquet(shards.map(_.toString): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(out.toString)
    shards.foreach { p =>
      if (Files.isDirectory(p)) {
        val w = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } finally w.close()
      } else Files.deleteIfExists(p)
    }
    (shards.size, 1)
  }

  // ---- checkpoints (resumable maintenance) ----
  def checkpointDir(runId: String): JPath = {
    val d = metaDir.resolve("checkpoints").resolve(runId)
    Files.createDirectories(d)
    d
  }

  def markDone(runId: String, item: String): Unit =
    Files.write(checkpointDir(runId).resolve(s"done-$item"), Array.emptyByteArray)

  def isDone(runId: String, item: String): Boolean =
    Files.exists(checkpointDir(runId).resolve(s"done-$item"))

  /** Read back a per-item payload written by [[saveItemResult]]. */
  def saveItemResult(runId: String, item: String, payload: String): Unit =
    Files.write(checkpointDir(runId).resolve(s"result-$item"),
      payload.getBytes(StandardCharsets.UTF_8))

  def itemResult(runId: String, item: String): Option[String] = {
    val p = checkpointDir(runId).resolve(s"result-$item")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }
}

/** Thrown when two writers race a commit; the loser's snapshot id claim or
 * CURRENT check-and-set failed and nothing was published. Safe to retry
 * after re-reading the table state. */
class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

object MetaStore {
  /** Stats columns for the canonical clip table. */
  val ClipStatsColumns: Seq[String] = Seq("clip_id", "sr_hz", "dur_ms", "codec")

  /** `input_file_name()` / `_metadata.file_path` return URI-ENCODED file
   * URIs (space → %20, '%' → %25, ...); manifest paths are the DECODED
   * filesystem form java.io.File sees. Every read-back of those columns
   * must go through THIS decoder, or tuple parsing, compact bin lookups,
   * bloom-path joins, and position-delete identity silently miss files
   * under partition dirs whose values contain encodable characters. */
  def decodePath(p: String): String =
    if (p == null || !p.startsWith("file:")) p
    else {
      // fast path: no '%' means nothing to decode — scheme strip only.
      // This runs per ROW inside withPos reads; URI parsing every row
      // would dominate the scan for the overwhelmingly common case of
      // partition values without encodable characters.
      if (p.indexOf('%') < 0) {
        var i = 5 // after "file:"
        while (i < p.length && p.charAt(i) == '/') i += 1
        "/" + p.substring(i)
      } else try new java.net.URI(p).getPath
      catch { case _: java.net.URISyntaxException =>
        "/+".r.replaceFirstIn(p.stripPrefix("file:"), "/") }
    }

  def forClips(tableDir: String): MetaStore = new MetaStore(tableDir, ClipStatsColumns)

  /** Retry `body` across commit races with jittered backoff. ONLY for
   * operations whose body re-reads table state and whose effect is valid
   * against any newer snapshot (append: pure add; delete: predicate
   * re-resolution IS the correct serialization). Rewrites (compact/
   * cluster/merge) must NOT blind-retry — their planned inputs may have
   * been rewritten away; the caller re-plans instead. */
  def withCommitRetry[T](maxAttempts: Int = 5)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep((10L << attempt) +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(25))
          attempt += 1
      }
    }
    sys.error("unreachable")
  }
}
