package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.table.{Json, MetaStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One add-column evolution: the files captured here existed BEFORE the
 * column did, so on read they take `defaultSql`; files written after carry
 * the column physically (including genuine NULLs, which are preserved).
 * `schemaAfterJson` is the declared table schema from this evolution on. */
final case class Evolution(
    column: String,
    typeDdl: String,
    defaultSql: String,
    schemaAfterJson: String,
    paths: Seq[String])

final case class EvolutionLog(evolutions: Seq[Evolution])

/**
 * Additive schema evolution with Iceberg-style initial defaults, without
 * rewriting a single data file: an `addColumn` commit records (column, type,
 * default, the CURRENT file list) in `meta/evolutions.json`. Readers group a
 * snapshot's files by which evolutions they predate and fill the default
 * only for those groups — a file that physically lacks the column reads as
 * all-NULL there, so `coalesce(col, default)` fills exactly the pre-evolution
 * rows; post-evolution files keep their values, explicit NULLs included.
 *
 * Self-healing: Compact/Cluster read through [[MetaStore.scan]], so their
 * rewrites MATERIALIZE the default into the new files, which then drop out
 * of every evolution's path set — the log's effective size shrinks as
 * maintenance runs. (At 10^5-10^6 files the sidecar should shard like the
 * manifests do; same bound, same fix, noted in MetaStore.manifestShardSize.)
 *
 * The reference's `.meta` sidecar re-declares column types per volume
 * (cursor/src/main/java/cursors/io/ISAMCursor.kt:175-211) but has no
 * add-column story; this supplies it Spark-first.
 */
object Evolve {

  private def logPath(store: MetaStore) =
    Paths.get(store.tableDir, "meta", "evolutions.json")

  /** mtime-guarded parse cache: every MetaStore.scan consults the log, and
   * a maintenance pass issues MANY scans — re-parsing an O(files) JSON
   * sidecar per scan is avoidable rework. Key = table dir; entry is
   * invalidated whenever the file's (mtime, size) changes (the atomic
   * rename in addColumn always bumps mtime). */
  private val logCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Seq[Evolution])]()

  def evolutions(store: MetaStore): Seq[Evolution] = {
    val p = logPath(store)
    if (!Files.exists(p)) return Seq.empty
    val mtime = Files.getLastModifiedTime(p).toMillis
    val size = Files.size(p)
    val cached = logCache.get(store.tableDir)
    if (cached != null && cached._1 == mtime && cached._2 == size) return cached._3
    val parsed = Json.mapper.readValue[EvolutionLog](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).evolutions
    logCache.put(store.tableDir, (mtime, size, parsed))
    parsed
  }

  /**
   * Add `column` of `typeDdl` (Spark DDL, e.g. "double") with an initial
   * default (a SQL expression over literals). Metadata-only: commits a new
   * snapshot with the SAME data files.
   */
  def addColumn(spark: SparkSession, store: MetaStore, column: String,
                typeDdl: String, defaultSql: String): Long =
    graft.table.MetaStore.withCommitRetry() {
    val snapId = store.currentSnapshotId.getOrElse(sys.error("evolve: empty table"))
    val entries = store.entries(snapId)
    val cur = store.scan(spark, snapId)
    require(!cur.columns.contains(column), s"column $column already exists")
    val after = StructType(cur.schema.fields :+
      org.apache.spark.sql.types.StructField(
        column, org.apache.spark.sql.types.DataType.fromDDL(typeDdl),
        nullable = true))
    // pre-evolution paths = files reachable from ANY live snapshot, not just
    // CURRENT: a pinned tag or rollback target may reference files already
    // rewritten away from the head — those files also predate the column, and
    // omitting them would make Refs.scanTag read NULL instead of the default
    // after this evolution (latest-schema-wins contract)
    val prePaths = store.allSnapshotIds.flatMap(store.entries)
      .map(_.path).distinct.toVector
    val evo = Evolution(column, typeDdl, defaultSql, after.json, prePaths)
    val all = EvolutionLog((evolutions(store) :+ evo).toVector)
    // commit FIRST, then publish the log atomically (temp + rename, like
    // CURRENT): a crash between the two leaves a harmless no-op "evolve"
    // snapshot, never a log that retro-actively rewrites pinned reads, and
    // never a torn evolutions.json that would fail every subsequent scan.
    // expectedParent: a file appended between the prePaths capture and this
    // commit would be misclassified as post-evolution (NULL instead of the
    // default) — the CAS fails instead and the retry recaptures.
    val id = store.commitDelta("evolve", Nil, summary = Map(
      "column" -> column, "type" -> typeDdl, "default" -> defaultSql),
      expectedParent = Some(snapId))
    val tmp = logPath(store).resolveSibling(
      s"evolutions.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp,
      Json.mapper.writeValueAsString(all).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, logPath(store),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /**
   * Evolution-aware read of an arbitrary file subset: group files by the SET
   * of evolutions they predate (at most one group per era in practice), read
   * each group under the declared schema (absent columns -> NULL), fill that
   * group's defaults, and union. Rows are identical to a full
   * rewrite-on-evolve, at zero write cost. Used by [[MetaStore.scan]] AND by
   * direct-file maintenance readers (per-bin compaction), so every rewrite
   * materializes the defaults regardless of which path it reads through.
   */
  def readFiles(spark: SparkSession, store: MetaStore,
                files: Seq[graft.table.DataFile]): DataFrame = {
    val evos = evolutions(store)
    if (evos.isEmpty) return spark.read.parquet(files.map(_.path): _*)
    val declared = org.apache.spark.sql.types.DataType.fromJson(
      evos.last.schemaAfterJson).asInstanceOf[StructType]
    val evoSets = evos.map(_.paths.toSet)
    val groups = files.groupBy(f => evoSets.map(_.contains(f.path)))
    groups.map { case (flags, fs) =>
      val base = spark.read.schema(declared).parquet(fs.map(_.path): _*)
      evos.zip(flags).foldLeft(base) {
        case (df, (e, predates)) =>
          if (predates)
            df.withColumn(e.column,
              coalesce(col(e.column), expr(e.defaultSql).cast(e.typeDdl)))
          else df
      }
    }.reduce(_.unionByName(_))
  }

  /** Evolution-aware snapshot scan (see [[readFiles]]). */
  def scan(spark: SparkSession, store: MetaStore, snapshotId: Long): DataFrame = {
    val entries = store.entries(snapshotId)
    if (entries.isEmpty) spark.emptyDataFrame
    else readFiles(spark, store, entries)
  }
}
