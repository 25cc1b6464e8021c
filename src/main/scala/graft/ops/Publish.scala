package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.table.{Json, MetaStore}

final case class PublishResult(
    snapshotId: Long,
    files: Int,
    rows: Long,
    bytes: Long,
    destDir: String)

/**
 * Dataset publication: export one snapshot (by id or tag) as a SELF-CONTAINED
 * plain-parquet directory a training job can consume with `spark.read.parquet`
 * — no metastore, no manifest reader, no library dependency on the consumer
 * side. The export is a file-level copy of the snapshot's frozen file list
 * (snapshot isolation makes this safe against concurrent maintenance), plus a
 * small `_PUBLISHED.json` provenance record (source table, snapshot id, row /
 * byte counts) so the consumer can trace the dataset back to its lineage.
 *
 * This is the hand-off step of the lakehouse story: maintenance churns the
 * live table; training runs consume immutable published snapshots pinned by
 * tags ([[Refs]]).
 */
object Publish {

  def run(store: MetaStore, snapshotId: Long, destDir: String): PublishResult = {
    val entries = store.entries(snapshotId)
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    entries.zipWithIndex.foreach { case (e, i) =>
      Files.copy(Paths.get(e.path),
        dest.resolve(f"part-$i%05d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val rows = entries.map(_.rows).sum
    val bytes = entries.map(_.sizeBytes).sum
    Files.write(dest.resolve("_PUBLISHED.json"),
      Json.mapper.writeValueAsString(Map(
        "sourceTable" -> store.tableDir,
        "snapshotId" -> snapshotId.toString,
        "files" -> entries.size.toString,
        "rows" -> rows.toString,
        "bytes" -> bytes.toString)).getBytes(StandardCharsets.UTF_8))
    PublishResult(snapshotId, entries.size, rows, bytes, destDir)
  }

  def runTag(store: MetaStore, tag: String, destDir: String): PublishResult =
    run(store, Refs.snapshotFor(store, tag), destDir)
}
