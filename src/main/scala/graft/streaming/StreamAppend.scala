package graft.streaming

import graft.ops.Append
import graft.table.MetaStore
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming lakehouse ingest: a Structured Streaming source lands in the
 * MetaStore table one atomic snapshot per micro-batch.
 *
 * Exactly-once without a transactional sink: `foreachBatch` is at-least-once
 * across restarts, so each commit records its micro-batch id in the snapshot
 * summary (`streamBatchId`) and a replayed batch is detected against the
 * snapshot log and skipped — the table's own commit history is the
 * idempotence ledger, the same trick Iceberg/Delta streaming sinks use.
 * Combined with the store's atomic CURRENT swap, readers see each batch
 * exactly once or not yet, never partially.
 */
object StreamAppend {

  /** Batch ids already committed to `store` by any streaming query. */
  def committedBatchIds(store: MetaStore): Set[Long] =
    store.allSnapshotIds.map(store.snapshot)
      .flatMap(_.summary.get("streamBatchId"))
      .map(_.toLong).toSet

  /** Commit one micro-batch; no-op if `batchId` was already committed. */
  def commitBatch(store: MetaStore, batch: DataFrame, batchId: Long): Unit = {
    if (committedBatchIds(store).contains(batchId)) return // restart replay
    Append.run(batch.sparkSession, store, batch,
      Map("streamBatchId" -> batchId.toString))
  }

  /** Start the ingest query (micro-batch; caller owns stop/await). */
  def start(store: MetaStore, source: DataFrame, checkpointDir: String,
            queryName: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        commitBatch(store, batch.toDF(), batchId)
      }
      .start()
}
