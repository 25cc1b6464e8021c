package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/**
 * Global row ids in a declared total order, minted scale-safely.
 *
 * The reference's positional column-concat join (`cursors/macros/Join.kt:11-27`)
 * and per-column shard volumes (`cursor/src/test/java/cursors/NinetyDegreeTest.kt:97-137`)
 * identify rows by physical position. A distributed engine has no global
 * position, so shards that must rejoin positionally carry an explicit row id
 * minted once at write time. An unpartitioned `Window.orderBy` would compute
 * it on ONE task; instead: range-partition on the order key, sort within
 * partitions, then `zipWithIndex` (Spark's two-pass per-partition-count +
 * offset scheme) — every stage fully parallel.
 */
object RowId {

  /** Append a 1-based `name` column numbering `df`'s rows in `order`.
   * Deterministic when `order` is a total order (unique keys): range
   * boundaries only move rows between partitions, never change rank. */
  def withRowId(df: DataFrame, name: String, order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
