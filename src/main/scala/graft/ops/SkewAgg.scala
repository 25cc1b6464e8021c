package graft.ops

import graft.keys.Keys
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Two-phase salted aggregation for skewed keys (north_star: "salting for
 * skewed codec/dur_ms hot partitions"; the reference's MD4-bucket trick,
 * cursor/src/main/java/cursors/Clusters.kt:132-140, generalized).
 *
 * Phase 1 groups on (key, salt) so the hot key's rows spread over `buckets`
 * reducers; phase 2 re-aggregates the partial results on key alone. Works
 * for any algebraic aggregate expressible as (partial, merge) pairs — here
 * count/sum/min/max, which cover the engine's stats passes.
 */
object SkewAgg {

  final case class Agg(partial: Column => Column, merge: Column => Column,
                       src: String, name: String)

  def count(name: String): Agg =
    Agg(_ => org.apache.spark.sql.functions.count(lit(1)),
      org.apache.spark.sql.functions.sum, "", name)
  def sum(src: String, name: String): Agg =
    Agg(c => org.apache.spark.sql.functions.sum(c),
      org.apache.spark.sql.functions.sum, src, name)
  def min(src: String, name: String): Agg =
    Agg(c => org.apache.spark.sql.functions.min(c),
      org.apache.spark.sql.functions.min, src, name)
  def max(src: String, name: String): Agg =
    Agg(c => org.apache.spark.sql.functions.max(c),
      org.apache.spark.sql.functions.max, src, name)

  /** groupBy(keys).agg(...) with salt-spread partials. `saltSource` must be a
   * high-cardinality column (e.g. clip_id) so salts are uniform. */
  def saltedGroupBy(df: DataFrame, keys: Seq[String], saltSource: String,
                    buckets: Int, aggs: Seq[Agg]): DataFrame = {
    val salted = df.withColumn("_salt", Keys.salt(col(saltSource), buckets))
    val partials = aggs.map(a => a.partial(if (a.src.isEmpty) lit(1) else col(a.src))
      .as(s"_p_${a.name}"))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    val merged = aggs.map(a => a.merge(col(s"_p_${a.name}")).as(a.name))
    phase1.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }
}
