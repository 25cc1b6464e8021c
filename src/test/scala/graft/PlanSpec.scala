package graft

import graft.keys.Keys
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan quality gates: the 100 TB concerns (pushdown, pruning,
 * broadcast, range partitioning, codegen) asserted on the actual plans, so
 * a regression that silently de-optimizes a query fails CI.
 */
class PlanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter is pushed to the parquet scan (q01)") {
    val p = plan(SparkEntry.queries("q01_select_project")(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"),
      s"quantity filter not pushed:\n$p")
  }

  test("column pruning reaches the scan: bytes column not read for stats") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"over-read schema: $readSchema")
  }

  test("small dim join broadcasts (q11)") {
    val p = plan(SparkEntry.queries("q11_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("semi/anti joins plan as join types, not subquery re-scans") {
    assert(plan(SparkEntry.queries("q12_semi_join")(spark, sf))
      .contains("LeftSemi"))
    assert(plan(SparkEntry.queries("q13_anti_join")(spark, sf))
      .contains("LeftAnti"))
  }

  test("headline joins broadcast dims and plan top-k as TakeOrdered (q86/q87)") {
    val p86 = plan(SparkEntry.queries("q86_revenue_by_nation")(spark, sf))
    assert(p86.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, s"dims not broadcast:\n$p86")
    val p87 = plan(SparkEntry.queries("q87_shipping_priority")(spark, sf))
    assert(p87.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p87")
  }

  test("cluster rewrite plan range-partitions on the curve key") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("_ckey", Keys.zorderKey(21, Seq(col("l_orderkey")),
        Seq(col("l_partkey"), col("l_suppkey"))))
      .repartitionByRange(4, col("_ckey"))
      .sortWithinPartitions("_ckey")
      .drop("_ckey")
    val p = plan(df)
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning")
      || p.toLowerCase.contains("range"), s"no range exchange:\n$p")
  }

  test("curve key expressions run inside WholeStageCodegen") {
    // fallback=false would throw at runtime if doGenCode were broken; the
    // simple-mode plan marks codegen'd operators with a '*' stage prefix
    val df = spark.range(0, 64)
      .select(Keys.zorderKey(8, Seq.empty,
        Seq(col("id"), col("id") * 3)).as("z"))
    val simple = df.queryExecution.executedPlan.toString
    assert(simple.contains("*(1) Project"), s"Project not codegen'd:\n$simple")
    assert(df.collect().length === 64)
  }

  test("ANN probes read the persisted index, not a corpus recompute (q53/q54)") {
    val p53 = plan(SparkEntry.queries("q53_ann_lsh")(spark, sf))
    assert(p53.contains("graft-vecindex"),
      s"q53 does not scan the persisted bucket index:\n$p53")
    val p54 = plan(SparkEntry.queries("q54_ann_ivf")(spark, sf))
    assert(p54.contains("graft-vecindex"),
      s"q54 does not scan the persisted centroid table:\n$p54")
  }

  test("no unpartitioned Window in any query plan (one-task scale gate)") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    // a Window with empty partitionSpec moves EVERY row to one task — the
    // canonical silent scale-killer; gate every registered query against it
    SparkEntry.queries.foreach { case (name, f) =>
      val df = f(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans a global (unpartitioned) Window")
    }
  }

  test("embedding outlier scoring broadcasts the centroid table (q99)") {
    val p = plan(SparkEntry.queries("q99_embedding_outliers")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"centroids must broadcast, not shuffle the corpus:\n$p")
  }

  test("bucketed co-located join has no join-key exchange (q98)") {
    val df = SparkEntry.queries("q98_bucketed_join")(spark, sf)
    val p = plan(df)
    assert(p.contains("SortMergeJoin"), s"expected merge join:\n$p")
    // neither join side may shuffle: bucket-aligned scans satisfy the join's
    // required distribution; the only exchange allowed is the post-join agg
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side shuffled despite buckets:\n$p")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side shuffled despite buckets:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, // agg exchange (+AQE read)
      s"too many exchanges:\n$p")
  }

  test("events hourly agg partial-aggregates before the shuffle (q30)") {
    val p = plan(SparkEntry.queries("q30_events_hourly")(spark, sf))
    // two HashAggregate phases (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
