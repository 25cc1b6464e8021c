package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic relational operator coverage (SURVEY.md §2.2-2.9) over the driver's
 * TPC-H-ish testdata, each with a DuckDB oracle.
 *
 * Float-safety convention: money columns are integerized
 * (`round(x*100) :: bigint`) BEFORE aggregation so both engines sum exact
 * integers; ratios derived from those integers are rounded to 4 decimals.
 */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- select / project / filter (reference Cursor.get, ByColName) --
    "q01_select_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          cents(col("l_extendedprice")).as("price_cents"))),

    // -- column drop / negation (reference NegateColumn) --
    "q02_drop_negate" -> ((s, d) =>
      t(s, d, "part").drop("p_type", "p_retailprice", "p_brand")),

    // -- x-mirror: reversed column order (reference Cursor.mirror) --
    "q03_mirror" -> ((s, d) => {
      val df = t(s, d, "nation")
      df.select(df.columns.reverse.map(col).toIndexedSeq: _*)
    }),

    // -- compound predicate filter --
    "q04_filter_compound" -> ((s, d) =>
      t(s, d, "orders")
        .filter((col("o_totalprice") >= 100000 && col("o_orderstatus") =!= "F")
          || col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("total_cents"))),

    // -- group + sum/avg/count (reference group + Sigma/floatSum) --
    "q05_agg_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_cents"),
          cents(col("l_discount")).as("disc_cents"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sum_qty"),
          sum("price_cents").as("sum_price_cents"),
          round(sum("price_cents") / count(lit(1)), 4).as("avg_price_cents"),
          round(avg("disc_cents"), 4).as("avg_disc_cents"),
          count(lit(1)).as("n"))),

    // -- group collecting member values (reference Clusters group: cells
    //    become vectors) expressed as ordered distinct string agg --
    "q06_group_collect" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          array_join(array_sort(collect_set("o_orderpriority")), ",")
            .as("priorities"),
          count(lit(1)).as("n"))),

    // -- featureRange: global min/max pass --
    "q07_feature_range" -> ((s, d) =>
      t(s, d, "supplier").agg(
        min(cents(col("s_acctbal"))).as("min_bal_cents"),
        max(cents(col("s_acctbal"))).as("max_bal_cents"),
        count(lit(1)).as("n"))),

    // -- distinct --
    "q08_distinct" -> ((s, d) =>
      t(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct()),

    // -- ordered + top-k with full tie-break (reference ordered; limit absent
    //    there, free in Spark) --
    "q09_ordered_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
        .orderBy(col("total_cents").desc, col("o_orderkey").asc)
        .limit(100)),

    // -- inner key join (absent in reference; its mapOnColumns re-expressed) --
    "q10_join_inner" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("sum_total_cents"))),

    // -- broadcast dim join --
    "q11_join_broadcast" -> ((s, d) =>
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") <= 10)
        .groupBy("p_brand")
        .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"),
          count(lit(1)).as("n"))),

    // -- semi join (EXISTS) --
    "q12_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers_with_orders"))),

    // -- anti join (NOT EXISTS): customers with no URGENT order --
    "q13_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers_without_urgent"))),

    // -- UNION ALL (reference combine) --
    "q14_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority").as("tag"))
        .unionAll(o.filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), lit("HIGH_VALUE").as("tag")))
    }),

    // -- EXCEPT (reference daySeq subtraction generalized): order keys with
    //    lineitems minus the urgent ones --
    "q15_except" -> ((s, d) =>
      t(s, d, "lineitem").select(col("l_orderkey").as("k"))
        .except(t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("k")))),

    // -- INTERSECT --
    "q16_intersect" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey").as("k"))
        .intersect(t(s, d, "lineitem").select(col("l_partkey").as("k")))),

    // -- pivot (the reference's signature move, Cursor.pivot) --
    "q17_pivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_linestatus"), col("l_quantity").cast("long").as("qty"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .sum("qty")
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")),

    // -- one-hot encoding (reference categories()/DummySpec) --
    "q18_onehot" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("pri_1"),
        when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0).as("pri_2"),
        when(col("o_orderpriority") === "3-MEDIUM", 1).otherwise(0).as("pri_3"),
        when(col("o_orderpriority") === "4-NOT SPECIFIED", 1).otherwise(0).as("pri_4"),
        when(col("o_orderpriority") === "5-LOW", 1).otherwise(0).as("pri_5"))),

    // -- resample: date-spine gap fill (reference Resample.kt) --
    "q19_resample_spine" -> ((s, d) => {
      val o = t(s, d, "orders")
      val bounds = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
        max(to_date(col("o_orderdate"))).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
      val daily = o.groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n0"))
      spine.join(daily, Seq("d"), "left")
        .select(col("d"), coalesce(col("n0"), lit(0L)).as("n_orders"))
    }),

    // -- window rank: top-3 orders per customer --
    "q20_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_cents"), col("rn"))
    }),

    // -- window running total over the date spine --
    "q21_window_running" -> ((s, d) => {
      // distributed prefix sum: an unpartitioned Window.orderBy would move
      // the whole spine to one task. Instead: running total WITHIN each year
      // partition + broadcast per-year offsets (triangular self-join on the
      // tiny per-year table) — every stage stays parallel at any spine size
      val daily = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("yy", year(col("d")))
      val wy = Window.partitionBy(col("yy")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perYear = daily.groupBy("yy").agg(sum("n").as("ytot"))
      val off = perYear.as("a")
        .join(perYear.as("b"), col("b.yy") < col("a.yy"), "left")
        .groupBy(col("a.yy").as("yy"))
        .agg(coalesce(sum(col("b.ytot")), lit(0L)).as("off"))
      daily.join(broadcast(off), "yy")
        .select(col("d"), col("n"),
          (sum("n").over(wy) + col("off")).as("running_n"))
    }),

    // -- calendar feature blowout (reference JvmCal.dateWiseCategories) --
    "q22_calendar" -> ((s, d) =>
      t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("d")).distinct()
        .select(col("d"),
          year(col("d")).as("y"),
          month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          dayofweek(col("d")).as("dow"),
          weekofyear(col("d")).as("woy"),
          quarter(col("d")).as("q"))),

    // -- date arithmetic --
    "q23_date_arith" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
          trunc(to_date(col("o_orderdate")), "month").as("d_month"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")),
            to_date(col("o_orderdate"))).as("days_to_end"))),

    // -- null fill (reference floatFillNa) --
    "q24_na_fill" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(cents(col("l_tax")), lit(0L)), lit(-1L))
            .as("tax_cents_or_neg1"))),

    // -- rollup (free in Spark; absent in reference) --
    "q25_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))),

    // -- string functions --
    "q26_string_funcs" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devoweled"))),

    // -- md5 key map (reference mapOnColumnsMd4 — MD4 swapped for the
    //    portable MD5; same "idealized hash bucket" role) --
    "q27_hash_md5" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"), md5(col("c_name")).as("key_md5"))),

    // -- deterministic bucketing / salting shape --
    "q28_bucket_mod" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy((col("o_orderkey") % 16).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_cents"))),

    // -- exact percentile (typed comparator sort machinery analog) --
    "q29_percentiles" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          count(lit(1)).as("n"))),

    // -- events: tumbling 1-hour windows (streaming shape, batch parity) --
    "q30_events_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(
          (floor(unix_timestamp(col("ts")) / 3600) * 3600).as("hour_epoch"),
          col("event_type"))
        // integerize per row BEFORE the sum (file convention): summing raw
        // doubles is accumulation-order-dependent, so a group landing near
        // an x.xx5 boundary could round differently in the two engines —
        // and across Spark runs
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))),

    // -- events: per-user profile --
    "q31_events_user" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
          min(unix_timestamp(col("ts"))).as("first_epoch"),
          max(unix_timestamp(col("ts"))).as("last_epoch"),
          countDistinct(col("event_type")).as("n_types"))),

    // -- bucketed co-located join: both fact tables are written bucketBy(8)
    //    on the join key into the session catalog, so the merge join reads
    //    bucket-aligned splits and needs NO exchange on either side
    //    (PlanSpec asserts zero join-key Exchange). The bucketing story at
    //    100 TB: pay one layout write, then every orderkey join — the
    //    hottest join in the schema — is shuffle-free forever. --
    "q98_bucketed_join" -> ((s, d) => {
      s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
            .as("price_cents"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("g98_lineitem")
      s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g98_orders")
      s.table("g98_lineitem")
        .join(s.table("g98_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum("price_cents").as("sum_price_cents"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q98_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q01_select_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q02_drop_negate" ->
      "SELECT p_partkey, p_name, p_size FROM part",
    "q03_mirror" ->
      "SELECT n_regionkey, n_name, n_nationkey FROM nation",
    "q04_filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  CAST(round(o_totalprice*100,0) AS BIGINT) AS total_cents
        |FROM orders
        |WHERE (o_totalprice >= 100000 AND o_orderstatus <> 'F')
        |   OR o_orderpriority = '1-URGENT'""".stripMargin,
    "q05_agg_pricing" ->
      """WITH b AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents,
        |    CAST(round(l_discount*100,0) AS BIGINT) AS disc_cents
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty) AS BIGINT) AS sum_qty,
        |  CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
        |  round(sum(price_cents)*1.0/count(*), 4) AS avg_price_cents,
        |  round(avg(disc_cents), 4) AS avg_disc_cents,
        |  count(*) AS n
        |FROM b GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q06_group_collect" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q07_feature_range" ->
      """SELECT min(CAST(round(s_acctbal*100,0) AS BIGINT)) AS min_bal_cents,
        |  max(CAST(round(s_acctbal*100,0) AS BIGINT)) AS max_bal_cents,
        |  count(*) AS n
        |FROM supplier""".stripMargin,
    "q08_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q09_ordered_topk" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice*100,0) AS BIGINT) AS total_cents
        |FROM orders ORDER BY total_cents DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q10_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q11_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10 GROUP BY p_brand""".stripMargin,
    "q12_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers_with_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "q13_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_without_urgent
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q14_union_all" ->
      """SELECT o_orderkey, o_orderpriority AS tag FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, 'HIGH_VALUE' AS tag FROM orders
        |WHERE o_totalprice > 400000""".stripMargin,
    "q15_except" ->
      """SELECT l_orderkey AS k FROM lineitem
        |EXCEPT SELECT o_orderkey AS k FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q16_intersect" ->
      """SELECT p_partkey AS k FROM part
        |INTERSECT SELECT l_partkey AS k FROM lineitem""".stripMargin,
    "q17_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus='F') AS BIGINT) AS qty_f,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus='O') AS BIGINT) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q18_onehot" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END AS pri_1,
        |  CASE WHEN o_orderpriority='2-HIGH' THEN 1 ELSE 0 END AS pri_2,
        |  CASE WHEN o_orderpriority='3-MEDIUM' THEN 1 ELSE 0 END AS pri_3,
        |  CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN 1 ELSE 0 END AS pri_4,
        |  CASE WHEN o_orderpriority='5-LOW' THEN 1 ELSE 0 END AS pri_5
        |FROM orders""".stripMargin,
    "q19_resample_spine" ->
      """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) lo,
        |                  CAST(max(o_orderdate) AS DATE) hi FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n0
        |          FROM orders GROUP BY 1)
        |SELECT spine.d AS d, COALESCE(daily.n0, 0) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.d = daily.d""".stripMargin,
    "q20_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice*100,0) AS BIGINT) AS total_cents, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) x
        |WHERE rn <= 3""".stripMargin,
    "q21_window_running" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        |               FROM orders GROUP BY 1)
        |SELECT d, n, CAST(sum(n) OVER (ORDER BY d
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
        |FROM daily""".stripMargin,
    "q22_calendar" ->
      """WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT d, year(d) AS y, month(d) AS m, dayofmonth(d) AS dom,
        |  dayofweek(d) + 1 AS dow, weekofyear(d) AS woy, quarter(d) AS q
        |FROM dd""".stripMargin,
    "q23_date_arith" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS d_plus30,
        |  date_trunc('month', CAST(o_orderdate AS DATE)) AS d_month,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |    AS days_to_end
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "q24_na_fill" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(CAST(round(l_tax*100,0) AS BIGINT), 0), -1)
        |    AS tax_cents_or_neg1
        |FROM lineitem""".stripMargin,
    "q25_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q26_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled
        |FROM part WHERE p_partkey <= 200""".stripMargin,
    "q27_hash_md5" ->
      """SELECT c_custkey, md5(c_name) AS key_md5
        |FROM customer WHERE c_custkey <= 500""".stripMargin,
    "q28_bucket_mod" ->
      """SELECT o_orderkey % 16 AS bucket, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1""".stripMargin,
    "q29_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q30_events_hourly" ->
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q31_events_user" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(floor(min(epoch(ts))) AS BIGINT) AS first_epoch,
        |  CAST(floor(max(epoch(ts))) AS BIGINT) AS last_epoch,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id""".stripMargin
  )
}
