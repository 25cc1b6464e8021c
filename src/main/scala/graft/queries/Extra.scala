package graft.queries

import graft.functions.TypedAggs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage for the remaining SURVEY.md §2 inventory rows: CSV source/sink,
 * bloom prefiltering, min-max normalization, typed Aggregator reducers,
 * approx distinct. */
object Extra {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- CSV write -> CSV read round-trip (reference CsvArraysCursor /
    //    writeCSV); integer+string columns keep the trip exact --
    "q32_csv_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-csv-").toString
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_returnflag", StringType)))
      s.read.option("header", "true").schema(schema).csv(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"))
    }),

    // -- bloom-filter prefilter (reference BloomFilter cluster indexes,
    //    vec/util/BloomFilter.kt:18-121): bloom pre-test then exact join
    //    confirm, so false positives cannot leak into the result --
    "q34_bloom_prefilter" -> ((s, d) => {
      val dim = t(s, d, "part").filter(col("p_size") <= 5)
      // closure-captured (a BloomFilter is a few KB here) — Broadcast.value
      // per row would serialize the scan on the block-manager lock
      val bloom = dim.stat.bloomFilter("p_partkey", 2000, 0.01)
      val mightContain = udf((k: Long) => bloom.mightContain(k))
      t(s, d, "lineitem")
        .filter(mightContain(col("l_partkey"))) // cheap pre-test
        .join(dim, col("l_partkey") === col("p_partkey")) // exact confirm
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),

    // -- min-max normalization (reference normalizeFloatColumn,
    //    Cursor.kt:183-254: stats pass then rewrite pass) --
    "q36_minmax_normalize" -> ((s, d) => {
      val cents = round(col("c_acctbal") * 100, 0).cast("long")
      val w = Window.partitionBy()
      t(s, d, "customer")
        .select(col("c_custkey"), cents.as("bal"))
        .withColumn("bal_norm",
          round((col("bal") - min("bal").over(w)) * 1.0 /
            (max("bal").over(w) - min("bal").over(w)), 4))
        .select(col("c_custkey"), col("bal"), col("bal_norm"))
    }),

    // -- typed Aggregator (reference floatSum reducer: null folds as zero) --
    "q37_typed_agg" -> ((s, d) => {
      val nzSum = udaf(TypedAggs.NullAsZeroSum)
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          // inject nulls: zero-tax rows -> null, to exercise null-as-zero
          nullif(round(col("l_tax") * 100, 0).cast("long"), lit(0L)).as("tax_cents"))
        .groupBy("l_returnflag")
        .agg(nzSum(col("tax_cents")).as("tax_sum_nz"), count(lit(1)).as("n"))
    }),

    // -- variance via one-pass typed Aggregator (whole dollars: cents^2 sums
    //    would overflow Long where DuckDB silently widens to HUGEINT) --
    "q39_typed_variance" -> ((s, d) => {
      val varAgg = udaf(TypedAggs.VarianceOfCents)
      t(s, d, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice"), 0).cast("long").as("dollars"))
        .groupBy("o_orderpriority")
        .agg(round(varAgg(col("dollars")), 0).as("var_dollars"),
          count(lit(1)).as("n"))
    }),

    // -- HLL approx distinct (no cross-engine oracle; rows-only) --
    "q38_approx_distinct" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))),

    // -- as-of join (absent in the reference; SURVEY §2.3 notes it comes
    //    free on Spark): each error event picks up the most recent prior
    //    click by the same user. At scale this is a range-bounded shuffle
    //    join on user_id; the window dedup keeps only the latest match. --
    "q55_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), col("user_id"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"),
          round(col("value") * 100, 0).cast("long").as("click_cents"))
      val w = Window.partitionBy("event_id").orderBy(col("cts").desc)
      err.join(clk, col("user_id") === col("c_user") && col("cts") <= col("ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("cts").as("asof_ts"),
          col("click_cents"))
    }),

    // -- JSON cell functions (absent in the reference, README.md:150-151
    //    lists JSON as unimplemented; free on Spark) --
    "q56_json_props" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"),
          min("k").as("min_k"), max("k").as("max_k"))),

    // -- non-ISO chronology calendar blowout (reference JvmCal
    //    dateWiseCategories covers Iso/ThaiBuddhist/Minguo/Japanese,
    //    cursors/calendar/JvmCal.kt:22-104); needs java.time.chrono, so a
    //    typed map rather than SQL -- rows-only --
    "q65_calendar_chrono" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .as[java.sql.Date]
        .map { sd =>
          val ld = sd.toLocalDate
          val thai = java.time.chrono.ThaiBuddhistDate.from(ld)
          val minguo = java.time.chrono.MinguoDate.from(ld)
          (sd.toString, ld.getYear,
            thai.get(java.time.temporal.ChronoField.YEAR),
            minguo.get(java.time.temporal.ChronoField.YEAR),
            ld.getDayOfWeek.getValue)
        }
        .toDF("d", "iso_year", "thai_year", "minguo_year", "iso_dow")
    })
  )

  val oracles: Map[String, String] = Map(
    "q55_asof_join" ->
      """WITH e AS (SELECT event_id, ts, user_id FROM events
        |           WHERE event_type = 'error'),
        |c AS (SELECT user_id AS c_user, ts AS cts,
        |        CAST(round(value*100, 0) AS BIGINT) AS click_cents
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT e.event_id, e.user_id, c.cts, c.click_cents,
        |        row_number() OVER (PARTITION BY e.event_id
        |                           ORDER BY c.cts DESC) AS rn
        |      FROM e JOIN c ON e.user_id = c.c_user AND c.cts <= e.ts)
        |SELECT event_id, user_id, cts AS asof_ts, click_cents
        |FROM j WHERE rn = 1""".stripMargin,
    "q56_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q32_csv_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_key
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q34_bloom_prefilter" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5 GROUP BY p_brand""".stripMargin,
    "q36_minmax_normalize" ->
      """WITH b AS (SELECT c_custkey,
        |    CAST(round(c_acctbal*100,0) AS BIGINT) AS bal FROM customer)
        |SELECT c_custkey, bal,
        |  round((bal - min(bal) OVER ()) * 1.0 /
        |    (max(bal) OVER () - min(bal) OVER ()), 4) AS bal_norm
        |FROM b""".stripMargin,
    "q37_typed_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(COALESCE(NULLIF(CAST(round(l_tax*100,0) AS BIGINT), 0), 0))
        |    AS BIGINT) AS tax_sum_nz,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q39_typed_variance" ->
      """WITH b AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice,0) AS BIGINT) AS dollars FROM orders)
        |SELECT o_orderpriority,
        |  round(CAST(sum(dollars*dollars) AS DOUBLE)/count(*) -
        |    (sum(dollars)*1.0/count(*)) * (sum(dollars)*1.0/count(*)), 0)
        |    AS var_dollars,
        |  count(*) AS n
        |FROM b GROUP BY o_orderpriority""".stripMargin
  )
}
