package graft.queries

import graft.functions.{OneHot, TypedAggs}
import graft.sources.Fwf
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
      val dir = graft.queries.Audio.e2eDir("graft-csv-")
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
      // SURVEY §2.8 plan: a global Window.partitionBy() would drag every row
      // to ONE task; instead one tiny agg(min,max) broadcast-joined back —
      // the stats pass stays fully parallel and the rewrite pass is map-only
      val cents = round(col("c_acctbal") * 100, 0).cast("long")
      val base = t(s, d, "customer").select(col("c_custkey"), cents.as("bal"))
      val stats = base.agg(min("bal").as("_lo"), max("bal").as("_hi"))
      base.crossJoin(broadcast(stats))
        .withColumn("bal_norm",
          round((col("bal") - col("_lo")) * 1.0 / (col("_hi") - col("_lo")), 4))
        .select(col("c_custkey"), col("bal"), col("bal_norm"))
    }),

    // -- inverse min-max scaling (reference FeatureRange.deNormalize,
    //    vec/ml/FeatureRange.kt:38-45): reconstruct raw values from the
    //    normalized column + stored (lo, hi) — same broadcast-stats shape
    //    as q36, both directions in one pass --
    "q58_denormalize" -> ((s, d) => {
      val cents = round(col("c_acctbal") * 100, 0).cast("long")
      val base = t(s, d, "customer").select(col("c_custkey"), cents.as("bal"))
      val stats = base.agg(min("bal").as("_lo"), max("bal").as("_hi"))
      base.crossJoin(broadcast(stats))
        .withColumn("bal_norm",
          round((col("bal") - col("_lo")) * 1.0 / (col("_hi") - col("_lo")), 4))
        .withColumn("bal_denorm",
          round(col("bal_norm") * (col("_hi") - col("_lo")) + col("_lo"), 0)
            .cast("long"))
        .select(col("c_custkey"), col("bal"), col("bal_norm"), col("bal_denorm"))
    }),

    // -- generic one-hot with DummySpec drop rules (reference
    //    Categories.kt:33-77 + DummySpec.kt:6-8): distinct-scan the column,
    //    indicators synthesized from the DATA, drop-first for the
    //    reference-dummy encoding --
    "q59_onehot_dummy" -> ((s, d) =>
      OneHot.encode(
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderpriority", OneHot.DropFirst)),

    // -- fixed-width text round-trip (reference FWF front door,
    //    Ordering.kt:73-81 / Medium.kt:68-113): write lineitem columns at
    //    declared widths, read back via substring projections, aggregate --
    "q67_fwf_roundtrip" -> ((s, d) => {
      val dir = graft.queries.Audio.e2eDir("graft-fwf-")
      val fields = Seq(
        Fwf.Field("l_orderkey", 1, 10, LongType),
        Fwf.Field("l_linenumber", 11, 2, IntegerType),
        Fwf.Field("l_returnflag", 13, 1, StringType, leftAlign = true))
      Fwf.write(t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag"), dir, fields)
      Fwf.read(s, dir, fields)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sum_key"),
          max("l_linenumber").as("max_line"))
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

    // -- HLL approx distinct, ORACLE-EXACT by construction: the sketch is
    //    re-derived relationally — register = first md5 word mod 64, rank =
    //    33 - bitlength(second md5 word) — so DuckDB recomputes the SAME
    //    registers from the same hashes, and the register sum Σ2^-M_j is a
    //    sum of dyadic rationals (common denominator 2^33, numerators
    //    < 2^39 << 2^53) that is EXACT in IEEE double regardless of
    //    summation order; every remaining op is a deterministic IEEE
    //    single-op chain, so both engines produce bit-identical estimates.
    //    No small-range linear-counting branch: it needs ln(), whose libm
    //    rounding differs across engines (the raw estimator's small-n bias
    //    is the price of a bit-exact cross-engine oracle; the exact count
    //    rides along for callers who need truth at small n). --
    "q38_approx_distinct" -> ((s, d) => {
      val hashed = t(s, d, "events")
        .filter(col("user_id").isNotNull)
        .select(col("event_type"),
          expr("conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)")
            .cast("long").as("hr"),
          expr("conv(substring(md5(cast(user_id as string)), 9, 8), 16, 10)")
            .cast("long").as("hw"))
      val regs = hashed
        .select(col("event_type"), (col("hr") % 64).as("reg"),
          when(col("hw") === 0, lit(33))
            .otherwise(lit(33) - length(expr("bin(hw)"))).as("rnk"))
        .groupBy("event_type", "reg").agg(max("rnk").as("mreg"))
      val est = regs.groupBy("event_type")
        .agg((sum(pow(lit(2.0), -col("mreg"))) +
          (lit(64) - count(lit(1))).cast("double")).as("sum_inv"))
        .select(col("event_type"),
          floor(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0)) *
            lit(4096.0) / col("sum_inv")).cast("long").as("approx_users"))
      est.join(t(s, d, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users")), "event_type")
    }),

    // -- as-of join (absent in the reference; SURVEY §2.3 notes it comes
    //    free on Spark): each error event picks up the most recent prior
    //    click by the same user. Scale-safe plan: ONE scan of both event
    //    kinds, sorted within user_id partitions, carrying the last click
    //    forward via last(_, ignoreNulls) over a running frame — an
    //    inequality join + window dedup would materialize every
    //    (error x prior click) pair per user (quadratic in events/user). --
    "q55_asof_join" -> ((s, d) => {
      val base = t(s, d, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          // click payload struct; null on error rows so the running
          // last(ignoreNulls) IS the as-of state (clicks sort before
          // errors at equal ts: cts <= ts is inclusive)
          when(col("event_type") === "click",
            struct(col("ts").as("cts"),
              round(col("value") * 100, 0).cast("long").as("click_cents")))
            .as("_clk"),
          when(col("event_type") === "click", 0).otherwise(1).as("_kind"))
      // event_id breaks (ts, kind) ties deterministically: two clicks at the
      // SAME microsecond would otherwise be picked arbitrarily — and
      // independently of the oracle's own arbitrary pick
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("_kind").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.withColumn("_last", last(col("_clk"), ignoreNulls = true).over(w))
        .filter(col("_kind") === 1 && col("_last").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("_last.cts").as("asof_ts"),
          col("_last.click_cents").as("click_cents"))
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

    // -- gaps-and-islands sessionization (batch form of the streaming
    //    mapGroupsWithState sessionizer): a >30-min silence starts a new
    //    session; session number = running count of gap flags. Both windows
    //    are user-partitioned — parallel by key, never one-task. --
    "q80_sessions" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("_gap",
          // exact microsecond arithmetic: the ts column is µs-precision and
          // truncate-to-seconds would move events across the 30-min boundary
          when(unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(wOrd).cast("timestamp")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sess_no", sum(col("_gap")).over(wRun))
        .groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          unix_micros(min(col("ts")).cast("timestamp")).as("sess_start_us"),
          unix_micros(max(col("ts")).cast("timestamp")).as("sess_end_us"))
        .withColumn("dur_us", col("sess_end_us") - col("sess_start_us"))
    }),

    // -- RANGE-frame rolling aggregate: per-customer trailing-7-day order
    //    total, frame bounded by VALUE distance (days), not row count --
    "q81_rolling_range" -> ((s, d) => {
      val base = t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).as("day_no"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy(col("day_no"))
        .rangeBetween(-6, Window.currentRow)
      base.withColumn("sum_7d", sum(col("cents")).over(w))
        .withColumn("n_7d", count(lit(1)).over(w))
    }),

    // -- non-ISO chronologies, driver-checked (reference JvmCal
    //    dateWiseCategories, cursors/calendar/JvmCal.kt:22-104): Spark side
    //    uses the real java.time chronologies; the oracle re-derives each
    //    calendar arithmetically (Thai = ISO+543, Minguo = ISO-1911,
    //    Japanese era from the public era start dates), so the two engines
    //    cross-check genuinely different computations. Hijrah is table-based
    //    (Umm al-Qura) and stays in rows-only q65. --
    "q68_calendar_eras" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .as[java.sql.Date]
        .map { sd =>
          val ld = sd.toLocalDate
          val yearOf = java.time.temporal.ChronoField.YEAR
          val jp = java.time.chrono.JapaneseDate.from(ld)
          (sd.toString, ld.getYear,
            java.time.chrono.ThaiBuddhistDate.from(ld).get(yearOf),
            java.time.chrono.MinguoDate.from(ld).get(yearOf),
            jp.getEra.toString,
            jp.get(java.time.temporal.ChronoField.YEAR_OF_ERA))
        }
        .toDF("d", "iso_year", "thai_year", "minguo_year",
          "jp_era", "jp_year_of_era")
    }),

    // -- per-column shard write + positional rejoin (reference per-column
    //    ISAM volumes, NinetyDegreeTest.kt:97-137; positional concat join,
    //    cursors/macros/Join.kt:11-27). Shards share a row id minted ONCE at
    //    write time from the declared total order (RowId: range partition +
    //    per-partition offsets, no one-task Window); the rejoin is then a
    //    plain equi-join on row_id and must reproduce every cell. --
    "q69_shard_rejoin" -> ((s, d) => {
      val dir = graft.queries.Audio.e2eDir("graft-shard-")
      val base = graft.ops.RowId.withRowId(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("price_cents"),
          col("l_returnflag")),
        "row_id", col("l_orderkey"), col("l_linenumber"))
        .persist() // two shard writes below; without this each re-runs the
                   // range-sample + sort + zip lineage from the scan
      try {
        base.select("row_id", "l_orderkey", "l_linenumber", "qty")
          .write.mode("overwrite").parquet(s"$dir/a")
        base.select("row_id", "price_cents", "l_returnflag")
          .write.mode("overwrite").parquet(s"$dir/b")
      } finally base.unpersist()
      s.read.parquet(s"$dir/a").join(s.read.parquet(s"$dir/b"), "row_id")
        .select("row_id", "l_orderkey", "l_linenumber", "qty",
          "price_cents", "l_returnflag")
    }),

    // -- bitset pack (reference Categories.kt:79-98 packs indicator columns
    //    into a bitset): the category index becomes a bit position and a
    //    bit_or aggregate packs each customer's SET of order priorities into
    //    one long — the dictionary+bitmask form the reference builds row-wise,
    //    re-expressed as a codegen'd aggregate --
    "q73_bitset_pack" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_custkey"),
          expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(substring(o_orderpriority, 1, 1) AS INT))").as("mask"))
        .groupBy("o_custkey")
        .agg(expr("bit_or(mask)").as("prio_bits"), count(lit(1)).as("n_orders"))
        .withColumn("n_prios", bit_count(col("prio_bits")))),

    // -- GROUPING SETS (beyond rollup/cube q25: arbitrary set list) --
    "q74_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
          |    AS sum_cents
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |""".stripMargin)
    }),

    // -- lead/lag/ntile windows (partitioned by customer — never a global
    //    one-task window) --
    "q75_window_leadlag" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("next_cents", lead(col("cents"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .drop("o_orderdate")
    }),

    // -- non-ISO chronology calendar blowout (reference JvmCal
    //    dateWiseCategories covers Iso/ThaiBuddhist/Minguo/Japanese,
    //    cursors/calendar/JvmCal.kt:22-104; Hijrah beyond it); needs
    //    java.time.chrono, so a typed map rather than SQL. Oracle: every
    //    arithmetically-derivable column (ISO/Thai/Minguo years, Japanese
    //    era from the public era start dates, ISO day-of-week) is re-derived
    //    relationally in DuckDB; the Hijrah year — a TABLE-based calendar
    //    (Umm al-Qura), not arithmetically derivable — is checked against a
    //    golden fixture exported by DRIVER-side java.time.chrono, a
    //    different code path from the executor map the query runs. --
    "q65_calendar_chrono" -> ((s, d) => {
      import s.implicits._
      val out = t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .as[java.sql.Date]
        .map { sd =>
          val ld = sd.toLocalDate
          val yearOf = java.time.temporal.ChronoField.YEAR
          val thai = java.time.chrono.ThaiBuddhistDate.from(ld)
          val minguo = java.time.chrono.MinguoDate.from(ld)
          val jp = java.time.chrono.JapaneseDate.from(ld)
          val hij = java.time.chrono.HijrahDate.from(ld)
          (sd.toString, ld.getYear,
            thai.get(yearOf), minguo.get(yearOf),
            jp.getEra.toString, jp.get(java.time.temporal.ChronoField.YEAR_OF_ERA),
            hij.get(yearOf),
            ld.getDayOfWeek.getValue)
        }
        .toDF("d", "iso_year", "thai_year", "minguo_year",
          "jp_era", "jp_year_of_era", "hijrah_year", "iso_dow")
      if (OracleFixtures.exportEnabled) {
        // Hijrah golden: a CHECKED-IN, reviewed fixture (fixtures/
        // q65_hijrah_golden.csv — provenance + boundary review in
        // fixtures/README.md), not a per-run export from the same
        // java.time.chrono call under test (r4 verdict directive): if the
        // JDK's Umm al-Qura table ever changed, the query would fail
        // against the frozen fixture instead of silently agreeing with
        // itself. An inner join makes a date missing from the fixture a
        // loud row-count mismatch, never a silent pass.
        val fx = OracleFixtures.repoFixture("q65_hijrah_golden.csv")
        OracleFixtures.register("q65_calendar_chrono",
          s"""WITH g AS (SELECT CAST(d AS VARCHAR) AS d, g_hijrah_year
             |  FROM read_csv_auto('$fx')),
             |dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
             |SELECT CAST(dd.dt AS VARCHAR) AS d,
             |  year(dd.dt) AS iso_year,
             |  year(dd.dt) + 543 AS thai_year,
             |  year(dd.dt) - 1911 AS minguo_year,
             |  CASE WHEN dd.dt >= DATE '2019-05-01' THEN 'Reiwa'
             |       WHEN dd.dt >= DATE '1989-01-08' THEN 'Heisei'
             |       WHEN dd.dt >= DATE '1926-12-25' THEN 'Showa'
             |       WHEN dd.dt >= DATE '1912-07-30' THEN 'Taisho'
             |       ELSE 'Meiji' END AS jp_era,
             |  CASE WHEN dd.dt >= DATE '2019-05-01' THEN year(dd.dt) - 2018
             |       WHEN dd.dt >= DATE '1989-01-08' THEN year(dd.dt) - 1988
             |       WHEN dd.dt >= DATE '1926-12-25' THEN year(dd.dt) - 1925
             |       WHEN dd.dt >= DATE '1912-07-30' THEN year(dd.dt) - 1911
             |       ELSE year(dd.dt) - 1867 END AS jp_year_of_era,
             |  g.g_hijrah_year AS hijrah_year,
             |  isodow(dd.dt) AS iso_dow
             |FROM dd JOIN g ON CAST(dd.dt AS VARCHAR) = g.d""".stripMargin)
      }
      out
    }),

    // -- headline multi-join analytics, TPC-H Q5 shape: revenue per nation
    //    for one region over a date window. Fact-fact join shuffles on the
    //    join keys; both dims are broadcast (nation=25, region=5 rows — the
    //    plan a 100 TB run needs). Revenue is integerized PER ROW
    //    (round(p*(1-d)*100) as long) so the sum is exact integer
    //    arithmetic — no float accumulation-order sensitivity. --
    "q86_revenue_by_nation" -> ((s, d) => {
      val nation = t(s, d, "nation")
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= "1996-01-01"
          && col("o_orderdate") < "1998-01-01")
      t(s, d, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100, 0).cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // -- headline top-k, TPC-H Q3 shape: 10 highest-revenue unshipped
    //    orders in a segment. Partial-agg + TakeOrderedAndProject: only 10
    //    rows per partition survive to the driver; (revenue, orderkey)
    //    ordering makes the cut deterministic even under revenue ties. --
    "q87_shipping_priority" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = t(s, d, "orders").filter(col("o_orderdate") < "1997-06-01")
      t(s, d, "lineitem").filter(col("l_shipdate") > "1997-06-01")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100, 0).cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // -- unpivot / melt (reference transpose, VectorLike.kt:446-459; SURVEY
    //    §2 maps full transpose to pivot+unpivot territory): the inverse of
    //    q17's pivot — wide per-linestatus quantity columns fold back to
    //    long (key, variable, value) rows. Dataset.unpivot KEEPS null cells,
    //    unlike SQL UNPIVOT's exclude-nulls default — the pivot declares a
    //    third status 'X' no row carries, so every key yields one all-NULL
    //    lane and the oracle's UNION ALL must replicate the retention
    //    exactly. Melt is a per-row generator — zero shuffle beyond the
    //    pivot agg, so the long form costs nothing extra at 100 TB. --
    "q108_unpivot" -> ((s, d) => {
      val wide = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O", "X"))
        .sum("qty")
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("X", "qty_x")
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("qty_f"), col("qty_o"), col("qty_x")),
        "linestatus", "qty")
    })
  )

  val oracles: Map[String, String] = Map(
    // mirrors q38's relational HLL exactly: same md5-derived registers, the
    // dyadic register sum is order-independent-exact in double, and the
    // estimate chain is the same IEEE op sequence — see the query comment
    "q38_approx_distinct" ->
      """WITH h AS (
        |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (
        |  SELECT event_type,
        |    CAST(CAST('0x' || substring(hh, 1, 8) AS UBIGINT) AS BIGINT) % 64 AS reg,
        |    CAST(CAST('0x' || substring(hh, 9, 8) AS UBIGINT) AS BIGINT) AS hw
        |  FROM h),
        |r AS (
        |  SELECT event_type, reg,
        |    max(CASE WHEN hw = 0 THEN 33 ELSE 33 - length(bin(hw)) END) AS mreg
        |  FROM b GROUP BY event_type, reg),
        |s AS (
        |  SELECT event_type,
        |    sum(power(CAST(2.0 AS DOUBLE), -mreg)) +
        |      CAST(64 - count(*) AS DOUBLE) AS sum_inv
        |  FROM r GROUP BY event_type),
        |x AS (
        |  SELECT event_type,
        |    CAST(floor(CAST(0.7213 AS DOUBLE) /
        |      (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)) *
        |      CAST(4096.0 AS DOUBLE) / sum_inv) AS BIGINT) AS approx_users
        |  FROM s)
        |SELECT x.event_type, x.approx_users, ex.exact_users
        |FROM x JOIN (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY event_type) ex USING (event_type)""".stripMargin,
    "q108_unpivot" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS BIGINT))
        |      FILTER (WHERE l_linestatus='F') AS BIGINT) AS qty_f,
        |    CAST(sum(CAST(l_quantity AS BIGINT))
        |      FILTER (WHERE l_linestatus='O') AS BIGINT) AS qty_o,
        |    CAST(sum(CAST(l_quantity AS BIGINT))
        |      FILTER (WHERE l_linestatus='X') AS BIGINT) AS qty_x
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty_f' AS linestatus, qty_f AS qty FROM p
        |UNION ALL
        |SELECT l_returnflag, 'qty_o' AS linestatus, qty_o AS qty FROM p
        |UNION ALL
        |SELECT l_returnflag, 'qty_x' AS linestatus, qty_x AS qty FROM p""".stripMargin,
    "q86_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q87_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate  > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q80_sessions" ->
      """WITH e AS (SELECT user_id, ts, event_id FROM events),
        |g AS (SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |      THEN 1 ELSE 0 END AS gap
        |  FROM e),
        |s AS (SELECT user_id, ts,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |  FROM g)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |  count(*) AS n_events,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS sess_start_us,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS sess_end_us,
        |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
        |FROM s GROUP BY user_id, sess_no""".stripMargin,
    "q81_rolling_range" ->
      """WITH b AS (SELECT o_custkey, o_orderkey,
        |    datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |      AS day_no,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day_no, cents,
        |  CAST(sum(cents) OVER w AS BIGINT) AS sum_7d,
        |  count(*) OVER w AS n_7d
        |FROM b
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q73_bitset_pack" ->
      """SELECT o_custkey,
        |  bit_or(CAST(1 AS BIGINT) << CAST(substr(o_orderpriority, 1, 1) AS INT))
        |    AS prio_bits,
        |  count(*) AS n_orders,
        |  bit_count(bit_or(CAST(1 AS BIGINT)
        |    << CAST(substr(o_orderpriority, 1, 1) AS INT))) AS n_prios
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q74_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q75_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |  lag(CAST(round(o_totalprice * 100, 0) AS BIGINT), 1)
        |    OVER w AS prev_cents,
        |  lead(CAST(round(o_totalprice * 100, 0) AS BIGINT), 1)
        |    OVER w AS next_cents,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q68_calendar_eras" ->
      """WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
        |SELECT CAST(dt AS VARCHAR) AS d, year(dt) AS iso_year,
        |  year(dt) + 543 AS thai_year, year(dt) - 1911 AS minguo_year,
        |  CASE WHEN dt >= DATE '2019-05-01' THEN 'Reiwa'
        |       WHEN dt >= DATE '1989-01-08' THEN 'Heisei'
        |       WHEN dt >= DATE '1926-12-25' THEN 'Showa'
        |       WHEN dt >= DATE '1912-07-30' THEN 'Taisho'
        |       ELSE 'Meiji' END AS jp_era,
        |  CASE WHEN dt >= DATE '2019-05-01' THEN year(dt) - 2018
        |       WHEN dt >= DATE '1989-01-08' THEN year(dt) - 1988
        |       WHEN dt >= DATE '1926-12-25' THEN year(dt) - 1925
        |       WHEN dt >= DATE '1912-07-30' THEN year(dt) - 1911
        |       ELSE year(dt) - 1867 END AS jp_year_of_era
        |FROM dd""".stripMargin,
    "q69_shard_rejoin" ->
      """SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS row_id,
        |  l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_cents,
        |  l_returnflag
        |FROM lineitem""".stripMargin,
    "q58_denormalize" ->
      """WITH b AS (SELECT c_custkey,
        |    CAST(round(c_acctbal*100,0) AS BIGINT) AS bal FROM customer),
        |s AS (SELECT min(bal) AS lo, max(bal) AS hi FROM b),
        |n AS (SELECT c_custkey, bal,
        |    round((bal - lo) * 1.0 / (hi - lo), 4) AS bal_norm, lo, hi
        |  FROM b, s)
        |SELECT c_custkey, bal, bal_norm,
        |  CAST(round(bal_norm * (hi - lo) + lo, 0) AS BIGINT) AS bal_denorm
        |FROM n""".stripMargin,
    "q59_onehot_dummy" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END
        |    AS o_orderpriority_2_HIGH,
        |  CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END
        |    AS o_orderpriority_3_MEDIUM,
        |  CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
        |    AS o_orderpriority_4_NOT_SPECIFIED,
        |  CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END
        |    AS o_orderpriority_5_LOW
        |FROM orders""".stripMargin,
    "q67_fwf_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
        |  max(l_linenumber) AS max_line
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q55_asof_join" ->
      """WITH e AS (SELECT event_id, ts, user_id FROM events
        |           WHERE event_type = 'error'),
        |c AS (SELECT user_id AS c_user, ts AS cts, event_id AS c_eid,
        |        CAST(round(value*100, 0) AS BIGINT) AS click_cents
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT e.event_id, e.user_id, c.cts, c.click_cents,
        |        row_number() OVER (PARTITION BY e.event_id
        |                           ORDER BY c.cts DESC, c.c_eid DESC) AS rn
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
