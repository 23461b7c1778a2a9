package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Catalog, Functions, Graft}

/** The reference's end-to-end staged pipeline re-expressed over the
  * testdata star schema: 8 materialization barriers (staging → dims →
  * facts → rollup → view), mirroring `/root/reference/src/run.py:50-87`.
  *
  * The reference's dataflow is preserved — each phase writes a table the
  * next phase re-scans (deliberate staged materialization, SURVEY.md §4)
  * — while the operators inside each phase are idiomatic Spark: broadcast
  * dim joins, window forward-fill, fold-mutation-into-join for the
  * holiday flag, `mode` recomputed deterministically.
  *
  * Scale notes: facts write `partitionBy("year")` so date-ranged scans
  * prune; dims are small by construction (broadcast in every join);
  * the only large⋈large join (fct ⋈ fct_eur) shuffles both sides once on
  * the composite key.
  */
object RetailPipeline {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Build every table; returns the catalog. Mirrors run.py's phase
    * order, including the driver-side barriers where query results feed
    * the next phase's plan (calendar + FX date bounds, SURVEY.md §3.1).
    *
    * Per-stage observability (the reference logs row counts + previews
    * after every CTAS, retail_data.py:72-89): each barrier records
    * (stage, rows, elapsed_ms), logged as it completes and materialized
    * as the `pipeline_build_report` table — one row per CTAS stage.
    */
  def build(spark: SparkSession, sfDir: String, warehouse: String): Catalog = {
    import spark.implicits._
    val cat = new Catalog(spark, warehouse)

    val report =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    def stage(name: String)(body: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val written = body
      val writeMs = (System.nanoTime() - t0) / 1000000 // the CTAS itself
      val rows = written.count()       // counts the materialized parquet
      val countMs = (System.nanoTime() - t0) / 1000000 - writeMs
      log.info(s"pipeline stage $name: $rows rows in $writeMs ms " +
        s"(+$countMs ms count)")
      report += ((name, rows, writeMs, countMs))
      written
    }

    // Phase 1 — staging (P1 renames, D1 casts; S1-analog ingestion is
    // exercised separately via Sources).
    val o = Graft.table(spark, sfDir, "orders")
    val cu = Graft.table(spark, sfDir, "customer")
    val na = Graft.table(spark, sfDir, "nation")
    stage("raw_sales") { cat.save("raw_sales", rawSales(spark, sfDir)) }

    // Phase 2 — dimensions.
    val b = cat.table("raw_sales")
      .agg(min(to_date($"invoice_ts")), max(to_date($"invoice_ts"))).head()
    val (lo, hi) = (b.getDate(0), b.getDate(1))          // driver barrier
    val series = Functions.dateSeries(spark, lo, hi)
    val holidays = series.select(trunc($"date", "month").as("holiday_date"))
      .distinct()                                        // pseudo-holiday set
    val calendar = series
      .select($"date",
        Functions.dowSun0($"date").cast("long").as("day_of_week"),
        Functions.isWeekend($"date").as("is_weekend"),
        Functions.isoYear($"date").cast("long").as("iso_year"),
        Functions.isoWeek($"date").cast("long").as("iso_week"),
        month($"date").cast("long").as("month"),
        year($"date").cast("long").as("year"),
        Functions.dayName($"date").as("day_name"),
        Functions.monthName($"date").as("month_name"))
      .join(broadcast(holidays), $"date" === $"holiday_date", "left")
      .withColumn("is_holiday", $"holiday_date".isNotNull)  // M1 as join
      .drop("holiday_date")
    stage("dim_calendar") {
      cat.save("dim_calendar", calendar, sortBy = Seq("date"))
    }

    val product = Functions.modeDet(
        cat.table("raw_sales").filter($"stock_code".isNotNull),
        Seq("stock_code"), "description", "description")
      .join(cat.table("raw_sales").groupBy($"stock_code")
        .agg(min(to_date($"invoice_ts")).as("first_seen"),
          max(to_date($"invoice_ts")).as("last_seen")), Seq("stock_code"))
    stage("dim_product") {
      cat.save("dim_product", product, sortBy = Seq("stock_code"))
    }

    // The UNKNOWN (-1) surrogate row is always present, so facts whose
    // customer_id coalesces to -1 survive the inner dim join instead of
    // being silently dropped (dimensions.py:206 analog).
    val customerReal = Functions.modeDet(
        customerCountry(cu, na), Seq("customer_id"), "country", "country")
    val unknownRow = Seq((-1L, "UNKNOWN")).toDF("customer_id", "country")
      .join(customerReal.filter($"customer_id" === -1L),
        Seq("customer_id"), "left_anti")
    val customer = customerReal.unionByName(unknownRow)
    stage("dim_customer") {
      cat.save("dim_customer", customer, sortBy = Seq("customer_id"))
    }

    // Phase 3 — facts.
    val fct = cat.table("raw_sales")
      .withColumn("date", to_date($"invoice_ts"))
      .filter($"stock_code".isNotNull && $"qty".isNotNull &&
        $"unit_price".isNotNull)
      .join(broadcast(cat.table("dim_calendar").select("date")), Seq("date"))
      .join(broadcast(cat.table("dim_product").select("stock_code")),
        Seq("stock_code"))
      .withColumn("customer_id", coalesce($"customer_id", lit(-1L)))
      .join(broadcast(cat.table("dim_customer").select("customer_id")),
        Seq("customer_id"))
      .withColumn("net_amount", $"qty" * $"unit_price")
      .withColumn("year", year($"date").cast("int"))
    stage("fct_sales") {
      cat.save("fct_sales", fct, sortBy = Seq("date", "invoice_no"),
        partitionBy = Seq("year"))
    }

    // daily FX-style rates: sparse per-date value forward-filled over a
    // gap-free series (J4 + W1).
    val fb = cat.table("fct_sales").agg(min($"date"), max($"date")).head()
    val rateDaily = dailyRates(o).withColumnRenamed("rate", "rate_raw")
    val rates = Functions.forwardFill(
        Functions.dateSeries(spark, fb.getDate(0), fb.getDate(1))
          .join(rateDaily, Seq("date"), "left"),
        "date", "rate_raw", "rate")
      .select($"date", $"rate")
    stage("daily_fx_rates") {
      cat.save("daily_fx_rates", rates, sortBy = Seq("date"))
    }

    val eur = cat.table("fct_sales")
      .join(broadcast(cat.table("daily_fx_rates")), Seq("date"))
      .withColumn("net_amount_eur", $"net_amount" / $"rate")
      .drop("rate")
    stage("fct_sales_eur") {
      cat.save("fct_sales_eur", eur, sortBy = Seq("date", "invoice_no"),
        partitionBy = Seq("year"))
    }

    // Phase 4 — rollup: fct ⋈ fct_eur on the composite key (J6), dims
    // re-attached (J7), the full 8-key daily group the reference carries
    // (facts.py:369-411: date, country + 6 calendar attrs — every attr
    // is functionally determined by date, so the extra keys widen the
    // table contract without changing group granularity) plus net_qty.
    val f = cat.table("fct_sales").as("f")
    val fe = cat.table("fct_sales_eur")
      .select($"invoice_no", $"stock_code", $"date", $"customer_id",
        $"net_amount_eur").as("fe")
    val agg = f.join(fe, Seq("invoice_no", "stock_code", "date", "customer_id"))
      .join(broadcast(cat.table("dim_customer")), Seq("customer_id"))
      .join(broadcast(cat.table("dim_calendar")
        .select($"date", $"is_weekend", $"is_holiday", $"iso_week",
          $"iso_year", $"year".as("cal_year"), $"month")), Seq("date"))
      .groupBy($"date", $"country", $"is_weekend", $"is_holiday",
        $"iso_week", $"iso_year", $"month", $"cal_year".as("year"))
      .agg(
        countDistinct(when($"status" =!= "F", $"invoice_no")).as("orders"),
        count(lit(1)).as("items"),
        Functions.dsum($"qty").as("net_qty"),
        Functions.dsum($"net_amount").as("net_revenue"),
        Functions.dsum($"net_amount_eur").as("net_revenue_eur"))
    stage("agg_country_day") {
      cat.save("agg_country_day", agg, sortBy = Seq("date", "country"))
    }

    // Phase 5 — the monthly view (S7; G6/P8/P14).
    cat.createView("v_monthly_sales_summary",
      monthlyFromAgg(spark, cat.table("agg_country_day")))

    cat.save("pipeline_build_report",
      report.toSeq.toDF("stage", "rows", "write_ms", "count_ms"))
    cat
  }

  /** The reference view's full column contract
    * (/root/reference/sql/views/monthly_sales_summary.sql:5-41):
    * time keys + month_start_date, trading_days, total_orders,
    * total_items, total_quantity, both revenue totals, and the derived
    * avg_daily_revenue / avg_daily_orders / avg_order_value ratios
    * (unrounded here — round(double, 2) is the one cross-engine
    * midpoint hazard, SURVEY.md §7.4).
    */
  private def monthlyFromAgg(spark: SparkSession,
                             agg: DataFrame): DataFrame = {
    import spark.implicits._
    agg
      // PRE-aggregation revenue filter, the reference's placement
      // (monthly_sales_summary.sql:31): return-only days leave the
      // monthly totals AND the trading_days count (RawRetailPipeline's
      // golden path has always filtered here; the two forms now agree)
      .filter($"net_revenue" > 0)
      .groupBy($"year", $"month", $"country")
      .agg(countDistinct($"date").as("trading_days"),
        sum($"orders").as("total_orders"),
        sum($"items").as("total_items"),
        Functions.dsum($"net_qty").as("total_quantity"),
        Functions.dsum($"net_revenue").as("total_revenue"),
        Functions.dsum($"net_revenue_eur").as("total_revenue_eur"))
      .withColumn("month_start_date",
        make_date($"year".cast("int"), $"month".cast("int"), lit(1)))
      .withColumn("avg_daily_revenue", $"total_revenue" / $"trading_days")
      .withColumn("avg_daily_orders",
        $"total_orders".cast("double") / $"trading_days")
      .withColumn("avg_order_value",
        $"total_revenue" / when($"total_orders" =!= 0, $"total_orders"))
  }

  /** Phase-1 staging frame shared by the staged build and the fused
    * plan: one definition of the renames and the unit-price expression,
    * so the two architectures cannot drift.
    */
  private[graft] def rawSales(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Graft.table(spark, sfDir, "lineitem")
    val o = Graft.table(spark, sfDir, "orders")
    val pa = Graft.table(spark, sfDir, "part")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(pa), li("l_partkey") === pa("p_partkey"))
      .select(
        o("o_orderkey").as("invoice_no"),
        li("l_partkey").as("stock_code"),
        pa("p_name").as("description"),
        li("l_quantity").as("qty"),
        (li("l_extendedprice") * (lit(1) - li("l_discount")) / li("l_quantity"))
          .as("unit_price"),
        o("o_orderdate").as("invoice_ts"),
        o("o_custkey").as("customer_id"),
        o("o_orderstatus").as("status"))
  }

  /** One definition of the daily rate formula (shared). */
  private[graft] def dailyRates(orders: DataFrame): DataFrame =
    orders.groupBy(to_date(orders("o_orderdate")).as("date"))
      .agg((max(orders("o_totalprice")) / 100000).as("rate"))

  /** One definition of the customer→country lookup (shared). */
  private[graft] def customerCountry(cu: DataFrame, na: DataFrame): DataFrame =
    cu.join(broadcast(na), cu("c_nationkey") === na("n_nationkey"))
      .select(coalesce(cu("c_custkey"), lit(-1L)).as("customer_id"),
        na("n_name").as("country"))

  /** The same 8-stage dataflow fused into ONE plan with a single
    * materialization barrier — the staging join — so Catalyst optimizes
    * across every other stage boundary (the alternative architecture
    * SURVEY.md §4 notes; both staged and fused are offered).
    * Applies the SAME null-handling as the staged build: not-null
    * filters on stock/qty/price, customer_id coalesced to -1, and the
    * UNKNOWN-country fallback (left join + coalesce stands in for the
    * always-present -1 dim row). Oracle-checked end-to-end by
    * `pipe_monthly_summary`.
    *
    * Why the one barrier: `gbp` and `eur` below both derive from the
    * staging join (lineitem⋈orders⋈part), and Catalyst has no common
    * subexpression reuse across a self-join — a fully lazy plan computes
    * the biggest join in the system twice (the j6 double-scan, fixed the
    * same way: scratch-materialize the shared frame once, pruned to the
    * seven columns downstream actually reads). At 100 TB one staged
    * write of the pruned staging frame is strictly cheaper than a second
    * full scan+join of the fact table.
    */
  def monthlySummaryLazy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Graft.table(spark, sfDir, "orders")
    val cu = Graft.table(spark, sfDir, "customer")
    val na = Graft.table(spark, sfDir, "nation")
    // memoized (keyed by the input dir): pipe_monthly_summary and the
    // dashboard-insights query both start from this staging frame — one
    // build per session, not one per consumer
    val raw = graft.queries.Scratch.memoized(spark, s"pipe_raw:$sfDir",
      "pipe_raw",
      rawSales(spark, sfDir)
        .filter($"stock_code".isNotNull && $"qty".isNotNull &&
          $"unit_price".isNotNull)
        .withColumn("date", to_date($"invoice_ts"))
        .withColumn("customer_id", coalesce($"customer_id", lit(-1L)))
        .withColumn("net_amount", $"qty" * $"unit_price")
        .select($"invoice_no", $"stock_code", $"date", $"customer_id",
          $"status", $"qty", $"net_amount"))
    val rates = dailyRates(o)
    val country = customerCountry(cu, na)
    val gbp = raw
    val eur = raw.join(broadcast(rates), Seq("date"))
      .select($"invoice_no", $"stock_code", $"date", $"customer_id",
        ($"net_amount" / $"rate").as("net_amount_eur"))
    val agg = gbp
      .join(eur, Seq("invoice_no", "stock_code", "date", "customer_id"))
      .join(broadcast(country), Seq("customer_id"), "left")
      .withColumn("country", coalesce($"country", lit("UNKNOWN")))
      .groupBy($"date", $"country",
        year($"date").cast("long").as("year"),
        month($"date").cast("long").as("month"))
      .agg(
        countDistinct(when($"status" =!= "F", $"invoice_no")).as("orders"),
        count(lit(1)).as("items"),
        Functions.dsum($"qty").as("net_qty"),
        Functions.dsum($"net_amount").as("net_revenue"),
        Functions.dsum($"net_amount_eur").as("net_revenue_eur"))
    monthlyFromAgg(spark, agg)
  }

  /** The monthly view materialized ONCE per session per input dir —
    * the warehouse shape for a view with several consumers:
    * `pipe_monthly_summary` (alphabetically first, pays the build) and
    * `r3_dashboard_insights` both read the same scratch parquet
    * instead of recomputing the fused 8-stage plan each. The fused
    * plan itself stays exercised — it IS this memo's builder — and
    * [[monthlySummaryLazy]] remains available where the unmaterialized
    * plan is the point (DashboardSpec's render-from-lazy case).
    */
  def monthlySummaryShared(spark: SparkSession, sfDir: String): DataFrame = {
    graft.queries.Scratch.memoized(spark, s"pipe_monthly:$sfDir",
      "pipe_monthly", monthlySummaryLazy(spark, sfDir))
  }

}
