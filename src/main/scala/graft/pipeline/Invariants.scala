package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** The reference's inline validation barrage as a checkable suite
  * (SURVEY.md §5): each check returns its violation count; the pipeline
  * is healthy iff every count is zero.
  */
object Invariants {

  /** All checks as one labeled frame (U1 shape: check_name, violations). */
  def checkAll(cat: Catalog): DataFrame = {
    val spark = cat.spark
    import spark.implicits._

    def branch(nm: String, violations: Long): DataFrame =
      Seq((nm, violations)).toDF("check_name", "violations")

    // Schema adapters — one checker serves both warehouses:
    // RetailPipeline's testdata chain names the columns (rate,
    // net_amount, net_amount_eur); the raw-file chain
    // (RawRetailPipeline) keeps the reference's own contracts
    // (gbp_per_eur, gross_amount_gbp, gross_amount_eur). The checked
    // identities are the same either way (eur = gbp / rate row-wise).
    val fx0 = cat.table("daily_fx_rates")
    val fx = if (fx0.columns.contains("rate")) fx0
             else fx0.withColumnRenamed("gbp_per_eur", "rate")
    val eur0 = cat.table("fct_sales_eur")
    val eur = if (eur0.columns.contains("net_amount_eur")) eur0
              else eur0.withColumn("net_amount_eur", $"gross_amount_eur")
                       .withColumn("net_amount", $"gross_amount_gbp")

    // Calendar continuity via LAG (dimensions.py:129-143).
    val w = Window.orderBy("date")
    val gaps = cat.table("dim_calendar")
      .withColumn("prev", lag($"date", 1).over(w))
      .filter($"prev".isNotNull && datediff($"date", $"prev") > 1)
      .count()

    // Referential integrity anti-joins (facts.py:114-150).
    val fct = cat.table("fct_sales")
    val orphanCal = fct.join(cat.table("dim_calendar"), Seq("date"), "left_anti").count()
    val orphanProd = fct.join(cat.table("dim_product"), Seq("stock_code"), "left_anti").count()
    val orphanCust = fct.join(cat.table("dim_customer"), Seq("customer_id"), "left_anti").count()

    // FX coverage: every fact date has a rate (facts.py:210-221).
    val uncovered = fct.select("date").distinct()
      .join(fx.filter($"rate".isNotNull), Seq("date"), "left_anti").count()

    // Conversion completeness: no NULL EUR amounts (facts.py:332-344).
    val nullEur = eur.filter($"net_amount_eur".isNull).count()

    // Reconciliation: EUR == GBP / rate row-wise (facts.py:296-312) —
    // checked with the exact identity, not the 10% tolerance, because we
    // control both sides.
    val mismatch = eur
      .join(fx, Seq("date"))
      .filter($"net_amount_eur" =!= $"net_amount" / $"rate").count()

    // Aggregate quality (facts.py:523-555): no negative order or item
    // counts in the rollup.
    val negAgg = cat.table("agg_country_day")
      .filter($"orders" < 0 || $"items" < 0).count()

    // The reference's relative-error formula ported verbatim
    // (facts.py:544: ABS(a-b)/NULLIF(b,0) > 0.1), applied row-wise:
    // the implied conversion rate net/net_eur must sit within 10% of
    // the day's rate. (The hardcoded 0.8654 average is GBP/EUR-specific;
    // the row-wise day rate is its testdata analog.)
    val relErr = eur
      .join(fx, Seq("date"))
      .filter($"net_amount_eur" =!= 0)
      .filter(abs($"net_amount" / $"net_amount_eur" - $"rate") /
        when($"rate" =!= 0, $"rate") > 0.1)
      .count()

    branch("calendar_gaps", gaps)
      .unionByName(branch("fct_orphan_calendar", orphanCal))
      .unionByName(branch("fct_orphan_product", orphanProd))
      .unionByName(branch("fct_orphan_customer", orphanCust))
      .unionByName(branch("fx_uncovered_dates", uncovered))
      .unionByName(branch("null_eur_amounts", nullEur))
      .unionByName(branch("eur_gbp_mismatch", mismatch))
      .unionByName(branch("negative_agg_counts", negAgg))
      .unionByName(branch("fx_rel_error_gt_10pct", relErr))
  }
}
