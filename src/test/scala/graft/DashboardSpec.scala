package graft

import org.apache.spark.sql.functions._
import graft.engine.Dashboard
import graft.pipeline.RetailPipeline

/** S9 — the SVG dashboard over the monthly view: structure, panel
  * content, and determinism. The data layer (insights) is oracle-gated
  * by r3_dashboard_insights; this spec covers the render.
  */
class DashboardSpec extends SparkTestBase {

  private lazy val monthly = RetailPipeline.monthlySummaryLazy(spark, sfDir)

  test("dashboard renders all four reference panels as valid XML") {
    val svg = Dashboard.render(monthly)
    val xml = scala.xml.XML.loadString(svg) // parses or throws
    assert((xml \\ "text").exists(_.text == "Monthly Revenue Trends (Top 5 Countries)"))
    assert((xml \\ "text").exists(_.text == "Total Revenue by Country"))
    assert((xml \\ "text").exists(_.text == "Monthly Order Volume"))
    assert((xml \\ "text").exists(_.text == "Average Order Value by Country"))
  }

  test("panel content tracks the data: 5 trend lines, months-many bars") {
    val svg = Dashboard.render(monthly)
    val xml = scala.xml.XML.loadString(svg)
    val nCountries = monthly.select("country").distinct().count()
    val expectedLines = math.min(5L, nCountries)
    assert((xml \\ "polyline").size == expectedLines)
    val nMonths = monthly.select("year", "month").distinct().count()
    // order-volume panel draws one bar per month (counted by class,
    // not color — a legend swatch can share the palette color)
    val volumeBars = (xml \\ "rect").count(r =>
      (r \@ "class") == "vol-bar")
    assert(volumeBars == nMonths, s"$volumeBars bars for $nMonths months")
  }

  test("render is deterministic: same warehouse, byte-identical SVG") {
    assert(Dashboard.render(monthly) == Dashboard.render(monthly))
  }

  test("insights agree with directly recomputed totals") {
    val i = Dashboard.insights(spark, monthly).head()
    val direct = monthly.agg(
      sum(col("total_revenue").cast(
        org.apache.spark.sql.types.DecimalType(38, 6))).cast("double"),
      sum(col("total_orders"))).head()
    assert(math.abs(i.getDouble(0) - direct.getDouble(0)) < 1e-6)
    assert(i.getLong(2) == direct.getLong(1))
    assert(i.getString(4).matches("\\d{4}-\\d{2}")) // best_month format
  }
}
