-- Monthly Sales Summary View (Spark SQL dialect)
-- Aggregates the daily country rollup into monthly totals by country.
--
-- Dialect-adjusted analog of the reference's DuckDB view text
-- (/root/reference/sql/views/monthly_sales_summary.sql:5-41), executed
-- the same way the reference does: SQL text read from disk and handed
-- to the engine (/root/reference/analysis/analyze_monthly_sales.py:30-39)
-- via Catalog.createViewFromSql. Reads the registered agg_country_day
-- table; output is column-identical to the g6_monthly_summary query.
--
-- Dialect adjustments: TEMPORARY VIEW (Spark session catalog),
-- TRUNC(date, 'MONTH') for DATE_TRUNC-to-DATE, exact DECIMAL(38,6)
-- accumulation for the double sums (partitioning-independent totals),
-- and no ORDER BY in the view body (Spark views don't guarantee
-- order; consumers sort). The revenue filter sits PRE-aggregation
-- (WHERE net_revenue > 0), the reference's placement
-- (monthly_sales_summary.sql:31): return-only days are excluded from
-- monthly totals AND from trading_days.
CREATE OR REPLACE TEMPORARY VIEW v_monthly_sales_summary AS
SELECT
    CAST(EXTRACT(YEAR FROM date) AS BIGINT)  AS year,
    CAST(EXTRACT(MONTH FROM date) AS BIGINT) AS month,
    TRUNC(date, 'MONTH')                     AS month_start_date,
    country,
    COUNT(DISTINCT date)                     AS trading_days,
    SUM(orders)                              AS total_orders,
    SUM(items)                               AS total_items,
    CAST(SUM(CAST(net_qty AS DECIMAL(38,6))) AS DOUBLE)     AS total_quantity,
    CAST(SUM(CAST(net_revenue AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
    ROUND(CAST(SUM(CAST(net_revenue AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(DISTINCT date), 2)         AS avg_daily_revenue,
    ROUND(CAST(SUM(orders) AS DOUBLE) / COUNT(DISTINCT date), 2)
                                             AS avg_daily_orders,
    ROUND(CAST(SUM(CAST(net_revenue AS DECIMAL(38,6))) AS DOUBLE)
          / NULLIF(SUM(orders), 0), 2)       AS avg_order_value
FROM agg_country_day
WHERE net_revenue > 0  -- exclude days with only returns/cancellations
GROUP BY year, month, month_start_date, country
