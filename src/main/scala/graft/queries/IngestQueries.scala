package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{ExcelFixtures, Functions, XlsSource, XlsxSource}

/** Driver-visible oracle rows for the byte-level Excel readers (S1
  * multi-sheet .xlsx, S3 legacy BIFF8 .xls — `/root/reference/src/
  * ingestion/retail_data.py:27-38`, `holidays_data.py:26-33`).
  *
  * The fixture workbooks are written deterministically from
  * [[ExcelFixtures.Rows]] at query time, read back through the real
  * byte-level readers, and aggregated; the DuckDB oracle computes the
  * SAME aggregation over the SAME constant as a literal VALUES table —
  * so the whole ingest contract (sheet union + tag, header row, string
  * trim, schema cast, cancellation LIKE, negative qty) is hash-checked
  * by the driver without an Excel codec on the oracle side.
  *
  * Scale note: these fixtures are deliberately tiny — the scale path
  * for raw-format ingestion is staging to parquet once at the edge
  * (Sources.scala); a 100 TB corpus is never re-parsed per query.
  */
object IngestQueries {

  /** groupBy(source_sheet): rows, cancellations, qty, decimal-summed
    * revenue, distinct trimmed descriptions.
    */
  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(col("source_sheet"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("invoice").startsWith("C"), 1)).as("n_cancelled"),
        sum(col("qty")).as("total_qty"),
        Functions.dsum(col("qty") * col("price")).as("revenue"),
        countDistinct(col("description")).as("n_descriptions"))
      .orderBy("source_sheet")

  /** The same aggregation in DuckDB over the fixture constant. */
  private val oracleSql: String = {
    val values = ExcelFixtures.Rows.map {
      case (sheet, inv, qty, price, d, ctry) =>
        s"('$sheet', '$inv', CAST($qty AS BIGINT), CAST($price AS DOUBLE), '$d', '$ctry')"
    }.mkString(",\n  ")
    s"""WITH raw(source_sheet, invoice, qty, price, description, country) AS (VALUES
       |  $values)
       |SELECT source_sheet, COUNT(*) AS n_rows,
       |  CAST(COUNT(*) FILTER (invoice LIKE 'C%') AS BIGINT) AS n_cancelled,
       |  CAST(SUM(qty) AS BIGINT) AS total_qty,
       |  CAST(SUM(CAST(qty * price AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       |  COUNT(DISTINCT description) AS n_descriptions
       |FROM raw GROUP BY 1 ORDER BY source_sheet""".stripMargin
  }

  def all: Seq[Q] = Seq(

    Q("s1_xlsx_ingest",
      "S1 — multi-sheet .xlsx ingestion end-to-end: a two-sheet OOXML " +
        "workbook (inline strings, padded description cells, negative " +
        "qty, 'C'-cancellation) written byte-level, read back through " +
        "XlsxSource (zip + XML + trim + cast + sheet tag), aggregated " +
        "per sheet against a VALUES oracle over the same constant.",
      (s, _) => aggregate(
        XlsxSource(ExcelFixtures.xlsxPath(s), ExcelFixtures.schema).load(s)),
      Some(oracleSql)),

    Q("s3_xls_ingest",
      "S3 — legacy BIFF8 .xls ingestion end-to-end: the same workbook " +
        "as an OLE2 compound file (FAT chains, SST, LABELSST/RK/NUMBER " +
        "records) written byte-level, read back through XlsSource, " +
        "aggregated per sheet against the same VALUES oracle.",
      (s, _) => aggregate(
        XlsSource(ExcelFixtures.xlsPath(s), ExcelFixtures.schema).load(s)),
      Some(oracleSql))
  )
}
