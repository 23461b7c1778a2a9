package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pluggable raw-data sources (SURVEY.md §2.1 S1-S5).
  *
  * The reference ingests three raw formats with driver-side Python
  * (multi-sheet Excel via pandas, ECB SDMX XML via ElementTree, legacy
  * XLS) and registers each as a staged table
  * (the references src/ingestion modules). This container ships no
  * Excel codec, so spreadsheet-shaped inputs stage through
  * [[MultiSheetCsvSource]] (same schema + sheet-tag semantics); the XML
  * path is real (scala-xml, driver-side — the file is tiny in the
  * reference: 739 observations).
  */
trait Source {
  /** Load this source as a DataFrame (driver-side parse allowed for
    * small files; everything routed through Spark after staging).
    */
  def load(spark: SparkSession): DataFrame
}

/** S4: plain parquet table scan. */
final case class ParquetSource(path: String) extends Source {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** S1/S3 staging analog: one CSV per "sheet", each tagged with
  * `source_sheet` and vertically unioned (retail_data.py:27-38 semantics
  * incl. the U2 union and the P2 trim contract — string columns trimmed,
  * NULLs preserved rather than the pandas `'nan'` artifact; the engine
  * normalizes to NULL and documents it, SURVEY.md §7.4).
  */
final case class MultiSheetCsvSource(
    sheets: Seq[(String, String)],
    schema: StructType) extends Source {
  def load(spark: SparkSession): DataFrame = {
    val frames = sheets.map { case (sheetName, path) =>
      val raw = spark.read.schema(schema).option("header", "true").csv(path)
      val trimmed = raw.schema.fields.foldLeft(raw) { (df, f) =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          df.withColumn(f.name, trim(col(f.name)))
        else df
      }
      trimmed.withColumn("source_sheet", lit(sheetName))
    }
    frames.reduce(_ unionByName _)
  }
}

/** S2: ECB-SDMX-shaped XML FX rates, parsed driver-side with scala-xml.
  *
  * Mirrors `/root/reference/src/ingestion/fx_data.py:29-92` semantics:
  * requires a DataSet with at least one Series, asserts the series
  * currency attribute, skips individually-malformed observations with a
  * warning, and fails if no valid rate survives. Output: (date, rate).
  */
final case class XmlFxSource(path: String, expectCurrency: String = "GBP")
    extends Source {
  def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val root = scala.xml.XML.loadFile(path)
    val series = root \\ "Series"
    require(series.nonEmpty, s"no Series elements in $path")
    val cur = (series.head \@ "CURRENCY")
    require(cur == expectCurrency,
      s"expected CURRENCY=$expectCurrency, got $cur")
    val obs = series.head \\ "Obs"
    require(obs.nonEmpty, s"no observations in $path")
    val parsed = obs.flatMap { o =>
      val period = o \@ "TIME_PERIOD"
      val value = o \@ "OBS_VALUE"
      try Some((java.sql.Date.valueOf(period), value.toDouble))
      catch {
        case _: IllegalArgumentException | _: NumberFormatException =>
          System.err.println(s"[XmlFxSource] skipping malformed obs: " +
            s"TIME_PERIOD='$period' OBS_VALUE='$value'")
          None
      }
    }
    require(parsed.nonEmpty, s"no valid observations in $path")
    parsed.toDF("date", "rate")
  }
}

/** S5: an in-memory frame addressed as a table (DuckDB replacement-scan
  * analog — SQL referencing a live driver variable).
  */
final case class InMemorySource(df: DataFrame, name: String) extends Source {
  def load(spark: SparkSession): DataFrame = {
    df.createOrReplaceTempView(name)
    spark.table(name)
  }
}
