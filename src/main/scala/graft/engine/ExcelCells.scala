package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared Excel semantics for the two byte-level spreadsheet readers
  * ([[XlsxSource]] OOXML, [[XlsSource]] BIFF8): date-format detection,
  * 1900-system serial decoding, and the common cell-grid →
  * DataFrame contract (header row consumed, strings trimmed, missing
  * cells NULL, values cast to the caller's schema, sheets tagged with
  * `source_sheet` and unioned in workbook order — the
  * pd.read_excel(sheet_name=None) semantics of
  * /root/reference/src/ingestion/retail_data.py:27-38).
  */
object ExcelCells {

  /** Built-in number-format ids that are date/time formats (ECMA-376
    * §18.8.30; BIFF8 builtins share the same id space): 14-22
    * date/datetime, 45-47 durations.
    */
  val BuiltinDateFmts: Set[Int] = (14 to 22).toSet ++ (45 to 47).toSet

  /** Heuristic for CUSTOM format codes (mirrors openpyxl's
    * is_date_format): after stripping quoted literals, escapes, and
    * color/locale brackets, a code with any of y/m/d/h/s tokens and no
    * numeric placeholders is a date/time format.
    */
  def isDateCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")  // quoted literals
      .replaceAll("\\\\.", "")        // escaped chars
      .replaceAll("\\[[^\\]]*\\]", "") // [Red], [$-409], [h] elapsed
    stripped.exists(c => "ymdhsYMDHS".indexOf(c.toInt) >= 0) &&
      !stripped.exists(c => c == '0' || c == '#' || c == '?')
  }

  def hasTimeTokens(code: String): Boolean =
    code.replaceAll("\"[^\"]*\"", "").exists(c => "hsHS".indexOf(c.toInt) >= 0)

  /** (isDate, withTime) for a resolved numFmtId + optional custom code. */
  def dateStyle(fmtId: Int, code: Option[String]): (Boolean, Boolean) = {
    val isDate = BuiltinDateFmts.contains(fmtId) || code.exists(isDateCode)
    val withTime = (fmtId >= 18 && fmtId <= 22) ||
      (fmtId >= 45 && fmtId <= 47) || code.exists(hasTimeTokens)
    (isDate, withTime)
  }

  /** Excel serial → ISO string. 1900 system (default): day 1 =
    * 1900-01-01; the fictitious 1900-02-29 (serial 60) collapses onto
    * 02-28, serials after it shift back one day — openpyxl/xlrd
    * convention. 1904 system (`date1904`, the Mac-origin workbook
    * flag): day 0 = 1904-01-01 and there is no phantom leap day.
    */
  def serialToIso(serial: Double, withTime: Boolean,
                  date1904: Boolean = false): String = {
    val days0 = math.floor(serial).toLong
    val date =
      if (date1904) java.time.LocalDate.of(1904, 1, 1).plusDays(days0)
      else java.time.LocalDate.of(1899, 12, 31)
        .plusDays(if (days0 >= 60) days0 - 1 else days0)
    val secs = math.round((serial - days0) * 86400)
    if (withTime || secs != 0)
      java.time.LocalDateTime.of(date, java.time.LocalTime.MIDNIGHT)
        .plusSeconds(secs)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
    else date.toString
  }

  /** Render a numeric cell value the way its text form reads: integral
    * doubles without the trailing `.0` (so LongType casts work), others
    * via Double.toString.
    */
  def numericText(v: Double): String =
    if (v == math.floor(v) && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  /** The shared grid contract: each sheet is (name, rows), each row a
    * sparse colIndex → raw-string map; row 0 of each sheet is the
    * header. Builds the trimmed/cast/tagged union.
    */
  def sheetsToDf(spark: SparkSession, schema: StructType,
                 sheets: Seq[(String, Seq[Map[Int, String]])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val frames = sheets.map { case (sheetName, grid) =>
      require(grid.nonEmpty, s"sheet $sheetName is empty")
      val header = grid.head
      val width = (header.keys ++ grid.tail.flatMap(_.keys)).max + 1
      val names = (0 until width).map(i => header.getOrElse(i, s"_c$i").trim)
      val rows = grid.tail.map(cells =>
        org.apache.spark.sql.Row.fromSeq(
          (0 until width).map(i => cells.get(i).map(_.trim).orNull)))
      val rawSchema = StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
      val raw = spark.createDataFrame(rows.asJava, rawSchema)
      raw.select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        .withColumn("source_sheet", lit(sheetName))
    }
    frames.reduce(_ unionByName _)
  }
}
