package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pluggable raw-data sources (SURVEY.md §2.1 S1-S5).
  *
  * The reference ingests three raw formats with driver-side Python
  * (multi-sheet Excel via pandas, ECB SDMX XML via ElementTree, legacy
  * XLS) and registers each as a staged table
  * (the reference's src/ingestion modules). All three are real
  * byte-level ingestion with no external codec: [[XlsxSource]] (zip +
  * OOXML parse), [[XlsSource]] (OLE2 container + BIFF8 records), and
  * the XML path via scala-xml (driver-side — the file is tiny in the
  * reference: 739 observations). [[MultiSheetCsvSource]] remains the
  * CSV staging path for pre-extracted sheets.
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

/** JSONL (newline-delimited JSON) document source — the raw format web
  * corpora actually arrive in. Reads with an explicit schema (inference
  * is a full extra pass at 100 TB) in PERMISSIVE mode: malformed lines
  * don't kill the 10-hour ingest job; they land in the
  * `_corrupt_record` column for quarantine, mirroring the reference's
  * skip-and-warn XML semantics (fx_data.py:85-87) at file scale.
  * `dropCorrupt` routes them out (count them first for observability).
  */
final case class JsonlSource(
    path: String,
    schema: StructType,
    dropCorrupt: Boolean = false) extends Source {
  def load(spark: SparkSession): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    if (dropCorrupt) raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    else raw
  }
}

/** S1 (byte-level): genuine multi-sheet `.xlsx` ingestion with NO
  * external codec — an .xlsx file is a zip of OOXML XML parts, so this
  * reads the workbook's sheet catalog, relationship map, shared-string
  * table, and each sheet's cell grid with `java.util.zip` + scala-xml,
  * driver-side (raw spreadsheets are small — the reference's full
  * retail workbook is ~1M rows in a few tens of MB; at 100 TB raw data
  * lands as CSV/parquet and this path is the compatibility shim, like
  * the reference's own pandas read).
  *
  * Mirrors `pd.read_excel(sheet_name=None)` semantics
  * (`/root/reference/src/ingestion/retail_data.py:27-38`): every sheet
  * is read in workbook order, tagged with `source_sheet`, and
  * vertically unioned; row 1 is the header; string cells are trimmed
  * and empty/missing cells are NULL (the engine's documented
  * NULL-not-'nan' contract, SURVEY.md §7.4). Cells are decoded per the
  * OOXML `t` attribute: `s` (shared string), `inlineStr`, `str`
  * (formula result), `b` (boolean), default numeric. Values surface as
  * strings and are cast to the caller's schema by column name.
  *
  * Date cells stored as Excel serial numbers are decoded via
  * styles.xml number-format resolution (what pd.read_excel does
  * through openpyxl): a numeric cell whose resolved format is a
  * date/time format surfaces as an ISO `yyyy-MM-dd` date (or
  * `yyyy-MM-dd HH:mm:ss` when the serial carries a time fraction /
  * the format has time tokens), using the 1900 date system including
  * its fictitious 1900-02-29 (serials >= 61 shift by one day).
  */
final case class XlsxSource(path: String, schema: StructType) extends Source {

  def load(spark: SparkSession): DataFrame = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      def part(name: String): Option[scala.xml.Elem] =
        Option(zip.getEntry(name)).map(e =>
          scala.xml.XML.load(zip.getInputStream(e)))
      val workbook = part("xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(
          s"$path is not an xlsx: missing xl/workbook.xml"))
      // r:id → worksheet part path (the rels map; scala-xml keys are
      // local names, so the prefixed r:id attribute matches key "id").
      val rels = part("xl/_rels/workbook.xml.rels").toSeq
        .flatMap(_ \ "Relationship")
        .map(r => (r \@ "Id") -> (r \@ "Target").stripPrefix("/xl/"))
        .toMap
      // Shared strings + sheet grids are parsed with StAX, not DOM: the
      // production workbook shape is ~1M rows (~150 MB of sheet XML and
      // a 60K+-entry SST), where a DOM would cost GBs of heap and
      // minutes of driver time. Small catalog parts stay DOM.
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => XlsxStax.sharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      // styles: cell style index -> (isDate, hasTime) via numFmt lookup
      val styles = part("xl/styles.xml")
      val customFmts = styles.toSeq.flatMap(_ \ "numFmts" \ "numFmt")
        .flatMap(n => (n \@ "numFmtId").toIntOption
          .map(_ -> (n \@ "formatCode")))
        .toMap
      val styleIsDate: IndexedSeq[(Boolean, Boolean)] =
        styles.toSeq.flatMap(_ \ "cellXfs" \ "xf").map { xf =>
          val fmtId = (xf \@ "numFmtId").toIntOption.getOrElse(0)
          ExcelCells.dateStyle(fmtId, customFmts.get(fmtId))
        }.toIndexedSeq
      val sheets = (workbook \ "sheets" \ "sheet").map { s =>
        val rid = s.attributes.iterator
          .collectFirst { case a if a.key == "id" && a.isPrefixed => a.value.text }
          .getOrElse("")
        (s \@ "name") -> rels.getOrElse(rid, "")
      }.filter(_._2.nonEmpty)
      require(sheets.nonEmpty, s"no sheets found in $path")
      // Mac-origin workbooks flag the 1904 date system on workbookPr;
      // serials then count from 1904-01-01 with no phantom leap day.
      val date1904 = (workbook \ "workbookPr").headOption
        .map(_ \@ "date1904").exists(v => v == "1" || v == "true")

      // Parse-once-at-the-edge, stage-columnar: each sheet streams
      // through StAX into a JSONL spill file (bounded driver memory —
      // one row in flight), then Spark reads the spills with an explicit
      // schema so the cast/trim/tag path is distributed.
      val spillRoot = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
        "graft_xlsx_spill_")
      // JVM-exit cleanup: the frames read the spills lazily, so eager
      // deletion is impossible — but a session that loads workbooks
      // repeatedly must not leak a sheet-sized JSONL per load forever.
      spillRoot.toFile.deleteOnExit()
      val frames = sheets.zipWithIndex.map { case ((sheetName, target), si) =>
        val entry = Option(zip.getEntry(s"xl/$target")).getOrElse(
          throw new IllegalArgumentException(s"missing part xl/$target"))
        // named by POSITION: distinct sheet names can share a hashCode
        // ("Aa"/"BB"), and a colliding name would truncate the first
        // sheet's spill before its lazy frame ever read it.
        val spill = spillRoot.resolve(s"sheet_$si.jsonl")
        val header = XlsxStax.sheetToJsonl(zip.getInputStream(entry), shared,
          styleIsDate, spill, date1904)
        spill.toFile.deleteOnExit()
        // A schema column absent from the sheet header is a caller
        // error, not an all-NULL column: the JSON read with an explicit
        // schema would silently null it, where the former DOM path's
        // select threw — keep the loud contract.
        val missing = schema.fieldNames.filterNot(header.contains)
        require(missing.isEmpty,
          s"$path sheet '$sheetName': header is missing schema column(s) " +
            s"${missing.mkString(", ")} (header: ${header.mkString(", ")})")
        val allString = StructType(schema.fields.map(f =>
          org.apache.spark.sql.types.StructField(f.name,
            org.apache.spark.sql.types.StringType)))
        spark.read.schema(allString).json(spill.toString)
          .select(schema.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
          .withColumn("source_sheet", lit(sheetName))
      }
      frames.reduce(_ unionByName _)
    } finally zip.close()
  }
}

/** StAX (streaming) parsers for the two big xlsx parts. Cell semantics
  * are identical to the former DOM path (oracle-gated by s1/u2 and
  * XlsxSpec): `t`-attribute dispatch (shared string / inlineStr / bool /
  * formula-str / numeric), date-styled serials decoded to ISO via
  * [[ExcelCells]], values trimmed, missing cells NULL, row 1 = header.
  */
private[engine] object XlsxStax {

  private def factory: javax.xml.stream.XMLInputFactory = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f
  }

  /** sharedStrings.xml → SST table: every `t` descendant of an `si`
    * concatenated (rich-text runs), same as the former DOM
    * `(si \\ "t").map(_.text).mkString`.
    */
  def sharedStrings(in: java.io.InputStream): IndexedSeq[String] = {
    val out = scala.collection.immutable.IndexedSeq.newBuilder[String]
    val r = factory.createXMLStreamReader(in)
    val sb = new java.lang.StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.setLength(0)
              case "t" if inSi => inT = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS
               | javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += sb.toString
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  private def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** One worksheet → JSONL spill: row 1 becomes the key set (header
    * names, trimmed; `_cN` for columns past the header), every later
    * row becomes one JSON object of the present cells (trimmed). One
    * row in flight — memory is O(row), not O(sheet). Returns the
    * header names, so the caller can validate its schema against them.
    */
  def sheetToJsonl(in: java.io.InputStream, shared: IndexedSeq[String],
                   styleIsDate: IndexedSeq[(Boolean, Boolean)],
                   out: java.nio.file.Path,
                   date1904: Boolean = false): Seq[String] = {
    val w = java.nio.file.Files.newBufferedWriter(out,
      java.nio.charset.StandardCharsets.UTF_8)
    val r = factory.createXMLStreamReader(in)
    var header: Map[Int, String] = null
    var rowCells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var cellPos = 0
    // current-cell state
    var cType = ""
    var cIdx = 0
    var cStyle: Option[(Boolean, Boolean)] = None
    var inV = false
    var vSeen = false
    var inIsT = false
    var inRow = false
    val vText = new java.lang.StringBuilder
    val isText = new java.lang.StringBuilder
    def keyOf(i: Int): String =
      header.getOrElse(i, s"_c$i")
    def endCell(): Unit = {
      val v: Option[String] = cType match {
        case "s" =>
          if (!vSeen) None
          else vText.toString.trim.toIntOption.flatMap(shared.lift)
        case "inlineStr" => Some(isText.toString)
        case "b" =>
          if (!vSeen) None
          else Some(if (vText.toString.trim == "1") "true" else "false")
        case "str" => if (vSeen) Some(vText.toString) else None
        // error cells (#DIV/0!, #VALUE!, ...) are NULL in the
        // pd.read_excel contract — never data, even for string columns
        case "e" => None
        case _ =>
          if (!vSeen) None
          else {
            val raw = vText.toString
            cStyle match {
              case Some((true, withTime)) =>
                Some(raw.trim.toDoubleOption
                  .map(ExcelCells.serialToIso(_, withTime, date1904))
                  .getOrElse(raw))
              case _ =>
                // Writers emit large/small numerics in scientific
                // notation (`1.067371E7`); a LongType cast of that
                // string is NULL — silent data loss. Normalize through
                // the numeric renderer (integral doubles print plain).
                if (raw.indexOf('E') >= 0 || raw.indexOf('e') >= 0)
                  Some(raw.trim.toDoubleOption
                    .map(ExcelCells.numericText).getOrElse(raw))
                else Some(raw)
            }
          }
      }
      v.foreach(s => rowCells += cIdx -> s)
    }
    def endRow(): Unit = {
      if (header == null) {
        header = rowCells.map { case (i, s) => i -> s.trim }.toMap
      } else {
        val sb = new java.lang.StringBuilder(64)
        sb.append('{')
        var first = true
        rowCells.foreach { case (i, s) =>
          if (!first) sb.append(',')
          first = false
          sb.append('"').append(jsonEscape(keyOf(i))).append("\":\"")
            .append(jsonEscape(s.trim)).append('"')
        }
        sb.append('}')
        w.write(sb.toString)
        w.newLine()
      }
      rowCells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => inRow = true; cellPos = 0
              case "c" if inRow =>
                val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
                val letters = ref.takeWhile(_.isLetter)
                cIdx =
                  if (letters.isEmpty) cellPos
                  else letters.foldLeft(0)(
                    (acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
                cellPos += 1
                cType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cStyle = Option(r.getAttributeValue(null, "s"))
                  .flatMap(_.toIntOption).flatMap(styleIsDate.lift)
                vText.setLength(0); isText.setLength(0)
                inV = false; vSeen = false
              case "v" => inV = true; vSeen = true
              case "t" => inIsT = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS
               | javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inV) vText.append(r.getText)
            else if (inIsT) isText.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" if inRow => endCell()
              case "row" if inRow => endRow(); inRow = false
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally {
      r.close()
      w.close()
    }
    require(header != null, s"sheet is empty (no header row): $out")
    header.values.toSeq
  }
}
