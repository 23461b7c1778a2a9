package graft.engine

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Deterministic retail-shaped Excel fixtures, written byte-level in
  * both raw formats the reference ingests — OOXML `.xlsx`
  * (`/root/reference/src/ingestion/retail_data.py:27-38`) and legacy
  * BIFF8 `.xls` (`holidays_data.py:26-33`) — so the byte-level readers
  * ([[XlsxSource]], [[XlsSource]]) get driver-visible oracle rows, not
  * only spec coverage. The row content is a compile-time constant, so
  * the ingestion queries' DuckDB oracles are generated from the same
  * constant as literal VALUES — exact, no Excel codec needed on the
  * oracle side.
  *
  * The fixtures deliberately exercise the ingest contract: two year
  * sheets (union + `source_sheet` tag), a 'C'-prefixed cancellation
  * row, a negative quantity, and a description stored with surrounding
  * whitespace (the readers trim; the oracle holds the clean value).
  */
object ExcelFixtures {

  /** (sheet, invoice, qty, price, description, country) — description
    * as it should read AFTER trimming.
    */
  val Rows: Seq[(String, String, Long, Double, String, String)] = Seq(
    ("Year 2009-2010", "INV-1", 6L, 2.55, "WHITE MUG", "United Kingdom"),
    ("Year 2009-2010", "INV-1", 8L, 1.25, "RED LANTERN", "United Kingdom"),
    ("Year 2009-2010", "C-INV-2", -6L, 2.55, "WHITE MUG", "France"),
    ("Year 2010-2011", "INV-3", 12L, 0.42, "WHITE MUG", "Germany"),
    ("Year 2010-2011", "INV-4", 3L, 4.95, "BLUE TEAPOT", "United Kingdom"))

  val Sheets: Seq[String] = Rows.map(_._1).distinct

  val schema: StructType = StructType(Seq(
    StructField("invoice", StringType),
    StructField("qty", LongType),
    StructField("price", DoubleType),
    StructField("description", StringType),
    StructField("country", StringType)))

  /** Raw description as stored in the files: padded on the first row of
    * each sheet to prove the trim contract end-to-end.
    */
  private def rawDesc(sheet: String, idx: Int, d: String): String =
    if (idx == 0) s"  $d  " else d

  private def scratch(spark: SparkSession): java.io.File = {
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_fixtures_" +
        spark.sparkContext.applicationId)
    dir.mkdirs()
    dir
  }

  /** Write-to-temp-then-rename: a crash mid-write must not leave a
    * truncated file that later calls (guarded only by exists()) treat
    * as complete for the rest of the session. The temp name is unique
    * per call (not a shared `$name.tmp`): two concurrent callers — e.g.
    * parallel test suites sharing one SparkSession — would otherwise
    * interleave bytes into the same temp path and the first ATOMIC_MOVE
    * could publish a corrupt fixture. With unique temps each writer
    * completes its own file; the moves race benignly (REPLACE_EXISTING,
    * identical deterministic bytes).
    */
  private def ensure(spark: SparkSession, name: String,
                     write: String => Unit): String = {
    val f = new java.io.File(scratch(spark), name)
    if (!f.exists()) {
      val tmp = java.io.File.createTempFile(s"$name.", ".tmp", scratch(spark))
      write(tmp.toString)
      Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    f.toString
  }

  def xlsxPath(spark: SparkSession): String =
    ensure(spark, "retail_fixture.xlsx", writeXlsx)

  def xlsPath(spark: SparkSession): String =
    ensure(spark, "retail_fixture.xls", writeXls)

  // ---------------------------------------------------------------- xlsx

  private def writeXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    put("xl/workbook.xml",
      s"""<workbook xmlns="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        Sheets.zipWithIndex.map { case (n, i) =>
          s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        Sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
        "</Relationships>")
    Sheets.zipWithIndex.foreach { case (sheet, si) =>
      val rows = Rows.filter(_._1 == sheet)
      val header = schema.fieldNames.zipWithIndex.map { case (h, _) =>
        s"""<c t="inlineStr"><is><t>$h</t></is></c>"""
      }.mkString
      val body = rows.zipWithIndex.map { case ((_, inv, qty, price, d, ctry), ri) =>
        val cells = Seq(
          s"""<c t="inlineStr"><is><t>${esc(inv)}</t></is></c>""",
          s"""<c><v>$qty</v></c>""",
          s"""<c><v>$price</v></c>""",
          s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(rawDesc(sheet, ri, d))}</t></is></c>""",
          s"""<c t="inlineStr"><is><t>${esc(ctry)}</t></is></c>""")
        s"<row>${cells.mkString}</row>"
      }.mkString
      put(s"xl/worksheets/sheet${si + 1}.xml",
        s"""<worksheet xmlns="$ns"><sheetData><row>$header</row>$body</sheetData></worksheet>""")
    }
    zos.close()
  }

  // ----------------------------------------------------------- BIFF8 xls

  import BiffWriter._

  private def writeXls(path: String): Unit = {
    // SST: headers first, then every distinct string value in row order
    val strings = (schema.fieldNames.toSeq ++ Sheets.flatMap { sheet =>
      Rows.filter(_._1 == sheet).zipWithIndex.flatMap {
        case ((_, inv, _, _, d, ctry), ri) =>
          Seq(inv, rawDesc(sheet, ri, d), ctry)
      }
    }).distinct
    val isst = strings.zipWithIndex.toMap
    def sheetBytes(sheet: String): Array[Byte] = {
      val rows = Rows.filter(_._1 == sheet)
      val header = schema.fieldNames.zipWithIndex.map { case (h, c) =>
        labelSst(0, c, isst(h))
      }.reduce(_ ++ _)
      val body = rows.zipWithIndex.map {
        case ((_, inv, qty, price, d, ctry), ri) =>
          labelSst(ri + 1, 0, isst(inv)) ++
            rkInt(ri + 1, 1, 0, qty) ++
            number(ri + 1, 2, 0, price) ++
            labelSst(ri + 1, 3, isst(rawDesc(sheet, ri, d))) ++
            labelSst(ri + 1, 4, isst(ctry))
      }.reduce(_ ++ _)
      bof(0x10) ++ header ++ body ++ eof
    }
    val globalsPrefix = bof(0x05) ++ xf(0) ++ sst(strings)
    val bsLen = Sheets.map(boundSheet(0, _).length).sum
    val globalsLen = globalsPrefix.length + bsLen + eof.length
    val sheetBlobs = Sheets.map(sheetBytes)
    val offsets = sheetBlobs.scanLeft(globalsLen.toLong)(_ + _.length)
    val wb = globalsPrefix ++
      Sheets.zip(offsets).map { case (n, o) => boundSheet(o, n) }
        .reduce(_ ++ _) ++
      eof ++ sheetBlobs.reduce(_ ++ _)
    Files.write(Paths.get(path), ole2(wb)): Unit
  }

}

/** THE byte-level BIFF8/OLE2 writer toolkit — one implementation shared
  * by the fixture writer above and XlsSpec's hand-assembled workbooks,
  * so the test helper and the fixture generator can never drift into
  * emitting different byte layouts (mirror of the reader split:
  * XlsSource/XlsxSource share ExcelCells).
  */
private[graft] object BiffWriter {

  def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  def u32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  def dbl(v: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(v); bb.array()
  }
  def rec(id: Int, body: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(body.length) ++ body
  /** BIFF8 unicode string, compressed, no rich/ext. */
  def str16(s: String): Array[Byte] =
    u16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  def str8(s: String): Array[Byte] =
    Array(s.length.toByte, 0.toByte) ++ s.getBytes("ISO-8859-1")
  def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(substreamType) ++ Array.fill(12)(0.toByte))
  val eof: Array[Byte] = rec(0x000A, Array.emptyByteArray)
  def xf(fmtId: Int): Array[Byte] =
    rec(0x00E0, u16(0) ++ u16(fmtId) ++ Array.fill(16)(0.toByte))
  def format(fmtId: Int, code: String): Array[Byte] =
    rec(0x041E, u16(fmtId) ++ str16(code))
  def boundSheet(pos: Long, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++ str8(name))
  def sst(strings: Seq[String]): Array[Byte] =
    rec(0x00FC, u32(strings.length) ++ u32(strings.length) ++
      strings.flatMap(str16).toArray)
  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, u16(row) ++ u16(col) ++ u16(0) ++ u32(isst))
  def number(row: Int, col: Int, xfIdx: Int, v: Double): Array[Byte] =
    rec(0x0203, u16(row) ++ u16(col) ++ u16(xfIdx) ++ dbl(v))
  def rkInt(row: Int, col: Int, xfIdx: Int, v: Long,
            div100: Boolean = false): Array[Byte] =
    rec(0x027E, u16(row) ++ u16(col) ++ u16(xfIdx) ++
      u32(((v << 2) & 0xFFFFFFFCL) | 2L | (if (div100) 1L else 0L)))
  def rkFloat(row: Int, col: Int, xfIdx: Int, v: Double): Array[Byte] =
    rec(0x027E, u16(row) ++ u16(col) ++ u16(xfIdx) ++
      u32((java.lang.Double.doubleToLongBits(v) >>> 32) & 0xFFFFFFFCL))
  def mulRk(row: Int, colFirst: Int,
            vals: Seq[(Int, Int)]): Array[Byte] = // (xf, intVal)
    rec(0x00BD, u16(row) ++ u16(colFirst) ++
      vals.flatMap { case (x, v) =>
        u16(x) ++ u32(((v.toLong << 2) & 0xFFFFFFFCL) | 2L)
      }.toArray ++ u16(colFirst + vals.length - 1))
  def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, u16(row) ++ u16(col) ++ u16(0) ++
      Array((if (v) 1 else 0).toByte, 0.toByte))
  /** FORMULA with a cached numeric result (empty parsed expression —
    * readers take the cached value).
    */
  def formulaNum(row: Int, col: Int, xfIdx: Int, v: Double): Array[Byte] =
    rec(0x0006, u16(row) ++ u16(col) ++ u16(xfIdx) ++ dbl(v) ++
      u16(0) ++ u32(0) ++ u16(0)) // grbit, chn, cce=0
  /** FORMULA whose cached result is a string: num = tag 0 + 0xFFFF
    * marker; the value itself follows in a STRING record.
    */
  def formulaStr(row: Int, col: Int, xfIdx: Int): Array[Byte] =
    rec(0x0006, u16(row) ++ u16(col) ++ u16(xfIdx) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
      u16(0) ++ u32(0) ++ u16(0))
  def stringRec(s: String): Array[Byte] = rec(0x0207, str16(s))

  /** Minimal OLE2 container (regular FAT path: stream padded >= 4096 so
    * the mini-stream is not involved). Layout: header, FAT sector,
    * directory sector, stream sectors.
    */
  def ole2(workbook: Array[Byte]): Array[Byte] = {
    val targetLen = math.max(4096, ((workbook.length + 511) / 512) * 512)
    val padded = workbook ++ Array.fill(targetLen - workbook.length)(0.toByte)
    val streamSects = padded.length / 512
    // This minimal layout allots exactly ONE FAT sector (126 stream
    // entries + 2); a bigger workbook would silently shift the
    // directory and corrupt the container — fail fast instead.
    require(streamSects <= 126,
      s"fixture workbook too large for the single-FAT-sector layout: " +
        s"$streamSects sectors > 126")
    val fat = new ByteArrayOutputStream()
    fat.write(u32(0xFFFFFFFDL)) // sector 0 = FAT sector
    fat.write(u32(0xFFFFFFFEL)) // sector 1 = directory (end of chain)
    (0 until streamSects).foreach { i =>
      fat.write(u32(if (i == streamSects - 1) 0xFFFFFFFEL else (3 + i).toLong))
    }
    while (fat.size() < 512) fat.write(u32(0xFFFFFFFFL))
    def dirEntry(name: String, objType: Int, start: Long, size: Long,
                 child: Long = 0xFFFFFFFFL): Array[Byte] = {
      val e = java.nio.ByteBuffer.allocate(128)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val utf16 = name.getBytes("UTF-16LE")
      e.put(utf16)
      e.putShort(64, (utf16.length + 2).toShort)
      e.put(66, objType.toByte)
      e.put(67, 1.toByte)
      e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, child.toInt)
      e.putInt(116, start.toInt)
      e.putInt(120, size.toInt)
      e.array()
    }
    val dir = dirEntry("Root Entry", 5, 0xFFFFFFFEL, 0, child = 1) ++
      dirEntry("Workbook", 2, 2, padded.length.toLong) ++
      Array.fill(256)(0.toByte)
    val header = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    header.putShort(24, 0x003E.toShort)
    header.putShort(26, 0x0003.toShort)
    header.putShort(28, 0xFFFE.toShort) // little-endian marker
    header.putShort(30, 9.toShort)      // 512-byte sectors
    header.putShort(32, 6.toShort)      // 64-byte mini sectors
    header.putInt(44, 1)                // one FAT sector
    header.putInt(48, 1)                // directory starts at sector 1
    header.putInt(56, 4096)             // mini-stream cutoff
    header.putInt(60, -2)               // no mini-FAT
    header.putInt(68, -2)               // no DIFAT chain
    header.putInt(76, 0)                // DIFAT[0] = FAT at sector 0
    (1 until 109).foreach(i => header.putInt(76 + 4 * i, -1))
    header.array() ++ fat.toByteArray ++ dir ++ padded
  }
}
