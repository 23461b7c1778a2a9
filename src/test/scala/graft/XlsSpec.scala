package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.engine.XlsSource

/** Byte-level BIFF8 .xls ingestion: the spec hand-assembles a real
  * OLE2 compound file (header, FAT, directory, sector chains) holding a
  * Workbook stream of BIFF8 records — globals (BOUNDSHEET catalog, XF
  * formats incl. a date style, FORMAT custom code, SST) and two
  * worksheet substreams (LABELSST, NUMBER, RK int/÷100/float, MULRK,
  * BOOLERR, a date-styled serial) — and asserts XlsSource reproduces
  * the same pd.read_excel(sheet_name=None) contract as XlsxSource.
  */
class XlsSpec extends SparkTestBase {

  // One shared byte-level BIFF8/OLE2 writer toolkit: the spec assembles
  // its workbooks with the SAME builders the fixture generator uses
  // (graft.engine.BiffWriter), so the two can't drift into testing
  // different byte layouts.
  import graft.engine.BiffWriter._

  private def writeXls(): String = {
    // globals: xf0 = plain, xf1 = builtin date 14, xf2 = custom date 165
    val globalsPrefix = bof(0x05) ++ xf(0) ++ xf(14) ++ xf(165) ++
      format(165, "yyyy\\-mm\\-dd") ++
      sst(Seq("invoice", "qty", "rate", "when", "ok", "INV-1", "INV-2"))
    // two placeholder BOUNDSHEETs to learn the globals length
    val bsLen = boundSheet(0, "Year 2009-2010").length +
      boundSheet(0, "Year 2010-2011").length
    val globalsLen = globalsPrefix.length + bsLen + eof.length
    val sheet1 = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(0, 3, 3) ++ labelSst(0, 4, 4) ++
      labelSst(1, 0, 5) ++ rkInt(1, 1, 0, 6) ++
      rkInt(1, 2, 0, 1999, div100 = true) ++
      number(1, 3, 1, 25569.0) ++ boolErr(1, 4, v = true) ++
      eof
    val sheet2 = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(0, 3, 3) ++ labelSst(0, 4, 4) ++
      labelSst(1, 0, 6) ++ mulRk(1, 1, Seq((0, 12), (0, 3))) ++
      number(1, 3, 2, 61.0) ++ boolErr(1, 4, v = false) ++
      eof
    val wb = globalsPrefix ++
      boundSheet(globalsLen, "Year 2009-2010") ++
      boundSheet(globalsLen + sheet1.length, "Year 2010-2011") ++
      eof ++ sheet1 ++ sheet2
    val f = Files.createTempFile("graft", ".xls")
    Files.write(f, ole2(wb))
    f.toString
  }

  test("XlsSource reads a BIFF8 workbook byte-level: sheets, types, dates") {
    val schema = StructType(Seq(
      StructField("invoice", StringType),
      StructField("qty", LongType),
      StructField("rate", DoubleType),
      StructField("when", DateType),
      StructField("ok", BooleanType)))
    val df = XlsSource(writeXls(), schema).load(spark)
    assert(df.schema.fieldNames.toSeq ===
      Seq("invoice", "qty", "rate", "when", "ok", "source_sheet"))
    val rows = df.orderBy("invoice").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDate(3).toString, r.getBoolean(4), r.getString(5)))
    assert(rows.toSeq === Seq(
      ("INV-1", 6L, 19.99, "1970-01-01", true, "Year 2009-2010"),
      ("INV-2", 12L, 3.0, "1900-03-01", false, "Year 2010-2011")))
  }

  test("XlsSource survives an SST spilling across a CONTINUE record") {
    // the SST declares 3 strings but only carries 2; the third starts
    // at the head of a CONTINUE record (string-boundary spill), and the
    // numeric cell is a float RK (top-30-bits-of-double encoding)
    val globalsPrefix = bof(0x05) ++ xf(0) ++
      rec(0x00FC, u32(3) ++ u32(3) ++ str16("k") ++ str16("v")) ++
      rec(0x003C, str16("x"))
    val bsLen = boundSheet(0, "S").length
    val globalsLen = globalsPrefix.length + bsLen + eof.length
    val sheet = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      labelSst(1, 0, 2) ++ rkFloat(1, 1, 0, 0.75) ++ eof
    val wb = globalsPrefix ++ boundSheet(globalsLen, "S") ++ eof ++ sheet
    val f = Files.createTempFile("graft-cont", ".xls")
    Files.write(f, ole2(wb))
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    val rows = XlsSource(f.toString, schema).load(spark).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "x" && rows.head.getDouble(1) === 0.75)
  }

  test("XlsSource reads FORMULA cells' cached results") {
    // Real .xls sheets carry FORMULA records whose cached result is
    // either an inline IEEE double or (for string formulas) a marker
    // pointing at the following STRING record — both must land as
    // cell values; the formula expression itself must not.
    val globalsPrefix = bof(0x05) ++ xf(0) ++ sst(Seq("k", "v"))
    val bsLen = boundSheet(0, "S").length
    val globalsLen = globalsPrefix.length + bsLen + eof.length
    val sheet = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      formulaStr(1, 0, 0) ++ stringRec("ab") ++
      formulaNum(1, 1, 0, 41.5) ++ eof
    val wb = globalsPrefix ++ boundSheet(globalsLen, "S") ++ eof ++ sheet
    val f = Files.createTempFile("graft-formula", ".xls")
    Files.write(f, ole2(wb))
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    val rows = XlsSource(f.toString, schema).load(spark).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "ab" && rows.head.getDouble(1) === 41.5)
  }

  test("XlsSource honors a DATEMODE 1904 record") {
    val globalsPrefix = bof(0x05) ++
      rec(0x0022, u16(1)) ++ // DATEMODE = 1904 system
      xf(0) ++ xf(14) ++ sst(Seq("when"))
    val globalsLen = globalsPrefix.length + boundSheet(0, "S").length +
      eof.length
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1904, 1, 1), java.time.LocalDate.of(2010, 6, 15))
    val sheet = bof(0x10) ++ labelSst(0, 0, 0) ++
      number(1, 0, 1, serial.toDouble) ++ eof
    val wb = globalsPrefix ++ boundSheet(globalsLen, "S") ++ eof ++ sheet
    val f = Files.createTempFile("graft-1904", ".xls")
    Files.write(f, ole2(wb))
    val schema = StructType(Seq(StructField("when", DateType)))
    val r = XlsSource(f.toString, schema).load(spark).collect().head
    assert(r.getDate(0).toString === "2010-06-15")
  }

  test("XlsSource rejects a non-OLE2 file") {
    val f = Files.createTempFile("notxls", ".xls")
    Files.write(f, "plain text".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("a", StringType)))
    assertThrows[IllegalArgumentException] {
      XlsSource(f.toString, schema).load(spark)
    }
  }

  test("XlsSource fails fast on a cyclic FAT chain instead of hanging") {
    // Take a valid file and patch the Workbook stream's FAT so sectors
    // 2 and 3 point at each other: FAT entry i lives at 512 + 4*i
    // (FAT is sector 0, directly after the 512-byte header).
    val bytes = ole2(bof(0x05) ++ eof)
    def patchFat(entry: Int, next: Long): Unit = {
      java.nio.ByteBuffer.wrap(bytes, 512 + 4 * entry, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(next.toInt): Unit
    }
    patchFat(2, 3); patchFat(3, 2)
    val f = Files.createTempFile("cyclic", ".xls")
    Files.write(f, bytes)
    val schema = StructType(Seq(StructField("a", StringType)))
    val e = intercept[IllegalArgumentException] {
      XlsSource(f.toString, schema).load(spark)
    }
    assert(e.getMessage.contains("cyclic"))
  }
}
