package graft

import java.io.ByteArrayOutputStream
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

  // ---- little-endian byte builders ----
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def dbl(v: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(v); bb.array()
  }
  private def rec(id: Int, body: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(body.length) ++ body
  /** BIFF8 unicode string, compressed, no rich/ext. */
  private def str16(s: String): Array[Byte] =
    u16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  private def str8(s: String): Array[Byte] =
    Array(s.length.toByte, 0.toByte) ++ s.getBytes("ISO-8859-1")

  // ---- BIFF8 records ----
  private def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(substreamType) ++ Array.fill(12)(0.toByte))
  private val eof = rec(0x000A, Array.emptyByteArray)
  private def xf(fmtId: Int): Array[Byte] =
    rec(0x00E0, u16(0) ++ u16(fmtId) ++ Array.fill(16)(0.toByte))
  private def format(fmtId: Int, code: String): Array[Byte] =
    rec(0x041E, u16(fmtId) ++ str16(code))
  private def boundSheet(pos: Long, name: String): Array[Byte] =
    rec(0x0085, u32(pos) ++ u16(0) ++ str8(name))
  private def sst(strings: Seq[String]): Array[Byte] =
    rec(0x00FC, u32(strings.length) ++ u32(strings.length) ++
      strings.flatMap(str16).toArray)
  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, u16(row) ++ u16(col) ++ u16(0) ++ u32(isst))
  private def number(row: Int, col: Int, xfIdx: Int, v: Double): Array[Byte] =
    rec(0x0203, u16(row) ++ u16(col) ++ u16(xfIdx) ++ dbl(v))
  private def rkInt(row: Int, col: Int, xfIdx: Int, v: Int,
                    div100: Boolean = false): Array[Byte] =
    rec(0x027E, u16(row) ++ u16(col) ++ u16(xfIdx) ++
      u32(((v.toLong << 2) & 0xFFFFFFFCL) | 2L | (if (div100) 1L else 0L)))
  private def rkFloat(row: Int, col: Int, xfIdx: Int, v: Double): Array[Byte] =
    rec(0x027E, u16(row) ++ u16(col) ++ u16(xfIdx) ++
      u32((java.lang.Double.doubleToLongBits(v) >>> 32) & 0xFFFFFFFCL))
  private def mulRk(row: Int, colFirst: Int,
                    vals: Seq[(Int, Int)]): Array[Byte] = // (xf, intVal)
    rec(0x00BD, u16(row) ++ u16(colFirst) ++
      vals.flatMap { case (x, v) =>
        u16(x) ++ u32(((v.toLong << 2) & 0xFFFFFFFCL) | 2L)
      }.toArray ++ u16(colFirst + vals.length - 1))
  private def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, u16(row) ++ u16(col) ++ u16(0) ++
      Array((if (v) 1 else 0).toByte, 0.toByte))

  /** Wrap a stream into a minimal OLE2 container (regular FAT path:
    * stream padded to >= 4096 so the mini-stream is not involved).
    */
  private def ole2(workbook: Array[Byte]): Array[Byte] = {
    val targetLen = math.max(4096, ((workbook.length + 511) / 512) * 512)
    val padded = workbook ++ Array.fill(targetLen - workbook.length)(0.toByte)
    val streamSects = padded.length / 512
    // sector 0: FAT; sector 1: directory; sectors 2..: stream
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
      e.put(67, 1.toByte) // black
      e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, child.toInt)
      e.putInt(116, start.toInt)
      e.putInt(120, size.toInt)
      e.array()
    }
    val dir = dirEntry("Root Entry", 5, 0xFFFFFFFEL, 0, child = 1) ++
      dirEntry("Workbook", 2, 2, padded.length.toLong) ++
      Array.fill(256)(0.toByte) // two free entries pad the dir sector

    val header = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    header.putShort(24, 0x003E.toShort) // minor version
    header.putShort(26, 0x0003.toShort) // major version 3
    header.putShort(28, 0xFFFE.toShort) // little-endian
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
