package graft.engine

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Production-scale synthetic stand-ins for the reference's three raw
  * files, at the shape and cardinalities of the real dataset.
  *
  * The reference repo's `data/raw` files are git-LFS POINTER STUBS (131
  * bytes each — `version https://git-lfs.github.com/spec/v1` + an oid;
  * the 45.6 MB workbook payload is not on this machine and the
  * environment has no egress), so the README golden numbers
  * (`/root/reference/README.md:96-118`) cannot be byte-reproduced from
  * the real data. This generator produces the closest verifiable
  * substitute: a deterministic workbook with the REAL dataset's shape —
  * two sheets named like the UCI Online Retail II export with 525,461 +
  * 541,910 data rows (= 1,067,371), ~5.3K products, ~5.9K customers,
  * 42 countries, ~53K invoices, invoice timestamps spanning
  * 2009-12-01..2011-12-09 (⇒ 761 month-extended calendar days, 739
  * fct-range FX days — the README's exact dim cardinalities), plus an
  * ECB-SDMX-shaped FX XML (business-day observations) and a BIFF8
  * UK-bank-holidays .xls. Every value is a pure function of row/invoice
  * index, so the expected pipeline outputs (the [[Manifest]]) are
  * computable without parsing the files — what the golden harness
  * asserts against.
  *
  * File-format realism mirrors the real workbook's stress points: the
  * cell grid references a 60K+-entry shared-string table (invoice ids,
  * stock codes, descriptions, countries), invoice timestamps are
  * 1900-system date serials with time fractions resolved through
  * styles.xml, and blank cells (missing customer/stock/price/qty)
  * appear mid-row.
  */
object GoldenFixture {

  /** Full golden scale by default (the UCI sheet row counts); specs
    * shrink `rowsSheet1/2` and the entity counts proportionally.
    */
  final case class Config(
      rowsSheet1: Int = 525461,
      rowsSheet2: Int = 541910,
      nProducts: Int = 5300,
      nCustomers: Int = 5941, // + the -1 UNKNOWN surrogate ⇒ 5,942 dim rows
      custBase: Long = 12346L)

  val SheetNames: Seq[String] = Seq("Year 2009-2010", "Year 2010-2011")
  val SheetStarts: Seq[java.time.LocalDate] =
    Seq(java.time.LocalDate.of(2009, 12, 1), java.time.LocalDate.of(2010, 12, 1))
  /** Both sheets span start..start+373 (374 days), like the real export
    * (Dec 1 → Dec 9 next year): overall 2009-12-01..2011-12-09.
    */
  val SpanDays = 374

  /** 41 real country names + the UNKNOWN surrogate = the README's "42
    * countries". UK first (dominant, like the real data).
    */
  val Countries: IndexedSeq[String] = IndexedSeq(
    "United Kingdom", "Germany", "France", "EIRE", "Spain", "Netherlands",
    "Belgium", "Switzerland", "Portugal", "Australia", "Norway", "Italy",
    "Channel Islands", "Finland", "Cyprus", "Sweden", "Austria", "Denmark",
    "Japan", "Poland", "USA", "Israel", "Unspecified", "Singapore", "Iceland",
    "Canada", "Greece", "Malta", "United Arab Emirates", "European Community",
    "RSA", "Lebanon", "Lithuania", "Brazil", "Czech Republic", "Bahrain",
    "Saudi Arabia", "Nigeria", "Thailand", "Hong Kong", "Korea")

  private val Adjectives = IndexedSeq("RED", "BLUE", "VINTAGE", "JUMBO",
    "MINI", "GLASS", "METAL", "WOODEN", "FELT", "PAPER")

  /** splitmix64 — the one mixing function behind every "random" choice,
    * so generator, manifest, and spec agree bit-for-bit.
    */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def pos(x: Long, m: Int): Int = ((mix(x) >>> 1) % m).toInt

  def stockCode(p: Int): String = s"SC${10000 + p}"
  def description(p: Int): String =
    s"PRODUCT ${Adjectives(p % Adjectives.length)} ${10000 + p}"
  /** Unit price in exact cents → double via /100.0 on both sides.
    * The level (43..537, mean ~290) is calibrated so the full-scale
    * net GBP revenue lands on the README's published £19.3 M
    * (`/root/reference/README.md:114`).
    */
  def priceCents(p: Int): Int =
    43 + (p * 37) % 495 + (if (p % 5 == 0) 1 else 0)
  /** Non-UK share (1/20 of post-coverage customers) is calibrated so
    * full-scale `agg_country_day` lands on the README's published
    * ~3.7 K country-day rows (`/root/reference/README.md:108`): UK and
    * UNKNOWN transact every day; each of the 41 other countries only
    * on the days its few customers order.
    */
  def countryOf(custIdx: Int): Int =
    if (custIdx < Countries.length) custIdx
    else if (custIdx % 20 < 19) 0
    else 1 + pos(custIdx.toLong * 13 + 5, Countries.length - 1)

  /** One raw workbook row. `stockIdx == -1` ⇒ blank StockCode cell;
    * `qty`/`priceCents` None ⇒ blank cells (the reference's fct filters
    * drop these rows). `serial` is the shared invoice timestamp as a
    * 1900-system Excel serial.
    */
  final case class RawRow(sheet: Int, invoiceNo: String, stockIdx: Int,
                          qty: Option[Long], priceCents: Option[Int],
                          serial: Double, custId: Option[Long],
                          countryIdx: Int)

  private def excelSerial(date: java.time.LocalDate, secOfDay: Int): Double = {
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 31), date)
    // +1 for Excel's fictitious 1900-02-29 (all our dates are past it)
    (days + 1).toDouble + secOfDay.toDouble / 86400.0
  }

  /** The single row stream both the file writers and the manifest
    * walk. Deterministic walk state: invoices are contiguous row runs
    * of 5..35 rows; each invoice carries one timestamp, customer (22%
    * null — real data is 22.8%), and 2% are 'C'-prefixed cancellations
    * with negative quantities. Entity coverage is forced (first 5,300
    * rows hit every product; first `nCustomers` known-customer invoices
    * hit every customer id), so the dim cardinalities are exact by
    * construction, not probabilistic.
    */
  def rows(cfg: Config): Iterator[RawRow] = {
    var knownCustSeq = 0L // global over both sheets
    (0 until 2).iterator.flatMap { s =>
      val n = if (s == 0) cfg.rowsSheet1 else cfg.rowsSheet2
      val start = SheetStarts(s)
      var inv = -1          // invoice index within sheet
      var invLen = 0
      var rowInInv = 0
      var invNo = ""
      var invSerial = 0.0
      var invCust: Option[Long] = None
      var invCancelled = false
      (0 until n).iterator.map { r =>
        if (inv < 0 || rowInInv >= invLen) {
          inv += 1
          rowInInv = 0
          invLen = 5 + pos(s * 1000003L + inv * 7L + 1, 31)
          invCancelled = pos(s * 2000003L + inv * 11L + 2, 50) == 7
          val num = 489434 + s * 60000 + inv
          invNo = if (invCancelled) s"C$num" else num.toString
          val dateIdx = (r.toLong * SpanDays / n).toInt
          val sec = 7 * 3600 + (inv % 10) * 3600 + ((inv * 13) % 60) * 60
          invSerial = excelSerial(start.plusDays(dateIdx), sec)
          invCust =
            if (pos(s * 3000017L + inv * 17L + 3, 100) < 22) None
            else {
              val idx =
                if (knownCustSeq < cfg.nCustomers) knownCustSeq
                else pos(s * 4000037L + inv * 19L, cfg.nCustomers).toLong
              knownCustSeq += 1
              Some(cfg.custBase + idx)
            }
        }
        val badStock = r >= 6000 && r % 3557 == 3556
        val badPrice = r >= 6000 && r % 5336 == 5335
        val badQty = r >= 6000 && r % 10673 == 10672
        val p =
          if (s == 0 && r < cfg.nProducts) r
          else pos(s * 5000011L + r * 23L + 7, cfg.nProducts)
        val q0 = 1L + pos(s * 6000023L + r * 29L + 9, 12)
        val row = RawRow(
          sheet = s,
          invoiceNo = invNo,
          stockIdx = if (badStock) -1 else p,
          qty = if (badQty) None else Some(if (invCancelled) -q0 else q0),
          priceCents = if (badPrice) None else Some(priceCents(p)),
          serial = invSerial,
          custId = invCust,
          countryIdx = invCust.map(c => countryOf((c - cfg.custBase).toInt))
            .getOrElse(0))
        rowInInv += 1
        row
      }
    }
  }

  // ------------------------------------------------------------- FX XML

  /** Business days (Mon-Fri) 2009-11-27..2011-12-31 — obs BEFORE the
    * first sale date so the forward-fill has no leading NULL gap, obs
    * beyond the last so the range clip is exercised. The GBP-per-EUR
    * level (0.8200..0.9099, the 2010-2011 historical band) is
    * calibrated so full-scale EUR revenue lands on the README's
    * published €22.3 M (`/root/reference/README.md:114`, EUR/GBP
    * ratio ≈ 1.156).
    */
  def fxObs: Seq[(java.time.LocalDate, String)] = {
    val from = java.time.LocalDate.of(2009, 11, 27)
    val to = java.time.LocalDate.of(2011, 12, 31)
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .filter(d => d.getDayOfWeek.getValue <= 5)
      .map(d => d -> f"0.${8200 + (d.toEpochDay * 7919) % 900}%04d")
      .toSeq
  }

  def writeFxXml(path: String): Unit = {
    val sb = new StringBuilder(64 * 1024)
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("""<message:MessageGroup xmlns:message="http://www.SDMX.org/resources/SDMXML/schemas/v2_0/message" xmlns="http://www.ecb.europa.eu/vocabulary/stats/exr/1">""")
    sb.append("""<DataSet><Group CURRENCY="GBP" CURRENCY_DENOM="EUR">""")
    sb.append("""<Series FREQ="D" CURRENCY="GBP" CURRENCY_DENOM="EUR" EXR_TYPE="SP00" EXR_SUFFIX="A">""")
    fxObs.foreach { case (d, v) =>
      sb.append(s"""<Obs TIME_PERIOD="$d" OBS_VALUE="$v"/>""")
    }
    sb.append("</Series></Group></DataSet></message:MessageGroup>")
    Files.write(Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  // -------------------------------------------------------- holidays XLS

  /** UK bank holidays 2008-2012 (public gov.uk list, incl. the 2011-04-29
    * royal-wedding extra) — superset of the calendar span, so the
    * BETWEEN clip in the reference's update is exercised.
    */
  val UkHolidays: Seq[String] = Seq(
    "2008-01-01", "2008-03-21", "2008-03-24", "2008-05-05", "2008-05-26",
    "2008-08-25", "2008-12-25", "2008-12-26",
    "2009-01-01", "2009-04-10", "2009-04-13", "2009-05-04", "2009-05-25",
    "2009-08-31", "2009-12-25", "2009-12-28",
    "2010-01-01", "2010-04-02", "2010-04-05", "2010-05-03", "2010-05-31",
    "2010-08-30", "2010-12-27", "2010-12-28",
    "2011-01-03", "2011-04-22", "2011-04-25", "2011-04-29", "2011-05-02",
    "2011-05-30", "2011-08-29", "2011-12-26", "2011-12-27",
    "2012-01-02", "2012-04-06", "2012-04-09", "2012-05-07", "2012-06-04",
    "2012-06-05", "2012-08-27", "2012-12-25", "2012-12-26")

  def writeHolidaysXls(path: String): Unit = {
    import BiffWriter._
    val header = "UK BANK HOLIDAYS"
    val strings = Seq(header)
    // xf 0: general; xf 1: the date format (custom id 164)
    val body = UkHolidays.zipWithIndex.map { case (d, i) =>
      number(i + 1, 0, 1,
        excelSerial(java.time.LocalDate.parse(d), 0))
    }.foldLeft(labelSst(0, 0, 0))(_ ++ _)
    val sheetBlob = bof(0x10) ++ body ++ eof
    val globalsPrefix = bof(0x05) ++ format(164, "yyyy\\-mm\\-dd") ++
      xf(0) ++ xf(164) ++ sst(strings)
    val globalsLen = globalsPrefix.length +
      boundSheet(0, "holidays").length + eof.length
    val wb = globalsPrefix ++ boundSheet(globalsLen.toLong, "holidays") ++
      eof ++ sheetBlob
    Files.write(Paths.get(path), ole2(wb)): Unit
  }

  // ------------------------------------------------------------ xlsx

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")

  /** Streams the workbook straight to the zip (a 1M-row sheet is
    * ~150 MB of XML — never held in memory). Strings go through a
    * shared-string table (like the real export): invoice ids, stock
    * codes, descriptions, countries. InvoiceDate cells are numeric
    * serials styled with a custom datetime format resolved via
    * styles.xml.
    */
  def writeXlsx(cfg: Config, path: String): Unit = {
    // SST: fixed layout — invoice numbers can't be enumerated cheaply
    // up front twice, so the SST holds [codes][descs][countries] and
    // invoice ids are written as inline strings (both paths exercised,
    // like real exports mixing sst and inline cells).
    val sstStrings = (0 until cfg.nProducts).map(stockCode) ++
      (0 until cfg.nProducts).map(description) ++ Countries
    val codeIdx = 0
    val descIdx = cfg.nProducts
    val ctryIdx = 2 * cfg.nProducts

    val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(zos,
        java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    def entry(name: String)(write: => Unit): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      write
      w.flush()
      zos.closeEntry()
    }
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    entry("xl/workbook.xml") {
      w.write(s"""<workbook xmlns="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""")
      SheetNames.zipWithIndex.foreach { case (n, i) =>
        w.write(s"""<sheet name="${xmlEsc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""")
      }
      w.write("</sheets></workbook>")
    }
    entry("xl/_rels/workbook.xml.rels") {
      w.write("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
      SheetNames.indices.foreach { i =>
        w.write(s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""")
      }
      w.write("</Relationships>")
    }
    entry("xl/styles.xml") {
      // xf 0 = general, xf 1 = datetime (custom 164)
      w.write(s"""<styleSheet xmlns="$ns"><numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd\\ hh:mm:ss"/></numFmts><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="164"/></cellXfs></styleSheet>""")
    }
    entry("xl/sharedStrings.xml") {
      w.write(s"""<sst xmlns="$ns" count="${sstStrings.length}" uniqueCount="${sstStrings.length}">""")
      sstStrings.foreach(s => w.write(s"<si><t>${xmlEsc(s)}</t></si>"))
      w.write("</sst>")
    }
    val header = Seq("Invoice", "StockCode", "Description", "Quantity",
      "InvoiceDate", "Price", "Customer ID", "Country")
    def writeRow(sb: java.lang.StringBuilder, row: RawRow): Unit = {
      sb.append("<row>")
      sb.append(s"""<c t="inlineStr"><is><t>${row.invoiceNo}</t></is></c>""")
      if (row.stockIdx >= 0) {
        sb.append(s"""<c t="s"><v>${codeIdx + row.stockIdx}</v></c>""")
        sb.append(s"""<c t="s"><v>${descIdx + row.stockIdx}</v></c>""")
      } else sb.append("<c/><c/>")
      row.qty match {
        case Some(q) => sb.append(s"<c><v>$q</v></c>")
        case None => sb.append("<c/>")
      }
      sb.append(s"""<c s="1"><v>${row.serial}</v></c>""")
      row.priceCents match {
        case Some(p) => sb.append(s"<c><v>${p / 100.0}</v></c>")
        case None => sb.append("<c/>")
      }
      row.custId match {
        case Some(c) => sb.append(s"<c><v>$c</v></c>")
        case None => sb.append("<c/>")
      }
      sb.append(s"""<c t="s"><v>${ctryIdx + row.countryIdx}</v></c>""")
      sb.append("</row>")
    }
    val it = rows(cfg).buffered
    SheetNames.zipWithIndex.foreach { case (_, si) =>
      entry(s"xl/worksheets/sheet${si + 1}.xml") {
        w.write(s"""<worksheet xmlns="$ns"><sheetData><row>""")
        header.foreach(h => w.write(s"""<c t="inlineStr"><is><t>$h</t></is></c>"""))
        w.write("</row>")
        val sb = new java.lang.StringBuilder(512)
        while (it.hasNext && it.head.sheet == si) {
          sb.setLength(0)
          writeRow(sb, it.next())
          w.write(sb.toString)
        }
        w.write("</sheetData></worksheet>")
      }
    }
    w.close()
  }

  // ---------------------------------------------------------- manifest

  /** Expected pipeline outputs, computed from the same row walk the
    * writers use (no file parsing): the golden numbers the harness
    * asserts. Revenue accumulates per-row DECIMAL(38,6)-rounded doubles
    * — bit-identical to the engine's dsum contract.
    */
  final case class Manifest(
      rawRows: Long, rawRowsSheet1: Long, rawRowsSheet2: Long,
      fctRows: Long, invoices: Long, products: Long, customers: Long,
      countries: Long, calendarDays: Long, fxDays: Long,
      minDate: String, maxDate: String,
      netRevenueGbp: BigDecimal, netRevenueEur: BigDecimal,
      aggCountryDay: Long)

  def manifest(cfg: Config): Manifest = {
    val rateByDay: Map[Long, Double] = {
      // forward-fill business-day obs over the full span
      val obs = fxObs.map { case (d, v) => d.toEpochDay -> v.toDouble }.toMap
      val from = SheetStarts.head.toEpochDay - 10
      val to = SheetStarts.last.plusDays(SpanDays - 1).toEpochDay
      var last = Double.NaN
      (from to to).map { d =>
        obs.get(d).foreach(last = _)
        d -> last
      }.toMap
    }
    var raw1 = 0L; var raw2 = 0L; var fct = 0L
    val invs = scala.collection.mutable.HashSet.empty[String]
    val prods = scala.collection.mutable.HashSet.empty[Int]
    val custs = scala.collection.mutable.HashSet.empty[Long]
    val ctrys = scala.collection.mutable.HashSet.empty[Int]
    // agg_country_day = distinct (date, dim-customer country): NULL
    // customer → the UNKNOWN dim row (encoded -1), known customer →
    // its fixed country (the pipeline's per-customer MODE is exact
    // here because fixture customers never move).
    val countryDays = scala.collection.mutable.HashSet.empty[Long]
    var minSerial = Double.MaxValue; var maxSerial = Double.MinValue
    var gbp = java.math.BigDecimal.ZERO
    var eur = java.math.BigDecimal.ZERO
    rows(cfg).foreach { r =>
      if (r.sheet == 0) raw1 += 1 else raw2 += 1
      if (r.stockIdx >= 0) prods += r.stockIdx
      r.custId.foreach(custs += _)
      ctrys += r.countryIdx
      minSerial = math.min(minSerial, r.serial)
      maxSerial = math.max(maxSerial, r.serial)
      if (r.stockIdx >= 0 && r.qty.isDefined && r.priceCents.isDefined) {
        fct += 1
        invs += r.invoiceNo
        val gross = r.qty.get * (r.priceCents.get / 100.0)
        gbp = gbp.add(java.math.BigDecimal.valueOf(gross)
          .setScale(6, java.math.RoundingMode.HALF_UP))
        val day = java.time.LocalDate.of(1899, 12, 31)
          .plusDays(math.floor(r.serial).toLong - 1).toEpochDay
        val dimCountry = r.custId
          .map(c => countryOf((c - cfg.custBase).toInt)).getOrElse(-1)
        countryDays += (day << 8) | (dimCountry + 1).toLong
        val grossEur = gross / rateByDay(day)
        eur = eur.add(java.math.BigDecimal.valueOf(grossEur)
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }
    }
    val minD = java.time.LocalDate.of(1899, 12, 31)
      .plusDays(math.floor(minSerial).toLong - 1)
    val maxD = java.time.LocalDate.of(1899, 12, 31)
      .plusDays(math.floor(maxSerial).toLong - 1)
    val calStart = minD.withDayOfMonth(1)
    val calEnd = maxD.withDayOfMonth(1).plusMonths(1).minusDays(1)
    Manifest(
      rawRows = raw1 + raw2, rawRowsSheet1 = raw1, rawRowsSheet2 = raw2,
      fctRows = fct, invoices = invs.size.toLong, products = prods.size.toLong,
      customers = custs.size.toLong + 1, // + UNKNOWN surrogate
      countries = ctrys.size.toLong +
        (if (custs.size > 0) 1 else 0), // + UNKNOWN country
      calendarDays = java.time.temporal.ChronoUnit.DAYS.between(
        calStart, calEnd) + 1,
      fxDays = java.time.temporal.ChronoUnit.DAYS.between(minD, maxD) + 1,
      minDate = minD.toString, maxDate = maxD.toString,
      netRevenueGbp = BigDecimal(gbp), netRevenueEur = BigDecimal(eur),
      aggCountryDay = countryDays.size.toLong)
  }

  /** Manifest-only walk at full scale — the calibration loop
    * (seconds, no file IO or Spark): prints the golden numbers next to
    * the README's published targets.
    */
  def main(args: Array[String]): Unit = {
    val m = manifest(Config())
    println(f"net_revenue_gbp ${m.netRevenueGbp.toDouble / 1e6}%.4f M (README 19.3)")
    println(f"net_revenue_eur ${m.netRevenueEur.toDouble / 1e6}%.4f M (README 22.3)")
    println(s"agg_country_day ${m.aggCountryDay} (README ~3.7K)")
    println(s"raw ${m.rawRows} fct ${m.fctRows} invoices ${m.invoices} " +
      s"products ${m.products} customers ${m.customers} " +
      s"countries ${m.countries} cal ${m.calendarDays} fx ${m.fxDays} " +
      s"span ${m.minDate}..${m.maxDate}")
  }
}
