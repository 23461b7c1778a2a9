package graft

import java.sql.Date
import java.time.LocalDate
import java.time.temporal.{IsoFields, WeekFields}
import org.apache.spark.sql.Row
import graft.engine.Functions

/** Semantic-shim specs: DuckDB dow numbering, ISO year/week vs java.time,
  * deterministic mode tie-breaks, forward-fill (both paths), inclusive
  * date series (SURVEY.md §2.3, §7.4 traps).
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("dowSun0 / isWeekend / isoYear / isoWeek match java.time across year boundaries") {
    // 8 years straddling ISO-week edge cases (1998-12-28..2006: week-53
    // years, Jan-1 landing on every weekday).
    val start = LocalDate.of(1998, 12, 20)
    val ds = (0 until 2930).map(d => Date.valueOf(start.plusDays(d)))
    val rows = ds.toDF("d")
      .select($"d",
        Functions.dowSun0($"d").as("dow"),
        Functions.isWeekend($"d").as("we"),
        Functions.isoYear($"d").as("iy"),
        Functions.isoWeek($"d").as("iw"))
      .collect()
    rows.foreach { case Row(d: Date, dow: Int, we: Boolean, iy: Int, iw: Int) =>
      val ld = d.toLocalDate
      assert(dow === ld.getDayOfWeek.getValue % 7, s"dow $ld")   // Sun=0
      assert(we === (dow == 0 || dow == 6), s"weekend $ld")
      assert(iy === ld.get(IsoFields.WEEK_BASED_YEAR), s"isoyear $ld")
      assert(iw === ld.get(WeekFields.ISO.weekOfWeekBasedYear()), s"isoweek $ld")
    }
  }

  test("modeDet breaks frequency ties by smallest value") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
      ("g2", "z"), ("g2", null)).toDF("k", "v")
    val got = Functions.modeDet(df, Seq("k"), "v", "m")
      .orderBy("k").as[(String, String)].collect()
    assert(got.toSeq === Seq(("g1", "a"), ("g2", "z"))) // tie a/b → a
  }

  test("dateSeries is gap-free and inclusive on both ends") {
    val got = Functions.dateSeries(spark,
        Date.valueOf("2021-02-26"), Date.valueOf("2021-03-02"))
      .orderBy("date").as[Date].collect().map(_.toString)
    assert(got.toSeq === Seq("2021-02-26", "2021-02-27", "2021-02-28",
      "2021-03-01", "2021-03-02"))
  }

  test("forwardFill carries last non-null; partitioned path fills per key") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None), ("a", 4, Some(40.0)),
      ("b", 1, None), ("b", 2, Some(5.0)), ("b", 3, None))
      .toDF("k", "i", "v")
    val part = Functions.forwardFill(df, "i", "v", "f", partitionCols = Seq("k"))
      .orderBy("k", "i").select("k", "i", "f")
      .as[(String, Int, Option[Double])].collect()
    assert(part.toSeq === Seq(
      ("a", 1, Some(10.0)), ("a", 2, Some(10.0)), ("a", 3, Some(10.0)),
      ("a", 4, Some(40.0)),
      ("b", 1, None), ("b", 2, Some(5.0)), ("b", 3, Some(5.0))))
    val single = Functions.forwardFill(df.filter($"k" === "a"), "i", "v", "f")
      .orderBy("i").select("f").as[Option[Double]].collect()
    assert(single.toSeq === Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0)))
  }
}
