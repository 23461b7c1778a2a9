package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.queries.Registry

/** Events timestamp schema-drift guard: the physical parquet type of
  * `events.ts` has drifted across testdata regenerations
  * (TIMESTAMP(NANOS) through round 9, timestamp[us]/NTZ since round
  * 10) and once silently broke the streaming side while batch stayed
  * green. This spec rewrites one events table in ALL THREE physical
  * forms and asserts the batch reader, the streaming reader, and the
  * batch sessionizer produce identical results on each — so no future
  * producer-side type change can land unnoticed.
  */
class TimestampDriftSpec extends SparkTestBase {

  /** The sf0.001 events normalized once; ground truth for all forms. */
  private lazy val canonical = graft.engine.Graft.events(spark, sfDir)

  /** Write `canonical` with ts re-encoded in one physical form and
    * return a dir laid out like a scale-factor dir.
    */
  private def writeForm(form: String): String = {
    val dir = graft.queries.Scratch.fresh(spark, s"tsdrift_$form")
    val df = form match {
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) — what the testdata
      // carries today; reads back as TIMESTAMP_NTZ
      case "ntz" => canonical.withColumn("ts", col("ts").cast(TimestampNTZType))
      // TIMESTAMP(MICROS, isAdjustedToUTC=true) — the instant form;
      // reads back as TimestampType directly
      case "tz" => canonical
      // INT64 with no logical type, nanosecond magnitudes — the
      // observable form of the old TIMESTAMP(NANOS) data under
      // nanosAsLong=true (LongType column of epoch nanos)
      case "long_nanos" =>
        canonical.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val forms = Seq("ntz", "tz", "long_nanos")

  private def collectQ(name: String, dir: String): Seq[String] =
    Registry.all.find(_.name == name).get.run(spark, dir)
      .collect().map(_.toString).toSeq

  test("batch hourly window (e1) is identical across all three ts encodings") {
    val results = forms.map(f => f -> collectQ("e1_hourly_window", writeForm(f)))
    val (_, first) = results.head
    assert(first.nonEmpty)
    results.tail.foreach { case (f, r) =>
      assert(r === first, s"e1 over form '$f' diverged from '${forms.head}'")
    }
  }

  test("batch sessionization (e4) is identical across all three ts encodings") {
    val results = forms.map(f => f -> collectQ("e4_sessionize_batch", writeForm(f)))
    val (_, first) = results.head
    assert(first.nonEmpty)
    results.tail.foreach { case (f, r) =>
      assert(r === first, s"e4 over form '$f' diverged from '${forms.head}'")
    }
  }

  test("STREAMING hourly window (e1s) matches batch e1 on every ts encoding") {
    forms.foreach { f =>
      val dir = writeForm(f)
      val streamed = graft.streaming.EventsStream
        .hourlyCountsOneShot(spark, dir)
        .collect().map(_.toString).toSeq
      val batch = Registry.all.find(_.name == "e1_hourly_window").get
        .run(spark, dir).collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed === batch,
        s"streaming e1s over form '$f' diverged from batch e1")
    }
  }

  test("an unsupported ts physical type fails loudly, not silently") {
    val dir = graft.queries.Scratch.fresh(spark, "tsdrift_bad")
    canonical.withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      graft.engine.Graft.events(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
