package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic shims + determinism helpers (SURVEY.md §2.3/§7.3/§7.4).
  *
  * Traps handled here:
  *  - DuckDB `EXTRACT(dow)` is Sunday=0..Saturday=6
  *    (`/root/reference/src/models/dimensions.py:59`); Spark `dayofweek`
  *    is Sunday=1..Saturday=7 → subtract 1.
  *  - double SUM order differs across partitions → money sums go through
  *    an exact DECIMAL(38,6) accumulator then back to double, so results
  *    are bit-identical to a single-threaded oracle regardless of
  *    partitioning/parallelism (SURVEY.md §7.4 float nondeterminism).
  *  - `MODE()` ties are arbitrary in both engines → deterministic mode via
  *    count desc / value asc `row_number` (SURVEY.md §2.5 G1).
  */
object Functions {

  /** Day-of-week with DuckDB numbering: Sunday=0 .. Saturday=6. */
  def dowSun0(d: Column): Column = dayofweek(d) - 1

  /** Weekend test matching `EXTRACT(dow) IN (0, 6)` in the reference. */
  def isWeekend(d: Column): Column = dayofweek(d).isin(1, 7)

  /** ISO day-of-week, Monday=1 .. Sunday=7. */
  def isoDow(d: Column): Column = ((dayofweek(d) + lit(5)) % 7) + 1

  /** ISO-8601 week-numbering year (DuckDB `EXTRACT(isoyear ...)`):
    * the calendar year of that ISO week's Thursday.
    */
  def isoYear(d: Column): Column =
    year(date_add(d, (lit(4) - isoDow(d)).cast("int")))

  /** ISO week of year — Spark's weekofyear is already ISO. */
  def isoWeek(d: Column): Column = weekofyear(d)

  /** English day name, locale-pinned via pattern (DuckDB DAYNAME). */
  def dayName(d: Column): Column = date_format(d, "EEEE")

  /** English month name (DuckDB MONTHNAME). */
  def monthName(d: Column): Column = date_format(d, "MMMM")

  /** Exact, partitioning-independent SUM of a double expression: cast each
    * term to DECIMAL(38,6), sum exactly, return double. Matches a
    * single-threaded oracle bit-for-bit.
    *
    * Overflow headroom: DECIMAL(38,6) holds ±1e32. Even at 100 TB
    * (~1e12 rows of ~1e6-magnitude money values ⇒ ~1e18 totals) the sum
    * sits 14 orders of magnitude below the cap. Under Spark's default
    * non-ANSI mode an overflow would return NULL silently, so callers
    * aggregating values wider than ~1e6 per row should enable
    * spark.sql.ansi.enabled to fail loudly instead.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Deterministic MODE: most frequent `value` per `keys`, ties broken by
    * smallest value (count DESC, value ASC). Both Spark's and DuckDB's
    * native MODE tie-break arbitrarily, so oracle-checked queries use this
    * recompute on both sides (SURVEY.md §7.4).
    */
  def modeDet(df: DataFrame, keys: Seq[String], value: String,
              as: String): DataFrame = {
    val counted = df
      .filter(col(value).isNotNull)
      .groupBy((keys :+ value).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__cnt").desc, col(value).asc)
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((keys.map(col) :+ col(value).as(as)): _*)
  }

  /** Gap-free daily date series [lo, hi], both ends inclusive — the Spark
    * analog of DuckDB `unnest(generate_series(a, b, INTERVAL '1 day'))`
    * (`/root/reference/src/models/dimensions.py:68-72`). Driver computes
    * the bounds (same driver-side barrier as the reference, SURVEY.md §3.1).
    */
  def dateSeries(spark: SparkSession, lo: java.sql.Date,
                 hi: java.sql.Date): DataFrame =
    spark.sql(
      s"SELECT explode(sequence(date'$lo', date'$hi', interval 1 day)) AS date")

  /** As-of join: attach to each left row the latest `valueCol` from
    * `right` whose `timeCol` <= the left row's `timeCol`, per partition
    * key — the time-series lookup DuckDB spells `ASOF JOIN` (the oracle
    * twin). Composed from built-ins (union + partitioned running
    * last-ignoreNulls window) rather than a custom physical operator:
    * one shuffle on the partition key, no range join, no all-pairs.
    * Within a timestamp tie the right row sorts first, so same-instant
    * values are visible (>= semantics). When multiple right rows share
    * the same (key, time), the LARGEST value wins (the window ordering
    * includes the value itself as a tie-break) — deterministic instead
    * of partition-order-dependent.
    *
    * At 100 TB the partition key keeps windows parallel (one per
    * entity/currency); a keyless as-of degrades to a single-task window
    * — pass at least one key for large inputs.
    */
  def asofJoin(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               timeCol: String, valueCol: String, as: String): DataFrame = {
    val reserved = Seq("__v", "__is_left", "__row", as)
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"asofJoin: left frame columns ${clash.mkString(", ")} collide with " +
        s"reserved/output names (${reserved.mkString(", ")})")
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      (partitionCols.map(col) :+ col(timeCol) :+
        col(valueCol).as("__v")): _*)
      .withColumn("__is_left", lit(0))
    val u = l.select(
        (partitionCols.map(col) :+ col(timeCol) :+ col("__v") :+
          col("__is_left") :+
          struct(left.columns.toIndexedSeq.map(col): _*).as("__row")): _*)
      .unionByName(r.withColumn("__row",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields))), allowMissingColumns = false)
    // Ordering by (time, side, value): right rows sort before the left
    // row at the same instant, and equal-time right rows resolve by
    // value so last() is deterministic even for duplicate (key, time).
    val ord = Seq(col(timeCol), col("__is_left"), col("__v"))
    val w = (if (partitionCols.isEmpty) Window.orderBy(ord: _*)
             else Window.partitionBy(partitionCols.map(col): _*)
               .orderBy(ord: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn(as, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val restored = left.columns.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"__row.$c"))
    }
    restored.select((left.columns.toIndexedSeq.map(col) :+ col(as)): _*)
  }

  /** Forward-fill `valueCol` down a date-ordered frame: the reference's
    * `LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY date ROWS UNBOUNDED
    * PRECEDING)` (`/root/reference/src/models/facts.py:191-194`).
    *
    * `partitionCols` empty reproduces the reference exactly (single-task
    * window — fine for small series). At 100 TB pass a partition key
    * (e.g. currency/entity) so the window parallelizes per key
    * (SURVEY.md §7.4 unpartitioned-window note).
    */
  def forwardFill(df: DataFrame, orderCol: String, valueCol: String,
                  as: String, partitionCols: Seq[String] = Nil): DataFrame = {
    val base =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** The t2 quality heuristics — adds `punct_chars`, `ws_tokens`
    * (long), and `score` columns. ONE definition shared by the batch
    * queries (t2_quality_score, c1_corpus_curate) and the streaming
    * curation twin (CorpusStream) so the thresholds can't drift
    * between the paths that all claim to run "the same pass".
    */
  def qualityScored(df: DataFrame): DataFrame =
    df.withColumn("punct_chars",
        length(col("text")) -
          length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
      .withColumn("ws_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("score",
        when(length(col("text")) >= 200, 0.5).otherwise(0.0) +
          when(col("punct_chars") === 0, 0.25).otherwise(0.0) +
          when(col("ws_tokens") >= 30, 0.25).otherwise(0.0))

  /** Per-source target retention weight for deterministic mixture
    * sampling (tiered by the numeric source suffix here; in practice a
    * curated mixture table). Shared by the batch (c2) and streaming
    * (CorpusStream) curation paths so the two can never drift.
    */
  def mixtureWeight: Column = {
    // try_cast of the full suffix (not a length-capped substring): both
    // engines agree on suffixes longer than 10 digits (NULL via overflow)
    // and on non-numeric sources (NULL, weight tier 0.1) — DuckDB's plain
    // CAST would throw where Spark yields NULL, so the oracles mirror
    // TRY_CAST too.
    val srcnum = expr("try_cast(substr(source, 4) as int)")
    when(srcnum < 5, 1.0).when(srcnum < 10, 0.5)
      .when(srcnum < 15, 0.25).otherwise(0.1)
  }

  /** The deterministic sampling decision: keep a doc iff the polynomial
    * content hash of (doc_id, source) lands under the mixture weight.
    * A pure function of the row — reproducible across runs, machines,
    * engines (DuckDB twin: the t5-proven list_reduce fold), and between
    * the batch and streaming paths.
    */
  def mixtureKeep: Column =
    expr("pmod(graft_strhash(concat(cast(doc_id as string), ':', source)), 1000)") <
      mixtureWeight * 1000
}
