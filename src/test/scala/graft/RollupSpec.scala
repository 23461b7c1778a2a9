package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog
import graft.pipeline.IncrementalRollup

/** IncrementalRollup: partition-level maintenance of a materialized
  * aggregate. The invariants that make it safe at 100 TB:
  *  - incremental ingest converges to exactly the full recompute,
  *    including for late-arriving (old-partition) batches;
  *  - untouched rollup partitions are NOT rewritten (file mtimes);
  *  - refresh is idempotent (the crash-repair path).
  */
class RollupSpec extends SparkTestBase {
  import spark.implicits._

  private def freshWh(name: String): Catalog =
    new Catalog(spark, graft.queries.Scratch.fresh(spark, name))

  private def rollup(slice: DataFrame): DataFrame =
    slice.groupBy(col("day"), col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))

  private def rows(df: DataFrame): Set[(String, String, Long, Long)] =
    df.select(col("day").cast("string"), col("kind"),
        col("n").cast("long"), col("total").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def mkBatch(tuples: Seq[(String, String, Long)]): DataFrame =
    tuples.toDF("day0", "kind", "amount")
      .select(col("day0").cast("date").as("day"), col("kind"), col("amount"))

  test("incremental ingest equals full recompute, late rows included") {
    val cat = freshWh("rollup_a")
    val b1 = mkBatch(Seq(
      ("2024-03-01", "x", 10L), ("2024-03-01", "y", 5L),
      ("2024-03-02", "x", 7L)))
    // b2 is late-arriving for 03-01 AND opens a new day 03-03
    val b2 = mkBatch(Seq(
      ("2024-03-01", "x", 3L), ("2024-03-03", "y", 2L)))
    IncrementalRollup.ingest(cat, "f", "r", "day", b1, rollup)
    val out = IncrementalRollup.ingest(cat, "f", "r", "day", b2, rollup)
    val full = rollup(spark.read.parquet(s"${cat.warehouse}/f"))
    assert(rows(out) == rows(full))
    assert(rows(out) == Set(
      ("2024-03-01", "x", 2L, 13L), ("2024-03-01", "y", 1L, 5L),
      ("2024-03-02", "x", 1L, 7L), ("2024-03-03", "y", 1L, 2L)))
  }

  test("untouched rollup partitions are not rewritten") {
    val cat = freshWh("rollup_b")
    IncrementalRollup.ingest(cat, "f", "r", "day", mkBatch(Seq(
      ("2024-03-01", "x", 1L), ("2024-03-02", "x", 1L))), rollup)
    def files(day: String): Map[String, Long] = {
      val dir = new java.io.File(s"${cat.warehouse}/r/day=$day")
      Option(dir.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = files("2024-03-01")
    assert(before.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Seq(("2024-03-02", "y", 4L))), rollup)
    assert(files("2024-03-01") == before,
      "a batch touching only 03-02 must not rewrite the 03-01 partition")
  }

  test("refresh is idempotent — the crash-repair path") {
    val cat = freshWh("rollup_c")
    IncrementalRollup.ingest(cat, "f", "r", "day", mkBatch(Seq(
      ("2024-03-01", "x", 1L), ("2024-03-02", "x", 2L))), rollup)
    val once = rows(cat.table("r"))
    // repair replay: same touched set, same fact state
    val again = IncrementalRollup.refresh(cat, "f", "r", "day",
      Seq(java.sql.Date.valueOf("2024-03-02")), rollup)
    assert(rows(again) == once)
  }

  test("streaming rollup maintenance == batch full recompute, restart is a no-op") {
    val cat = freshWh("rollup_s")
    val ckpt = graft.queries.Scratch.fresh(spark, "rollup_s_ckpt")
    graft.streaming.RollupStream.maintain(cat, sfDir, ckpt)
      .awaitTermination()
    val full = graft.streaming.RollupStream.rollup(
      graft.engine.Graft.events(spark, sfDir)
        .select(to_date(col("ts")).as("day"), col("event_type"), col("value")))
    def byDay(df: DataFrame): Set[(String, String, Long, Double)] =
      df.select(col("day").cast("string"), col("event_type"),
          col("n_events").cast("long"), col("total_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val streamed = byDay(spark.read.parquet(s"${cat.warehouse}/ev_rollup"))
    assert(streamed == byDay(full))
    // restart against the same checkpoint: everything already committed,
    // so no micro-batch runs and the rollup bytes stay put
    graft.streaming.RollupStream.maintain(cat, sfDir, ckpt)
      .awaitTermination()
    assert(byDay(spark.read.parquet(s"${cat.warehouse}/ev_rollup")) == streamed)
  }

  test("streaming replay with a lost checkpoint overwrites, never duplicates") {
    // The crash-replay path: if the checkpoint is lost after the fact
    // write, the source re-delivers everything under the same batch ids
    // -- the __batch_id=N overwrite layout must make that byte-stable
    // instead of doubling the fact table.
    val cat = freshWh("rollup_r")
    graft.streaming.RollupStream.maintain(cat, sfDir,
      graft.queries.Scratch.fresh(spark, "rollup_r_ck1")).awaitTermination()
    val factRows = spark.read.parquet(s"${cat.warehouse}/ev_fact").count()
    val rollupBefore = spark.read.parquet(s"${cat.warehouse}/ev_rollup")
      .collect().map(_.toString).sorted.toSeq
    // fresh checkpoint, same warehouse = full redelivery
    graft.streaming.RollupStream.maintain(cat, sfDir,
      graft.queries.Scratch.fresh(spark, "rollup_r_ck2")).awaitTermination()
    assert(spark.read.parquet(s"${cat.warehouse}/ev_fact").count() == factRows,
      "replayed batches must overwrite their __batch_id dirs, not append")
    assert(spark.read.parquet(s"${cat.warehouse}/ev_rollup")
      .collect().map(_.toString).sorted.toSeq == rollupBefore)
  }

  test("batch-path ingest replayed with the same batchId is idempotent") {
    val cat = freshWh("rollup_e")
    val b1 = mkBatch(Seq(("2024-03-01", "x", 10L), ("2024-03-02", "y", 5L)))
    IncrementalRollup.ingest(cat, "f", "r", "day", b1, rollup,
      batchId = Some(7L))
    val factOnce = spark.read.parquet(s"${cat.warehouse}/f").count()
    val rollupOnce = rows(cat.table("r"))
    // crash-replay: the upstream redelivers the SAME batch id — the
    // write must overwrite __batch_id=7, not append a duplicate
    IncrementalRollup.ingest(cat, "f", "r", "day", b1, rollup,
      batchId = Some(7L))
    assert(spark.read.parquet(s"${cat.warehouse}/f").count() == factOnce,
      "replay with the same batchId must overwrite its own directory")
    assert(rows(cat.table("r")) == rollupOnce)
    // and a genuinely new batch (no id) still lands in a fresh dir
    IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Seq(("2024-03-03", "x", 1L))), rollup)
    assert(new java.io.File(s"${cat.warehouse}/f/__batch_id=8").isDirectory,
      "auto-allocated id must be max existing + 1")
    assert(rows(cat.table("r")) == rollupOnce +
      (("2024-03-03", "x", 1L, 1L)))
  }

  test("a partial (crashed, _SUCCESS-less) fact batch is purged, never counted") {
    val cat = freshWh("rollup_f")
    IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Seq(("2024-03-01", "x", 1L))), rollup)
    // simulate a crash DURING the fact write of batch 1: dir exists,
    // some data landed, no _SUCCESS marker
    val partial = new java.io.File(s"${cat.warehouse}/f/__batch_id=1")
    mkBatch(Seq(("2024-03-01", "x", 999L))).write.parquet(partial.getPath)
    assert(new java.io.File(partial, "_SUCCESS").delete())
    // the upstream redelivers; recovery must purge the fragment first —
    // its 999 must appear exactly once, and the fresh id must be 1
    // again (not 2 behind a zombie dir)
    val out = IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Seq(("2024-03-01", "x", 999L))), rollup)
    assert(!partial.exists() ||
      new java.io.File(partial, "_SUCCESS").exists())
    assert(rows(out) == Set(("2024-03-01", "x", 2L, 1000L)),
      "fragment rows double-counted or lost")
    // refresh alone (the crash-repair path) also purges partials
    mkBatch(Seq(("2024-03-01", "x", 777L))).write
      .parquet(s"${cat.warehouse}/f/__batch_id=9")
    assert(new java.io.File(s"${cat.warehouse}/f/__batch_id=9/_SUCCESS").delete())
    val repaired = IncrementalRollup.refresh(cat, "f", "r", "day",
      Seq(java.sql.Date.valueOf("2024-03-01")), rollup)
    assert(rows(repaired) == Set(("2024-03-01", "x", 2L, 1000L)))
  }

  test("refresh after purging the table's only (partial) batch fails with the repair hint") {
    val cat = freshWh("rollup_h")
    // first-ever ingest crashed mid fact write: only a partial batch
    // dir exists, no _SUCCESS anywhere
    mkBatch(Seq(("2024-03-01", "x", 1L))).write
      .parquet(s"${cat.warehouse}/f/__batch_id=0")
    assert(new java.io.File(s"${cat.warehouse}/f/__batch_id=0/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.refresh(cat, "f", "r", "day",
        Seq(java.sql.Date.valueOf("2024-03-01")), rollup)
    }
    assert(e.getMessage.contains("no committed batches"), e.getMessage)
  }

  test("a flat (non-batch) fact layout is refused loudly, not misread") {
    val cat = freshWh("rollup_g")
    // an old-layout table: partition dirs directly at the root
    mkBatch(Seq(("2024-03-01", "x", 1L)))
      .write.partitionBy("day").parquet(s"${cat.warehouse}/f")
    val e = intercept[IllegalArgumentException] {
      IncrementalRollup.ingest(cat, "f", "r", "day",
        mkBatch(Seq(("2024-03-02", "y", 2L))), rollup)
    }
    assert(e.getMessage.contains("__batch_id"), e.getMessage)
  }

  test("empty batch leaves the rollup untouched") {
    val cat = freshWh("rollup_d")
    IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Seq(("2024-03-01", "x", 1L))), rollup)
    val before = rows(cat.table("r"))
    val after = IncrementalRollup.ingest(cat, "f", "r", "day",
      mkBatch(Nil), rollup)
    assert(rows(after) == before)
  }
}
