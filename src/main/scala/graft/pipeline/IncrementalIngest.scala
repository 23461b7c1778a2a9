package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** Append-only ingestion with content dedup — the daily-batch shape of
  * a 100 TB training-data pipeline: every arriving batch is
  * deduplicated within itself AND against everything ever ingested,
  * then only the survivors (and their digests) are appended.
  *
  * State is one digest table (16-byte md5 per unique document ever
  * seen), so the anti-join shuffles on the digest — O(batch) work per
  * batch regardless of history size once the digest table is
  * bucketed/partitioned by digest prefix; no full-corpus rescan, no
  * driver-side state.
  *
  * Crash safety (exactly-once): there is no atomic multi-table commit
  * on a filesystem, so both appends are made *recoverable* instead —
  * each batch lands under its own `__batch_id=` partition in BOTH the
  * row table and the digest table, making "did batch B's append
  * complete?" an O(1) partition-directory check, at any history size.
  * Append order is rows first, then digests, and [[recover]] (run at
  * the start of every ingest) re-appends the digests from the durable
  * `<table>_last_batch` artifact when a crash struck between the two.
  * The failure matrix:
  *  - crash before the row append: nothing committed, digest table
  *    unchanged — a replay of the batch dedups to the same survivors
  *    and ingests them (at-least-once from the source, no loss);
  *  - crash between the appends: rows committed, digests missing — a
  *    naive replay would re-ingest duplicates, but recover() completes
  *    the digest append first, so the replay anti-joins to empty;
  *  - crash after both: fully committed, replay is a no-op.
  * The digests-first order this replaces had an unrecoverable window:
  * a replay anti-joined the rows out against the already-recorded
  * digests and dropped the batch permanently.
  */
object IncrementalIngest {

  private def rowsDir(cat: Catalog, table: String, batchId: Long) =
    s"${cat.warehouse}/$table/__batch_id=$batchId"

  private def digestsDir(cat: Catalog, table: String, batchId: Long) =
    s"${cat.warehouse}/${table}_digests/__batch_id=$batchId"

  /** Batch ids ever committed to the row table: the partition listing
    * (at scale: one object-store LIST of top-level prefixes).
    */
  private def committedBatches(cat: Catalog, table: String): Seq[Long] = {
    val root = new java.io.File(s"${cat.warehouse}/$table")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("__batch_id="))
      .map(_.getName.stripPrefix("__batch_id=").toLong)
  }

  /** Close the one crash window: if the newest committed row batch has
    * no digest partition, finish its digest append from the
    * `<table>_last_batch` artifact. Idempotent; O(1) directory checks.
    */
  def recover(cat: Catalog, table: String): Unit =
    committedBatches(cat, table).sorted.lastOption.foreach { last =>
      if (!new java.io.File(digestsDir(cat, table, last)).exists()) {
        val lb = cat.spark.read.parquet(s"${cat.warehouse}/${table}_last_batch")
        lb.select(col("__fp").as("fp"))
          .write.mode("overwrite").parquet(digestsDir(cat, table, last))
      }
    }

  /** Ingest `batch`: returns the rows whose `textCol` content was never
    * seen before (first occurrence within the batch wins), after
    * appending the rows to `table` and their digests to
    * `<table>_digests` — each under a fresh `__batch_id=` partition.
    */
  def ingest(cat: Catalog, batch: DataFrame, textCol: String,
             table: String): DataFrame = {
    recover(cat, table)
    val digests = s"${table}_digests"
    val batchId = committedBatches(cat, table).foldLeft(0L)(math.max) + 1
    val withFp = batch.withColumn("__fp", md5(col(textCol)))
      .dropDuplicates("__fp") // within-batch dedup
    // read the digest history from storage, not the temp view: a fresh
    // session over an existing warehouse has no view registered yet
    val fresh =
      if (cat.exists(digests))
        withFp.join(
          cat.spark.read.parquet(s"${cat.warehouse}/$digests").select("fp"),
          withFp("__fp") === col("fp"), "left_anti")
      else withFp
    // Materialize the surviving batch ONCE, durably, BEFORE either
    // append: the returned frame's lineage would otherwise re-run the
    // anti-join against the now-updated digest table and evaluate to
    // empty (self-invalidation). The `<table>_last_batch` artifact
    // doubles as the recovery source and the ingest audit trail.
    val freshDir = s"${cat.warehouse}/${table}_last_batch"
    fresh.write.mode("overwrite").parquet(freshDir)
    val freshBack = cat.spark.read.parquet(freshDir)
    freshBack.drop("__fp")
      .write.mode("overwrite").parquet(rowsDir(cat, table, batchId))
    freshBack.select(col("__fp").as("fp"))
      .write.mode("overwrite").parquet(digestsDir(cat, table, batchId))
    // re-register both views over the partitioned roots
    Seq(table, digests).foreach { n =>
      cat.spark.read.parquet(s"${cat.warehouse}/$n")
        .createOrReplaceTempView(n)
    }
    freshBack.drop("__fp")
  }
}
