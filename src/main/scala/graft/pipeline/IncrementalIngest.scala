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
  */
object IncrementalIngest {

  /** Ingest `batch`: returns the rows whose `textCol` content was never
    * seen before (first occurrence within the batch wins), after
    * appending their digests to `<table>_digests` and the rows
    * themselves to `table`.
    */
  def ingest(cat: Catalog, batch: DataFrame, textCol: String,
             table: String): DataFrame = {
    val digests = s"${table}_digests"
    val withFp = batch.withColumn("__fp", md5(col(textCol)))
      .dropDuplicates("__fp") // within-batch dedup
    val fresh =
      if (cat.exists(digests))
        withFp.join(cat.table(digests), withFp("__fp") === col("fp"),
          "left_anti")
      else withFp
    // Materialize the surviving batch ONCE, durably, BEFORE appending
    // its digests: the returned frame's lineage would otherwise re-run
    // the anti-join against the now-updated digest table and evaluate
    // to empty (self-invalidation). The `<table>_last_batch` artifact
    // doubles as the ingest audit trail.
    val freshDir = s"${cat.warehouse}/${table}_last_batch"
    fresh.write.mode("overwrite").parquet(freshDir)
    val freshBack = cat.spark.read.parquet(freshDir)
    cat.append(digests, freshBack.select(col("__fp").as("fp")))
    val out = freshBack.drop("__fp")
    cat.append(table, out)
    out
  }
}
