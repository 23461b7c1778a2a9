package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.Catalog
import graft.pipeline.IncrementalNearDup

/** Continuous near-duplicate ingest — the streaming twin of
  * [[IncrementalNearDup]], closing the streaming story for dedup the
  * way [[RollupStream]] closes it for materialized aggregates:
  * documents arrive as files, each micro-batch dedups against itself
  * AND the persistent simhash signature index (4×16-bit band join,
  * hamming ≤ 3), and only novel docs land in the corpus.
  *
  * Exactly-once comes from composing two idempotencies: the
  * checkpointed AvailableNow source never redelivers a processed file
  * set, and a crash-replayed micro-batch rewrites its own
  * `__batch_id=<upstream id>` overwrite directory — the same replay
  * contract NearDupIngestSpec proves for the batch path, now keyed by
  * the STREAM's stable batch id. State lives entirely in the
  * warehouse (corpus + signature index), not in executors: a restart
  * resumes from files + checkpoint with nothing to rebuild, and at
  * 100 TB the per-batch work stays O(batch × matching band buckets)
  * regardless of corpus size.
  */
object NearDupStream {

  /** Start continuously ingesting `$dir/documents.parquet` into
    * `table` in `cat`, near-dup-suppressed. One-shot
    * (Trigger.AvailableNow) over the files currently present; callers
    * `awaitTermination()`. Re-running with the same checkpoint is a
    * no-op for already-processed files.
    */
  def maintain(cat: Catalog, dir: String, checkpoint: String,
               table: String): StreamingQuery =
    CorpusStream.source(cat.spark, dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalNearDup.ingest(cat, batch, table, Some(batchId)): Unit
      }
      .start()
}
