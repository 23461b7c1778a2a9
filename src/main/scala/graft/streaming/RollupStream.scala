package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.Catalog
import graft.pipeline.IncrementalRollup

/** Streaming materialized-view maintenance — the streaming shape of
  * [[graft.pipeline.IncrementalRollup]] (o4's batch path): a file
  * stream of events drives the day-partitioned fact table and the
  * per-partition rollup refresh from inside `foreachBatch`, so the
  * rollup stays current as batches land instead of waiting for a
  * nightly rebuild.
  *
  * Exactly-once without a transactional sink: `foreachBatch` replays a
  * micro-batch whose commit never reached the checkpoint, so both
  * writes must be replay-idempotent —
  *  - the fact write lands under `__batch_id=<id>/` with
  *    mode(overwrite): a replayed batch overwrites its own directory
  *    with identical content (the IncrementalIngest pattern);
  *  - the rollup refresh recomputes touched partitions from fact state,
  *    which [[IncrementalRollup.refresh]] already makes idempotent.
  * Crash between the two: the replay overwrites the fact dir and
  * re-runs the refresh — converges to the same bytes.
  */
object RollupStream {

  /** The rollup formula shared by the stream and the parity check —
    * one definition, so the two cannot drift. Drops the
    * `__batch_id` partition-discovery column the streaming fact layout
    * adds (batch placement is a storage detail, not part of the
    * rollup's contract).
    */
  def rollup(slice: DataFrame): DataFrame =
    slice.drop("__batch_id")
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.engine.Functions.dsum(col("value")).as("total_value"))

  /** Start maintaining `ev_rollup` in `cat` from a one-shot
    * (AvailableNow) file stream over `$dir/events.parquet`. Returns the
    * started query; callers `awaitTermination()`.
    */
  def maintain(cat: Catalog, dir: String, checkpoint: String): StreamingQuery = {
    val ev = EventsStream.source(cat.spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
    ev.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // single evaluation of the micro-batch (same rationale as
        // IncrementalRollup.ingest): write and touched-set scan share
        // the persisted blocks
        val b = batch.persist()
        try {
          b.write.mode("overwrite").partitionBy("day")
            .parquet(s"${cat.warehouse}/ev_fact/__batch_id=$batchId")
          val touched = b.select(col("day")).distinct()
            .collect().map(_.get(0)).toSeq
          IncrementalRollup.refresh(cat, "ev_fact", "ev_rollup", "day",
            touched, rollup): Unit
        } finally { b.unpersist(false); () }
      }
      .start()
  }
}
