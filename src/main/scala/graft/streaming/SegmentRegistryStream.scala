package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.engine.Catalog
import graft.pipeline.MinMergeStats
import graft.queries.DedupQueries

/** Continuous maintenance of the first-occurrence segment registry —
  * the streaming twin of the o11 batch drive, and the payoff of
  * picking an IDEMPOTENT merge algebra: [[MinMergeStats]]' fold is
  * commutative, associative and idempotent, which is EXACTLY the
  * at-least-once delivery contract a foreachBatch sink needs. Unlike
  * [[NearDupStream]] (whose per-batch appends must key on the stream's
  * stable batch id to survive replay) this sink carries NO batch-id
  * bookkeeping at all: a crash-replayed micro-batch re-folds the same
  * candidate owners and the min-merge absorbs them as a no-op — the
  * algebra, not the plumbing, is the exactly-once mechanism.
  * StreamingSpec proves it the hard way, deleting a committed batch's
  * commit marker mid-checkpoint and restarting: the replay must leave
  * the registry bit-identical.
  *
  * State lives entirely in the warehouse registry table (dictionary
  * cardinality — one row per distinct segment literal), never in
  * executor memory: a restart resumes from files + checkpoint with
  * nothing to rebuild. Since round 16 the fold is APPEND-ONLY
  * (MinMergeStats' delta log): each micro-batch shuffles and writes
  * only its own distinct (digest, literal) owners — O(batch),
  * independent of corpus history length — and never reads the
  * registry at all; readers merge on the fly and the amortized
  * bucket-scoped compaction bounds their delta count. The r15 census
  * measured the previous read-modify-overwrite design above-linear at
  * the sixth decade (11.9x per 10x: every micro-batch rewrote the
  * whole literal-carrying dictionary); the delta fold's write mass is
  * batch-linear at every decade.
  */
object SegmentRegistryStream {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Start folding every staged corpus file into `table` in `cat`.
    * One-shot (Trigger.AvailableNow) over the files currently present,
    * one micro-batch per file (maxFilesPerTrigger=1) so a multi-file
    * staging dir drives a genuine multi-batch stream; callers
    * `awaitTermination()`. The file-to-batch assignment is arbitrary
    * ON PURPOSE — min over a total order is batching-invariant, so the
    * registry must come out identical under any split, any order, and
    * any redelivery.
    */
  def maintain(cat: Catalog, stagedDir: String, checkpoint: String,
               table: String = "seg_registry"): StreamingQuery =
    cat.spark.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Break lineage from the streaming source before the fold —
        // jobs planned over a streaming-sourced frame run AQE-less
        // (see CcLabelStream for the measured fifth-decade cost); the
        // materialize is one micro-batch-sized write. Fan out for the
        // tokenize + segment-explode sized from the batch's on-disk
        // bytes (r19; was pinned at session parallelism — the
        // CcLabelStream stage-diff finding applied to this sink's
        // identical materialize shape): text hashing runs ~1-3 s of
        // CPU per MB, so 1 MB-per-task keeps tasks in the seconds
        // while a suite-scale batch stays one task with no exchange.
        val b = graft.queries.Scratch.materializeForCpu(cat.spark,
          "o11s_batch", batch, targetBytes = 1L << 20)
        val toks = b.select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("tk"))
        MinMergeStats.fold(cat, table,
          DedupQueries.segmentOwners(DedupQueries.docSegments(toks)),
          DedupQueries.SegRegistryKeys, DedupQueries.SegRegistryOrd,
          batchReduced = true): Unit
      }
      .start()
}
