package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.engine.Catalog

/** Incremental maintenance of the a10 Gram/PCA sufficient statistics —
  * the 100 TB shape for keeping covariance/PCA current under arriving
  * embedding batches. Because every statistic is an exact DECIMAL sum
  * over the 1e-6-grid int64 quantization (order-independent,
  * associative), a batch folds into the persisted table by PURE
  * ADDITION on (i, j): one O(batch · d²) pass over the new vectors and
  * a d²-row merge — never a corpus recompute. PcaSpec proves the
  * algebra (stats(A ∪ B) = stats(A) + stats(B) elementwise); the
  * registered `o8_incremental_gram` drive proves the persisted-table
  * path end to end by hash-matching the full-corpus a10 oracle after
  * two-batch ingestion.
  *
  * Consistency: the merge is read-modify-overwrite of one d²-row
  * table, so the statistics table is replaced atomically per batch
  * (Catalog.save's overwrite); the merged frame is materialized to
  * durable scratch BEFORE the overwrite because it lazily reads the
  * very files save() replaces (the lineage self-invalidation guard
  * the ingest pipelines share). Callers with at-least-once upstreams
  * must dedup batches before folding — addition is not idempotent.
  */
object IncrementalGram {

  /** Fold `batch` (vec_id, embedding Array[Float]) into the persisted
    * statistics table `table`, creating it on first use; returns the
    * merged statistics (i, j, n_vecs, sum_prod, sum_i, sum_j).
    */
  def ingest(cat: Catalog, batch: DataFrame, table: String): DataFrame =
    // existence by WAREHOUSE state, not the session temp-view list
    // (inside AdditiveStats.fold) — a previous drive in the same
    // session (bench repeat runs) registers the same view name for its
    // own fresh warehouse, and merging into THAT would fold a stale
    // corpus into this run's statistics
    AdditiveStats.fold(cat, table,
      graft.queries.SimilarityQueries.gramStats(batch), Seq("i", "j"))

  /** Remove a previously-ingested batch's contribution — the deletion
    * path (takedowns, corrupted-batch rollback) that exact additive
    * statistics get for free: fold in the batch's stats NEGATED. The
    * caller must pass exactly the rows that were ingested (the same
    * dedup discipline as [[ingest]] — subtraction of a never-ingested
    * batch corrupts the table as surely as double-addition).
    * retire(ingest(B)) is the identity on the statistics, which
    * PcaSpec asserts.
    */
  def retire(cat: Catalog, batch: DataFrame, table: String): DataFrame =
    AdditiveStats.retire(cat, table,
      graft.queries.SimilarityQueries.gramStats(batch), Seq("i", "j"))
}
