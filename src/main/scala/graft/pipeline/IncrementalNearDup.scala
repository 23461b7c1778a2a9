package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** Incremental NEAR-duplicate ingest — the scale story exact
  * [[IncrementalIngest]] tells, extended to fuzzy matches: dedup an
  * arriving batch against the existing corpus without recomputing
  * anything corpus-sized. The warehouse keeps a simhash signature
  * index (`<table>_sigs`) beside the corpus; a batch computes its own
  * signatures once, band-joins them against the INDEX (4×16-bit
  * pigeonhole bands — ≤3 flipped bits corrupt at most 3 of 4 bands,
  * the d4b rule), and only novel docs append. Work per batch is
  * O(batch × matching band buckets), independent of history size; at
  * cluster scale the index is written partitioned by band so a batch
  * probe prunes to its own buckets.
  *
  * Suppression semantics (deterministic, order-free):
  *  - within the batch: a doc is dropped when ANY lower-doc_id batch
  *    member is within hamming ≤ 3 (pairwise; a dropped doc still
  *    suppresses — conservative for dedup, and it makes the rule a
  *    pure function of the batch, not of iteration order);
  *  - against the index: a doc is dropped when any INDEXED doc is
  *    within hamming ≤ 3. The index holds kept docs only, so a
  *    near-dup's surviving twin is always in the corpus.
  *
  * Crash safety mirrors the other per-batch writers: rows and
  * signatures each land under `__batch_id=<id>/` with mode(overwrite),
  * partial (`_SUCCESS`-less) directories are purged at every entry,
  * and a replay with the same `batchId` overwrites its own
  * directories. Write order is rows THEN signatures: a crash between
  * the two leaves committed rows whose signatures are missing — future
  * near-dups of those docs could slip in (duplicates, repaired by the
  * replay) — never the reverse, where a signature with no surviving
  * row would silently drop future docs whose twin is absent from the
  * corpus (data loss).
  */
object IncrementalNearDup {

  /** 4×16-bit band explosion of a `(doc_id, simhash)` frame. */
  private def banded(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("simhash"), 16 * k).bitwiseAND(lit(65535L))): _*))
        .as(Seq("k", "band")))

  /** The corpus as one frame (all committed batches). */
  def corpus(cat: Catalog, table: String): DataFrame =
    cat.spark.read.parquet(s"${cat.warehouse}/$table").drop("__batch_id")

  /** Ingest `batch` (must carry `doc_id` and `text`): returns the
    * surviving (novel) rows after appending them and their signatures.
    * Pass the upstream's stable `batchId` for replay idempotency; an
    * empty survivor set writes nothing and consumes no id.
    */
  def ingest(cat: Catalog, batch: DataFrame, table: String,
             batchId: Option[Long] = None): DataFrame = {
    val sigsTable = s"${table}_sigs"
    IncrementalIngest.purgePartialBatches(cat, table)
    IncrementalIngest.purgePartialBatches(cat, sigsTable)
    // signatures computed ONCE per batch, durably: the within-batch
    // self-join, the index probe, and the signature append all read
    // this frame — recomputing the token explode three times would
    // triple the batch's heaviest stage
    val bs = graft.queries.Scratch.materialize(cat.spark, "neardup_bsigs",
      graft.queries.DedupQueries.simhashDocs(batch))
    val bb = banded(bs)
    val withinDup = bb.as("x").join(bb.as("y"),
        col("x.k") === col("y.k") && col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= 3)
      .select(col("y.doc_id").as("doc_id"))
    val idxDup =
      if (cat.exists(sigsTable)) {
        val idx = cat.spark.read.parquet(s"${cat.warehouse}/$sigsTable")
          .drop("__batch_id")
          .select(col("doc_id").as("idx_id"), col("simhash").as("idx_sim"))
        bb.join(banded(idx.select(col("idx_id").as("doc_id"),
            col("idx_sim").as("simhash")))
            .select(col("k").as("ki"), col("band").as("bi"),
              col("simhash").as("si")),
            col("k") === col("ki") && col("band") === col("bi"))
          .filter(bit_count(col("simhash").bitwiseXOR(col("si"))) <= 3)
          .select(col("doc_id"))
      } else bs.select(col("doc_id")).limit(0)
    val dropIds = withinDup.union(idxDup).distinct()
    val kept = batch.join(dropIds, Seq("doc_id"), "left_anti").persist()
    try {
      if (kept.isEmpty) kept
      else {
        val id = batchId.getOrElse(
          IncrementalIngest.batchIds(cat, table).foldLeft(-1L)(math.max) + 1)
        kept.write.mode("overwrite")
          .parquet(s"${cat.warehouse}/$table/__batch_id=$id")
        bs.join(dropIds, Seq("doc_id"), "left_anti")
          .write.mode("overwrite")
          .parquet(s"${cat.warehouse}/$sigsTable/__batch_id=$id")
        cat.spark.read.parquet(s"${cat.warehouse}/$table/__batch_id=$id")
      }
    } finally { kept.unpersist(false); () }
  }
}
