package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** Generic additive-statistics maintenance — the engine primitive
  * behind [[IncrementalGram]] (Gram/PCA sufficient statistics) and the
  * o9 postings/BM25 corpus-statistics drive. Any statistic that is an
  * exact SUM over rows (counts, exact DECIMAL sums, int64 folds) is
  * associative and order-independent, so a batch folds into the
  * persisted table by keyed addition — one O(batch) pass + a
  * key-cardinality merge, never a corpus recompute — and a batch
  * retires (takedowns, rollback) by folding in its NEGATION. What does
  * NOT qualify: max/min (not invertible), floats summed in
  * engine-chosen order (not exactly associative), distinct counts
  * (not additive across overlapping batches — callers make batches
  * disjoint on the counted key first, as o8/o9 do by construction).
  *
  * Consistency contract shared by all users: the merge is
  * read-modify-overwrite of a key-cardinality table, atomic per batch
  * via Catalog.save's directory overwrite; the merged frame is
  * materialized to durable scratch BEFORE the overwrite because it
  * lazily reads the very files save() replaces; addition is NOT
  * idempotent — at-least-once upstreams dedup batches first.
  */
object AdditiveStats {

  /** Fold `stats` into `table` by summing every non-key column per
    * `keys` group, creating the table on first use. Column types are
    * preserved (long sums stay long, DECIMAL(38,s) sums stay
    * DECIMAL(38,s)).
    */
  def fold(cat: Catalog, table: String, stats: DataFrame,
           keys: Seq[String]): DataFrame =
    fold(cat, table, stats, keys, dropAllZero = false)

  private def fold(cat: Catalog, table: String, stats: DataFrame,
                   keys: Seq[String], dropAllZero: Boolean): DataFrame = {
    val sumCols = stats.columns.filterNot(keys.contains).toSeq
    val exists = cat.exists(table)
    val summed =
      if (exists) {
        val aggs = sumCols.map(c => sum(col(c)).as(c))
        cat.table(table).unionByName(stats)
          .groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
      } else stats
    // After a retire, a key whose ENTIRE contribution came from the
    // retired batch is left as an all-zero residue row (e.g. a postings
    // term seen only in that doc batch) — which a recompute over the
    // remaining corpus would not contain. Dropping all-zero rows
    // restores recompute equivalence PROVIDED every live key has at
    // least one strictly-positive summed column — true for both users
    // (o8's n_vecs, o9's counts are per-key row counts, > 0 whenever
    // any contributing row remains).
    val merged =
      if (dropAllZero)
        summed.filter(sumCols.map(col(_) =!= lit(0)).reduce(_ || _))
      else summed
    // The durable-scratch staging exists because `merged` lazily reads
    // the very files save() replaces — but only the MERGE case reads
    // the target table. The creation fold writes the batch statistics
    // straight to the warehouse (halves the creation write cost; at
    // three maintained tables per ingest the extra write jobs were the
    // dominant t17b cost, not the statistics).
    val durable =
      if (exists) graft.queries.Scratch.materialize(
        cat.spark, s"additive_$table", merged)
      else merged
    cat.save(table, durable)
  }

  /** Fold the NEGATION of `stats` into the existing `table` — removes a
    * previously-folded batch's contribution exactly. The caller must
    * pass exactly the statistics that were folded (subtraction of a
    * never-folded batch corrupts the table as surely as
    * double-addition).
    */
  def retire(cat: Catalog, table: String, stats: DataFrame,
             keys: Seq[String]): DataFrame = {
    require(cat.exists(table),
      s"retire: statistics table '$table' does not exist")
    val negated = stats.select(stats.columns.toSeq.map { c =>
      if (keys.contains(c)) col(c) else negate(col(c)).as(c)
    }: _*)
    fold(cat, table, negated, keys, dropAllZero = true)
  }
}
