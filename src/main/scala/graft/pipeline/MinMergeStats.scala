package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** First-writer-wins registry maintenance — the third merge algebra in
  * the incremental family, next to [[AdditiveStats]] (exact sums) and
  * the o4/o6 partition-scoped refreshes. Per `keys` group the table
  * keeps the lexicographically-MINIMAL `ord` tuple (the "owner": e.g.
  * the first corpus-wide occurrence of a segment, keyed by
  * (doc_id, start)). min over a total order is commutative,
  * associative AND idempotent, so — unlike addition — the fold is
  * exact under ANY batch arrival order and under REDELIVERY: folding
  * the same batch twice is a no-op, and no upstream dedup contract is
  * needed. What min-merge canNOT do that addition can: retire. A
  * min is not invertible (removing the current owner needs the
  * runner-up, which the table no longer has), so takedown flows
  * rebuild the affected keys from the surviving corpus instead —
  * the documented tradeoff between the two algebras.
  *
  * Consistency contract shared with AdditiveStats: the merge is
  * read-modify-overwrite of a key-cardinality table, atomic per batch
  * via Catalog.save's directory overwrite; the merged frame is
  * materialized to durable scratch BEFORE the overwrite because it
  * lazily reads the very files save() replaces.
  */
object MinMergeStats {

  /** Fold `batch` into `table`: per `keys` group keep the minimal
    * `ord` tuple across the existing table and the batch, creating
    * the table on first use. The batch may carry duplicate keys
    * (the groupBy reduces them) and may be a redelivery (idempotent).
    */
  def fold(cat: Catalog, table: String, batch: DataFrame,
           keys: Seq[String], ord: Seq[String]): DataFrame = {
    val exists = cat.exists(table)
    val unioned =
      if (exists) cat.table(table).unionByName(batch) else batch
    val merged = unioned
      .groupBy(keys.map(col): _*)
      .agg(min(struct(ord.map(col): _*)).as("__owner"))
      .select(keys.map(col) ++
        ord.map(c => col(s"__owner.$c").as(c)): _*)
    val durable =
      if (exists) graft.queries.Scratch.materialize(
        cat.spark, s"minmerge_$table", merged)
      else merged
    cat.save(table, durable)
  }

  /** Takedown — the min-merge complement of AdditiveStats.retire. A
    * min is not invertible (the table no longer holds the runner-up),
    * so removing a batch's contribution REBUILDS the affected keys
    * from the surviving corpus instead of folding a negation:
    *
    *  - affected keys = registry rows whose OWNER satisfies
    *    `retiredOwner`. Keys owned by a surviving row are untouched —
    *    removing a non-owner occurrence never changes a min, so the
    *    rebuild work is O(occurrences of affected keys among
    *    `survivors`), not a corpus recompute;
    *  - `survivors` is the surviving corpus's candidate-owner frame
    *    (keys ++ ord columns, reduced or not — the groupBy reduces);
    *    affected keys with no surviving occurrence drop out entirely,
    *    restoring recompute equivalence.
    */
  def rebuild(cat: Catalog, table: String, survivors: DataFrame,
              retiredOwner: org.apache.spark.sql.Column,
              keys: Seq[String], ord: Seq[String]): DataFrame = {
    require(cat.exists(table),
      s"rebuild: registry table '$table' does not exist")
    val reg = cat.table(table)
    // NULL-evaluating predicates would otherwise drop a row from BOTH
    // sides (filter(p) and filter(!p) each exclude NULL) — a live key
    // silently deleted on takedown. Treat NULL as not-retired.
    val retired = coalesce(retiredOwner, lit(false))
    val affected = reg.filter(retired)
    val keep = reg.filter(!retired)
    val rebuilt = survivors
      .join(affected.select(keys.map(col): _*), keys, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(min(struct(ord.map(col): _*)).as("__owner"))
      .select(keys.map(col) ++
        ord.map(c => col(s"__owner.$c").as(c)): _*)
    val merged = graft.queries.Scratch.materialize(
      cat.spark, s"minmerge_$table", keep.unionByName(rebuilt))
    cat.save(table, merged)
  }
}
