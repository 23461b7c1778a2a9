package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Catalog

/** Incremental connected-component LABEL maintenance — the fourth merge
  * algebra in the incremental family, closing the one heavy shared
  * artifact that had no maintenance path: the near-dup CC label table
  * (v, l) that d7/d10/c14/x10b and the corpus release all consume was
  * rebuilt from scratch per corpus; this maintains it per arriving
  * edge batch instead.
  *
  * Why min-label CC is incrementally maintainable at all: the stored
  * label of a component is the MINIMUM vertex id in it, and min over a
  * total order is commutative, associative and idempotent (the
  * [[MinMergeStats]] argument lifted from per-key owners to graph
  * components). An arriving batch of edges can only MERGE components,
  * never split them, so the fold is:
  *
  *  1. map each new edge's endpoints to their CURRENT labels
  *     (vertices unseen by the table label themselves) — this
  *     CONTRACTS every existing component to one super-node;
  *  2. drop self-loops (both endpoints already share a label: the
  *     redelivery / no-new-information case) and run the standard CC
  *     loop on the contracted graph — its size is O(new edges +
  *     touched components), NEVER corpus mass;
  *  3. emit the delta: the batch's new vertices with their final
  *     labels, plus (v, new_l) for every existing row whose component
  *     merged — found by one scan of the table filtered through the
  *     relabel map (old label -> merged label, changed entries only —
  *     bounded by the components the batch touched).
  *
  * Exactness: an old label IS the min vertex of its old component, so
  * the contracted CC's min over {old labels, new vertex ids} is the
  * min vertex of the merged component — identical to a from-scratch
  * recompute over the union of all edges folded so far (the o12
  * oracle: the full-corpus recursive-CTE closure, bit for bit).
  * Idempotency: refolding a delivered batch contracts every edge to a
  * self-loop, the contracted graph is empty, and the fold appends
  * NOTHING — at-least-once redelivery is absorbed by the algebra with
  * zero batch-id bookkeeping (the o11/o11s argument), and since round
  * 16 it is a physical no-op too. Takedowns follow the min-merge
  * rule: labels are not invertible (removing the min vertex needs the
  * runner-up, and a vertex removal can SPLIT a component), so retire =
  * rebuild the affected components from surviving edges — [[retire]],
  * driven by the o12b row against the closure oracle over survivors.
  *
  * STORAGE (since round 16): merges only ever LOWER a vertex's label
  * (the merged label is the min of the old ones), so the current label
  * of v is exactly `min(l)` over every (v, l) row ever appended — the
  * label table IS a min-merge registry with keys=(v), ord=(l), and the
  * fold delegates storage to [[MinMergeStats.fold]]'s append-only
  * delta log. The r15 census flagged this fold's predecessor
  * above-linear precisely because it re-saved the whole corpus-sized
  * label table per batch (IncrementalCc.fold's final `cat.save`, the
  * o11s term); the delta write is O(touched components + new
  * vertices), and the one remaining table-mass term per fold is a
  * columnar READ (the changed-row scan and the endpoint-label lookup),
  * never a write or a dictionary shuffle. Compaction (amortized, see
  * [[MinMergeStats.compact]]) keeps consumer reads on the plain
  * single-delta scan.
  *
  * No broadcast hint on the relabel joins (the r15 advisor's note: a
  * FIRST fold's relabel map is batch-sized — day-scale ingest mass at
  * 100 TB — and a forced broadcast would OOM the driver before AQE
  * could demote it). The relabel map is materialized to parquet
  * scratch, so the planner sees its true size and picks the broadcast
  * itself exactly when the map is small — the steady state, where it
  * is bounded by the components the batch touched.
  */
object IncrementalCc {

  private[pipeline] val Keys = Seq("v")
  private[pipeline] val Ord = Seq("l")

  /** Fold a canonical edge batch `(a, b)` (a < b, no self-loops
    * required — they are ignored) into label table `table` (columns
    * `(v, l)`), creating it on first use. Returns the table's merged
    * reading.
    */
  def fold(cat: Catalog, table: String, edges: DataFrame): DataFrame = {
    val s = cat.spark
    val exists = MinMergeStats.exists(cat, table)
    val cur =
      if (exists) MinMergeStats.view(cat, table, Keys, Ord) else null
    val verts = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v"))).distinct()
    // current labels of the batch's endpoints; unseen vertices label
    // themselves. Materialized: read by the contraction (twice) and by
    // the new-vertex append.
    // `seen` rides along so the new-vertex set comes from THIS frame —
    // a second anti-join against the (merge-on-read) table would
    // recompute the delta-union aggregate in another subtree
    val vl = graft.queries.Scratch.materialize(s, s"cc_vl_$table",
      if (exists)
        verts.join(cur, Seq("v"), "left")
          .select(col("v"), coalesce(col("l"), col("v")).as("l0"),
            col("l").isNotNull.as("seen"))
      else verts.select(col("v"), col("v").as("l0"),
        lit(false).as("seen")))
    // contraction: every existing component becomes one super-node;
    // self-loops (endpoints already merged — the redelivery case)
    // vanish here, which is what makes the fold idempotent
    val contracted = edges
      .join(vl.select(col("v").as("a"), col("l0").as("la")), Seq("a"))
      .join(vl.select(col("v").as("b"), col("l0").as("lb")), Seq("b"))
      .filter(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("a"),
        greatest(col("la"), col("lb")).as("b"))
      .distinct()
    // CC over the contracted graph only — O(new edges + touched
    // components). Changed-label rows only, materialized so the
    // planner knows it is (steady-state) broadcast-small.
    val relab = graft.queries.Scratch.materialize(s, s"cc_relab_$table",
      graft.queries.DedupQueries.connectedComponents(s, contracted)
        .select(col("v").as("old_l"), col("l").as("new_l"))
        .filter(col("old_l") =!= col("new_l")))
    val newRows = vl.filter(!col("seen"))
      .join(relab, col("l0") === col("old_l"), "left")
      .select(col("v"), coalesce(col("new_l"), col("l0")).as("l"))
    // existing rows whose component merged: one map-side-filterable
    // scan of the table against the bounded relabel map — the single
    // table-mass READ a fold pays (it must use CURRENT labels: a stale
    // delta row whose old label collides with another component's
    // current label would otherwise relabel across components)
    val changed =
      if (exists)
        cur.join(relab, cur("l") === col("old_l"))
          .select(cur("v"), col("new_l").as("l"))
      else newRows.limit(0)
    // new and changed are disjoint (unseen vs existing vertices), each
    // one row per v — the delta is pre-reduced
    MinMergeStats.fold(cat, table, newRows.unionByName(changed),
      Keys, Ord, batchReduced = true)
  }

  /** Merge the label table's delta log into one delta (see
    * [[MinMergeStats.compact]]) — call after an ingest drive so
    * query-time label consumers read the plain single-delta scan.
    */
  def compact(cat: Catalog, table: String): DataFrame =
    MinMergeStats.compact(cat, table, Keys, Ord)

  /** Takedown — retire the `retired` vertices (one column `v`) from
    * label table `table`. Strictly harder than [[MinMergeStats.rebuild]]'s
    * key-owner case: a vertex removal can SPLIT a component (the
    * retired doc may be the only bridge between two sub-clusters), so
    * affected components must be rebuilt from the surviving EDGES, not
    * from surviving occurrences of the same keys. The work is bounded
    * by the retired batch, never corpus mass:
    *
    *  - affected components = labels with >= 1 retired member (one
    *    semi-join against the batch);
    *  - rows of UNaffected components keep their labels verbatim — all
    *    their members survive, so each label is still the component's
    *    min vertex;
    *  - the surviving members of affected components are re-clustered
    *    over `edgesAmong(survivors)` — the caller supplies the edge
    *    recompute (e.g. the banded simhash pair join over exactly
    *    those members' signatures), and a defensive semi-join on both
    *    endpoints keeps the CC scoped even if the caller over-emits.
    *    A survivor left EDGE-LESS by the removal leaves the table:
    *    the label-table contract (set by fold, whose vertex set comes
    *    from edges) is one row per vertex with >= 1 near-dup edge —
    *    exactly what a from-scratch recompute over the survivors
    *    yields — and consumers left-join, reading absence as
    *    singleton/kept;
    *  - retired vertices appear in neither branch and drop out.
    *
    * The rewrite itself rides [[MinMergeStats.replaceAll]]'s staged
    * `_REBUILD` protocol: crash rolls back to the intact old table or
    * forward to the completed sweep. Exactness oracle: the o12b row's
    * closure SQL over the surviving docs alone — retire-then-read must
    * be bit-identical to a from-scratch recompute without the retired
    * batch.
    */
  def retire(cat: Catalog, table: String, retired: DataFrame,
             edgesAmong: DataFrame => DataFrame): DataFrame = {
    val s = cat.spark
    // materialized once: feeds the affected-label scan, the keep
    // filter, and the member expansion (three subtrees)
    val cur = graft.queries.Scratch.materialize(s, s"cc_retire_$table",
      MinMergeStats.view(cat, table, Keys, Ord))
    val ret = graft.queries.Scratch.materialize(s, s"cc_retired_$table",
      retired.select(col("v")).distinct())
    val affLabels = cur.join(ret, Seq("v"), "left_semi")
      .select(col("l")).distinct()
    val keep = cur.join(affLabels, Seq("l"), "left_anti")
    val survAff = graft.queries.Scratch.materialize(s,
      s"cc_survaff_$table",
      cur.join(affLabels, Seq("l"), "left_semi")
        .join(ret, Seq("v"), "left_anti")
        .select(col("v")))
    val edges = edgesAmong(survAff)
      .join(survAff.select(col("v").as("a")), Seq("a"), "left_semi")
      .join(survAff.select(col("v").as("b")), Seq("b"), "left_semi")
    // vertices with >= 1 surviving edge only — edge-less survivors of
    // a split component drop out of the table (see contract above)
    val rebuilt =
      graft.queries.DedupQueries.connectedComponents(s, edges)
    MinMergeStats.replaceAll(cat, table, keep.unionByName(rebuilt),
      Keys, Ord)
  }

  /** The maintained label table's merged reading, bound to `cat`'s own
    * files. Consumers must read THIS frame rather than the session
    * temp view of the same name — several warehouses in one session
    * (the o12 batch drive, the o12s stream drive, test catalogs) each
    * register `cc_labels`, and the global name points at whichever
    * wrote last.
    */
  def labels(cat: Catalog, table: String = "cc_labels"): DataFrame =
    MinMergeStats.view(cat, table, Keys, Ord)
}
