package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The exact-vs-approx differential convention, promoted to a helper —
  * how a sketch/approximate operator becomes driver-visible next to
  * its exact twin (g12b percentiles, x2b HLL distinct, d2b MinHash
  * Jaccard):
  *
  *  - the frame carries the EXACT values (which the DuckDB oracle
  *    reproduces bit-for-bit) alongside a boolean per approximation
  *    asserting it lands within its published error envelope;
  *  - when the approximation is itself engine-portable (d2b's MinHash
  *    component matches — integer arithmetic both engines replicate),
  *    the estimate and its error are ALSO emitted and hash-checked;
  *    when it is engine-specific (a t-digest, an HLL register set),
  *    only the boolean crosses, stated as TRUE in the oracle — a
  *    sketch regression flips it and fails the driver's hash check.
  *
  * Future sketch operators built on these columns arrive
  * driver-visible by construction.
  */
object ApproxDiff {

  /** Relative-envelope check: |approx - exact| <= relTol * exact. */
  def okCol(exact: Column, approx: Column, relTol: Double): Column =
    abs(approx.cast("double") - exact.cast("double")) <=
      exact.cast("double") * relTol

  /** Absolute-envelope check: |approx - exact| <= absTol. */
  def okAbsCol(exact: Column, approx: Column, absTol: Double): Column =
    abs(approx.cast("double") - exact.cast("double")) <= absTol

  /** Oracle tail for engine-specific sketches: `TRUE AS <name>` per
    * flag, matching the Spark-side ok columns by position in a SELECT.
    */
  def okTrueSql(flags: Seq[String]): String =
    flags.map(f => s"TRUE AS $f").mkString(",\n  ")
}
