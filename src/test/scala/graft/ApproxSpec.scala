package graft

import graft.queries.Registry

/** The approximate scale-path variants must stay within their published
  * accuracy bounds of the exact twins they replace at 100 TB. Since
  * round 9 the bound check is computed IN the queries themselves (the
  * `*_ok` differential booleans the driver oracle asserts are TRUE);
  * this spec pins the frame's contract — exact columns match the exact
  * twins bit-for-bit, and every differential boolean holds.
  */
class ApproxSpec extends SparkTestBase {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("g12b carries g12's exact percentiles plus in-bound sketch booleans") {
    val exact = run("g12_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val diff = run("g12b_percentiles_approx").collect()
    assert(diff.map(_.getString(0)).toSet === exact.keySet)
    diff.foreach { r =>
      val (p50, p90, n) = exact(r.getString(0))
      // the exact columns are the SAME formulation as g12 — bit equality
      assert(r.getDouble(1) == p50 && r.getDouble(2) == p90 &&
        r.getLong(3) == n, s"${r.getString(0)}: exact columns drifted from g12")
      assert(r.getBoolean(4), s"${r.getString(0)} p50 sketch out of rank bound")
      assert(r.getBoolean(5), s"${r.getString(0)} p90 sketch out of rank bound")
    }
  }

  test("x2b carries exact distinct counts plus in-rsd sketch booleans") {
    val g3 = run("g3_global_multi_agg").collect().head
    val a = run("x2b_approx_count_distinct").collect().head
    assert(a.getLong(0) == g3.getLong(1), "n_orders drifted from g3's exact")
    assert(a.getLong(1) == g3.getLong(2), "n_parts drifted from g3's exact")
    assert(a.getLong(2) == g3.getLong(3), "n_suppliers drifted from g3's exact")
    Seq("orders_ok" -> 3, "parts_ok" -> 4, "suppliers_ok" -> 5).foreach {
      case (name, i) => assert(a.getBoolean(i), s"$name: HLL++ out of 3*rsd")
    }
  }
}
