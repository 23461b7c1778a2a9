package graft

import graft.queries.Registry

/** The approximate scale-path variants must stay within their published
  * accuracy bounds of the exact twins they replace at 100 TB.
  */
class ApproxSpec extends SparkTestBase {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("g12b approx percentiles agree with exact g12 per event type") {
    val exact = run("g12_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = run("g12b_percentiles_approx").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      // accuracy 10000 => rank error <= n/10000; value tolerance loose
      // but catches a broken sketch (wrong column, wrong fraction).
      assert(math.abs(a50 - p50) <= math.max(1.0, math.abs(p50) * 0.05),
        s"$k p50: exact $p50 vs approx $a50")
      assert(math.abs(a90 - p90) <= math.max(1.0, math.abs(p90) * 0.05),
        s"$k p90: exact $p90 vs approx $a90")
    }
  }

  test("x2b approx distinct counts are within rsd of exact") {
    val exact = run("g3_global_multi_agg").collect().head
    val (nOrders, nParts, nSupp) =
      (exact.getLong(1), exact.getLong(2), exact.getLong(3))
    val a = run("x2b_approx_count_distinct").collect().head
    def check(approx: Long, ex: Long, name: String): Unit =
      assert(math.abs(approx - ex).toDouble / ex <= 0.1,
        s"$name: exact $ex vs approx $approx")
    check(a.getLong(0), nOrders, "orders")
    check(a.getLong(1), nParts, "parts")
    check(a.getLong(2), nSupp, "suppliers")
  }
}
