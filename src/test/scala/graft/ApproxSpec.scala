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

  test("x14 bloom semi-join: no false negatives — every exact match " +
      "passes the filter, and the pass census reconciles") {
    import org.apache.spark.sql.functions._
    val r = run("x14_bloom_semijoin").collect().head
    val (nProbe, nExact, nPass, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nPass >= nExact, "bloom dropped a true match (false negative)")
    assert(nFp === nPass - nExact)
    assert(nPass <= nProbe)
    // per-row structural check: recompute the exact match set and the
    // bloom pass set independently and assert containment
    val m = 65536L; val p = 1000000007L
    val as = Seq(1000003L, 2000003L, 3000019L)
    val bs = Seq(12345L, 67890L, 424242L)
    val cust = graft.engine.Graft.table(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val bits = cust.flatMap(k =>
      (0 until 3).map(j => ((k * as(j) + bs(j)) % p) % m))
    val orders = graft.engine.Graft.table(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exactSet = orders.filter(o => cust(o._2)).map(_._1).toSet
    val passSet = orders.filter { case (_, ck) =>
      (0 until 3).forall(j => bits(((ck * as(j) + bs(j)) % p) % m))
    }.map(_._1).toSet
    assert(exactSet.subsetOf(passSet), "containment violated")
    assert(passSet.size.toLong === nPass &&
      exactSet.size.toLong === nExact, "census mismatch vs the query")
  }

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
