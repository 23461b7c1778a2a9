package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** a10's sufficient-statistics contract, end to end: the cluster ships
  * only (i, j, n, sum_prod, sum_i, sum_j); the d x d eigenproblem is
  * solved outside the data path. Power iteration on the covariance
  * assembled FROM THE QUERY OUTPUT must recover a planted principal
  * direction — proving the statistics are the right ones, not just
  * hash-stable.
  */
class PcaSpec extends SparkTestBase {

  private val Dims = 16

  /** 400 planted vectors: strong variance along `u` (alternating unit
    * direction), small deterministic jitter elsewhere. No RNG — the
    * coefficients are fixed integer-derived values so the fixture is
    * bit-stable across runs.
    */
  private def planted() = {
    val u = Array.tabulate(Dims)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val unorm = math.sqrt(Dims).toFloat
    val rows = (0 until 400).map { n =>
      val a = ((n * 37 % 101) - 50) / 50.0f // in [-0.5, 0.5], dominant
      val emb = Array.tabulate(Dims) { i =>
        val jitter = (((n * 13 + i * 7) % 23) - 11) / 1100.0f // ~[-0.01, 0.01]
        a * u(i) / unorm + jitter
      }
      Row(n.toLong, emb.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("power iteration on a10's gram stats recovers the planted direction") {
    val stats = SimilarityQueries.gramStats(planted()).collect()
    assert(stats.length == Dims * (Dims + 1) / 2)
    val n = stats.head.getLong(2).toDouble
    // Covariance from sufficient statistics (1e-6 quantization grid):
    // cov(i,j) = (sum_prod - sum_i * sum_j / n) / n, rescaled by 1e-12.
    val cov = Array.ofDim[Double](Dims, Dims)
    stats.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val sp = r.getDouble(3)
      val si = r.getDouble(4)
      val sj = r.getDouble(5)
      val c = (sp - si * sj / n) / n * 1e-12
      cov(i)(j) = c
      cov(j)(i) = c
    }
    var v = Array.fill(Dims)(1.0)
    for (_ <- 1 to 60) {
      val w = Array.tabulate(Dims)(i =>
        (0 until Dims).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val u = Array.tabulate(Dims)(i =>
      (if (i % 2 == 0) 1.0 else -1.0) / math.sqrt(Dims))
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"principal direction not recovered: |cos|=$cos")
  }

  test("gram stats are additive across batches — the O(batch) incremental " +
      "maintenance contract") {
    // Because every a10 statistic is an exact sum over quantized int64
    // values (DECIMAL accumulation, integer-valued-DOUBLE output well
    // under 2^53), stats(A ∪ B) MUST equal the elementwise sum of
    // stats(A) and stats(B) — so at 100 TB a new embedding batch folds
    // into the persisted Gram/PCA statistics by pure addition (one
    // O(batch) pass), never a corpus recompute. Floats summed in
    // engine-chosen order could not make this promise; these doubles
    // can because every value is an exact integer.
    val all = planted()
    val a = all.filter("vec_id < 250")
    val b = all.filter("vec_id >= 250")
    def stats(df: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.gramStats(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
    val (sa, sb, su) = (stats(a), stats(b), stats(all))
    assert(su.keySet === sa.keySet && su.keySet === sb.keySet)
    su.foreach { case (ij, (n, sp, si, sj)) =>
      val (na, spa, sia, sja) = sa(ij)
      val (nb, spb, sib, sjb) = sb(ij)
      assert(n === na + nb, s"$ij n_vecs")
      assert(sp === spa + spb, s"$ij sum_prod")
      assert(si === sia + sib, s"$ij sum_i")
      assert(sj === sja + sjb, s"$ij sum_j")
    }
  }

  test("IncrementalGram drives are isolated across warehouses in one session") {
    // Regression guard for the cross-run hazard the pipeline documents:
    // table existence must come from WAREHOUSE state, not the session
    // temp-view list — a second drive (bench repeat runs) registers the
    // same view name for its own fresh warehouse, and a temp-view
    // existence check would fold the first drive's corpus into the
    // second's statistics.
    import graft.pipeline.IncrementalGram
    import graft.queries.Scratch
    val all = planted()
    val (a, b) = (all.filter("vec_id < 250"), all.filter("vec_id >= 250"))
    def drive(): Map[(Long, Long), (Long, Double)] = {
      val cat = new graft.engine.Catalog(spark,
        Scratch.fresh(spark, "pca_wh"))
      IncrementalGram.ingest(cat, a, "gram_stats")
      IncrementalGram.ingest(cat, b, "gram_stats")
      cat.table("gram_stats").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    }
    val first = drive()
    val second = drive()
    assert(first === second,
      "second drive differs — stale state leaked across warehouses")
    // and the merged result equals the one-shot computation
    val oneShot = SimilarityQueries.gramStats(all).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(first === oneShot, "incremental merge != full recompute")
  }

  test("mapPartitions gram path == declarative gram path, row for row") {
    // a10's registered builder accumulates into per-partition primitive
    // arrays; the declarative expansion is kept as the cross-check.
    // Both are exact integer arithmetic over the same quantized values,
    // so equality must be bitwise — any drift means one path's
    // arithmetic (or its output types) changed.
    val all = planted()
    val fast = SimilarityQueries.gramStats(all).collect().toSeq
    val decl = SimilarityQueries.gramStatsDeclarative(all).collect().toSeq
    assert(fast === decl)
  }

  test("retire(ingest(B)) is the identity — the takedown path") {
    import graft.pipeline.IncrementalGram
    import graft.queries.Scratch
    val all = planted()
    val (a, b) = (all.filter("vec_id < 250"), all.filter("vec_id >= 250"))
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val cat = new graft.engine.Catalog(spark, Scratch.fresh(spark, "ret_wh"))
    val afterA = snap(IncrementalGram.ingest(cat, a, "gram_stats"))
    IncrementalGram.ingest(cat, b, "gram_stats")
    val afterRetire = snap(IncrementalGram.retire(cat, b, "gram_stats"))
    assert(afterRetire === afterA,
      "retiring batch B did not restore the pre-B statistics exactly")
  }
}
