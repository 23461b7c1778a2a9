package graft

import graft.queries.{Registry, SimilarityQueries}

/** ANN behavior: the LSH-bucketed variant must agree with the exact
  * baseline wherever it reports a neighbor (same cosine, candidate in
  * the query's bucket), and buckets must be deterministic.
  */
class AnnSpec extends SparkTestBase {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("a2 cosines equal a1 cosines for the same (query, neighbor)") {
    val exact = run("a1_ann_bruteforce")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // a1 keeps top-10; recompute the full exact map for pairs a2 found
    // outside that cut by checking only overlapping keys.
    val approx = run("a2_ann_lsh_bucketed")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(approx.nonEmpty)
    approx.foreach { case (k, c) =>
      exact.get(k).foreach(e => assert(e === c, s"cosine mismatch for $k"))
    }
  }

  test("a3 IVF results agree with exact cosines and stay within probed cells") {
    val exact = run("a1_ann_bruteforce")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = run("a3_ann_ivf")
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (k, c) =>
      exact.get(k).foreach(e => assert(e === c, s"cosine mismatch for $k"))
    }
  }

  test("a2b multi-probe recall vs a1 top-5 is >= single-bucket a2") {
    def top5(name: String): Map[Long, Set[Long]] = run(name).collect()
      .filter(_.getLong(1) <= 5)
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top5("a1_ann_bruteforce")
    val a2 = top5("a2_ann_lsh_bucketed")
    val a2b = top5("a2b_ann_multiprobe")
    def hits(m: Map[Long, Set[Long]]): Int =
      exact.keys.toSeq.map(q =>
        m.getOrElse(q, Set.empty).intersect(exact(q)).size).sum
    assert(a2b.nonEmpty)
    // the probe set is a superset of the single bucket, so an exact-top5
    // member can only be displaced by another exact-top5 member — recall
    // is monotonically non-decreasing.
    assert(hits(a2b) >= hits(a2),
      s"multi-probe recall ${hits(a2b)} < single-bucket ${hits(a2)}")
    // and multi-probe cosines agree with the exact baseline on overlap
    val exactCos = run("a1_ann_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    run("a2b_ann_multiprobe").collect().foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(2)))
        .foreach(e => assert(e === r.getDouble(3)))
    }
  }

  test("a6 int8 quantization preserves most exact top-5 neighbors") {
    // int8 is near-lossless for cosine ranking: the quantized top-5
    // must recover a clear majority of the exact top-5 per query. The
    // bound is deliberately loose (quantization CAN reorder close
    // neighbors); the cross-engine exactness of the quantized pipeline
    // itself is the oracle's job, this guards the semantic claim that
    // quantized search is still SEARCH.
    def top5(name: String): Map[Long, Set[Long]] = run(name).collect()
      .filter(_.getLong(1) <= 5)
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top5("a1_ann_bruteforce")
    val quant = top5("a6_ann_quantized")
    assert(quant.nonEmpty)
    val (hit, total) = exact.keys.toSeq.map { q =>
      (quant.getOrElse(q, Set.empty).intersect(exact(q)).size, exact(q).size)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(hit.toDouble / total >= 0.6,
      s"quantized recall $hit/$total below 0.6 — quantization too lossy")
  }

  test("recall@5 vs exact at bench scale (sf0.1) clears per-variant floors") {
    // AnnSpec's other cases run at fixture scale (sf0.001); recall is a
    // corpus-size-dependent quantity, so the scale claim needs the
    // bench corpus. Measured values are recorded in SCALE.md — the
    // floors here are set below measurement to catch regressions, not
    // to restate it.
    val benchDir = "/root/testdata/sf0.1"
    def top5(name: String): Map[Long, Set[Long]] =
      Registry.all.find(_.name == name).get.run(spark, benchDir)
        .collect()
        .filter(_.getLong(1) <= 5)
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top5("a1_ann_bruteforce")
    assert(exact.nonEmpty)
    def recall(m: Map[Long, Set[Long]]): Double = {
      val (hit, tot) = exact.keys.toSeq.map(q =>
        (m.getOrElse(q, Set.empty).intersect(exact(q)).size, exact(q).size))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      hit.toDouble / tot
    }
    val measured = Seq(
      "a2_ann_lsh_bucketed" -> 0.2,
      "a2b_ann_multiprobe" -> 0.4,
      "a3_ann_ivf" -> 0.6,
      "a6_ann_quantized" -> 0.8,
      // a9 ranks by PQ-approximated squared L2 with untrained (first-16
      // donor) codebooks — the heaviest compression in the ladder (32x),
      // so its floor sits below the scalar-quantized arm's; measured
      // value recorded in SCALE.md
      "a9_pq_adc" -> 0.1,
      "a9b_pq_trained" -> 0.1,
      // IVFADC: 2-of-8 cell probing stacked on residual-PQ distortion
      // (measured 0.12 — the floor sits well under it like the others)
      "a9c_ivfadc" -> 0.05,
      // trained residual codebooks (one Lloyd round) on the same
      // composition — floor matches a9c's; the >= relation below is
      // the actual trained-vs-untrained guarantee
      "a9d_ivfadc_trained" -> 0.05).map { case (name, floor) =>
      val r = recall(top5(name))
      info(f"$name recall@5 at sf0.1 = $r%.3f (floor $floor)")
      assert(r >= floor, f"$name recall@5 $r%.3f below floor $floor")
      name -> r
    }.toMap
    // multi-probe must not lose recall vs its single-bucket base
    assert(measured("a2b_ann_multiprobe") >= measured("a2_ann_lsh_bucketed"))
    // codebook training is what buys PQ recall back: the trained arm
    // must not fall below the untrained donors
    assert(measured("a9b_pq_trained") >= measured("a9_pq_adc"),
      s"trained PQ recall ${measured("a9b_pq_trained")} < untrained ${measured("a9_pq_adc")}")
    // a9d vs a9c recall is NOT asserted: at 5 queries x top-5 the
    // difference is +-1-hit sampling noise (measured 0.08 vs 0.12 at
    // sf0.1 — one hit), and one Lloyd round guarantees distortion
    // descent, not per-query-set recall. The training guarantee that
    // IS a theorem has its own test below.
  }

  test("t19b indexed-fused top-5 recall vs the brute-fused t19 list " +
      "clears the a2 floor at bench scale") {
    // The dense-arm swap (brute cosine -> a2's LSH bucket) is the only
    // difference between t19 and t19b: the BM25 arm and the RRF fusion
    // are the same shared builders. So the fused lists agree wherever
    // the BM25 arm decides, and diverge only as far as the bucketed
    // dense arm's recall allows — the fused-vs-fused overlap cannot
    // sit below the single-bucket dense floor a2 clears on its own.
    val benchDir = "/root/testdata/sf0.1"
    def fusedTop(name: String): Map[Long, Set[Long]] =
      Registry.all.find(_.name == name).get.run(spark, benchDir)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val brute = fusedTop("t19_hybrid_rrf")
    val indexed = fusedTop("t19b_hybrid_rrf_indexed")
    assert(brute.nonEmpty)
    val (hit, tot) = brute.keys.toSeq.map(q =>
      (indexed.getOrElse(q, Set.empty).intersect(brute(q)).size,
        brute(q).size))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val r = hit.toDouble / tot
    info(f"t19b fused recall vs t19 at sf0.1 = $r%.3f (floor 0.2)")
    assert(r >= 0.2, f"indexed-fused recall $r%.3f below the a2 floor")
  }

  test("a12 probe sweep: candidates and recall are monotone in nprobe, " +
      "and probing every cell reaches recall 1.0") {
    val rows = Registry.all.find(_.name == "a12_ivf_probe_sweep").get
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      // >= not >: an incremental cell with no non-query vectors adds
      // zero candidates — a legitimate layout, not a bug (recall below
      // already uses >= for the same reason)
      assert(hi._2 >= lo._2,
        s"candidates shrank: nprobe ${lo._1}->${hi._1}")
      assert(hi._4 >= lo._4,
        s"recall decreased: nprobe ${lo._1}->${hi._1}")
      case _ => ()
    }
    // nprobe = k probes every cell = the exact scan over a partitioned
    // layout; anything below 1.0 here is a correctness bug, not recall
    assert(rows.last._4 === 1.0, s"full probe recall ${rows.last._4} != 1")
  }

  test("a9d residual-codebook training descends the k-means objective") {
    // Lloyd's theorem — assign-then-recenter never increases total
    // encode distortion — applied where a9d applies it: per-subspace
    // codebooks over coarse-cell RESIDUALS. This is the enforceable
    // trained-vs-untrained guarantee (recall on a 25-hit eval is
    // noise); strict descent is expected because the donors are raw
    // data points, not centroids.
    import graft.queries.SimilarityQueries._
    val e = Lloyd.corpus(spark, sfDir)
    val cents = Lloyd.init(e, 8)
    val rsubs = ivfadcRsubs(e, cents)
    val cb0 = pqDonors(rsubs, 16)
    val d0 = pqEncodeDistortion(rsubs, cb0)
    val d1 = pqEncodeDistortion(rsubs, pqTrainRound(rsubs, cb0))
    info(f"encode distortion: donors $d0%.3f -> trained $d1%.3f")
    assert(d1 < d0,
      f"one Lloyd round did not reduce encode distortion ($d0%.3f -> $d1%.3f)")
  }

  test("a7 recall report is internally consistent and bounded by a2's hits") {
    // a7's exact side must be a1's top-10 exactly; every a2 neighbor
    // (top-5 through the same bucket blocking) that lands in a1's
    // top-10 is necessarily in a7's intersection, so per query:
    // n_hit >= |a2-top5 ∩ a1-top10|, and the recall arithmetic must
    // reproduce n_hit / n_exact.
    val exact10 = run("a1_ann_bruteforce").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val a2hits = run("a2_ann_lsh_bucketed").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val report = run("a7_ann_recall").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    assert(report.nonEmpty && report.map(_._1).toSet === exact10.keySet)
    report.foreach { case (qid, (nExact, nRetr, nHit, recall)) =>
      assert(nExact === 10L && exact10(qid).size === 10)
      assert(nRetr <= 10L && nHit <= nRetr)
      assert(recall === nHit.toDouble / nExact)
      val floor = a2hits.getOrElse(qid, Set.empty)
        .intersect(exact10(qid)).size
      assert(nHit >= floor,
        s"query $qid: a7 n_hit=$nHit below a2-derived floor $floor")
    }
  }

  test("a5b (6-plane) changes candidacy, never scoring, and refines a5's buckets") {
    val a5 = run("a5_knn_join").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val a5b = run("a5b_knn_join_moreplanes").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(a5b.nonEmpty)
    // identical cosine wherever both variants report the same pair —
    // the plane count only restricts which pairs MEET
    a5b.foreach { case (k, c) =>
      a5.get(k).foreach(e => assert(e === c, s"cosine differs for $k"))
    }
    // refinement: a neighbor meets its query in the 6-plane join only
    // if they share the 6-bit signature, whose low 4 bits are the
    // 4-plane signature — so every a5b pair must share a 4-plane bucket
    val e4 = SimilarityQueries.withBucket(
      graft.engine.Graft.table(spark, sfDir, "embeddings"), "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    a5b.foreach { case ((q, v), _) =>
      assert(e4(q) === e4(v), s"pair ($q,$v) not in one 4-plane bucket")
    }
  }

  test("a5c adaptive planes: integer ladder exact at thresholds, and " +
      "at the test corpus the ladder reproduces a5 row-for-row") {
    import SimilarityQueries.adaptivePlanes
    // ladder boundaries: smallest p in [4,12] with n <= 60*2^p
    assert(adaptivePlanes(1L) === 4)
    assert(adaptivePlanes(500L) === 4)     // sf0.001/sf0.01 corpus
    assert(adaptivePlanes(960L) === 4)
    assert(adaptivePlanes(961L) === 5)
    assert(adaptivePlanes(2000L) === 6)    // sf0.1 corpus == a5b's rung
    assert(adaptivePlanes(20000L) === 9)   // 10x census corpus
    assert(adaptivePlanes(122880L) === 11)
    assert(adaptivePlanes(122881L) === 12)
    assert(adaptivePlanes(Long.MaxValue) === 12) // capped
    // at 500 rows the ladder picks 4 planes — a5c must BE a5, byte for
    // byte (same planes, same join, same window)
    val a5 = run("a5_knn_join").collect().toSeq
    val a5c = run("a5c_knn_join_adaptive").collect().toSeq
    assert(a5c === a5)
  }

  test("a8b (6-plane) hard negatives: candidacy-only dial, label " +
      "mismatch preserved") {
    val a8 = run("a8_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
    val a8b = run("a8b_hard_negatives_moreplanes").collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3), r.getDouble(4)))
    assert(a8b.nonEmpty)
    // identical cosine wherever both variants report the same pair
    a8b.foreach { case (k, _, c) =>
      a8.get(k).foreach(e => assert(e === c, s"cosine differs for $k"))
    }
    // the label-mismatch predicate survives the dial: no reported
    // negative carries its query's label
    val labels = graft.engine.Graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    a8b.foreach { case ((q, v), negLabel, _) =>
      assert((labels(v) === negLabel) && (negLabel !== labels(q)),
        s"pair ($q,$v) label contract violated")
    }
  }

  test("a8c adaptive hard negatives: at the test corpus the ladder " +
      "reproduces a8 row-for-row") {
    // 500 rows -> the ladder picks a8's 4 planes, so a8c must BE a8,
    // byte for byte (same planes, same label-mismatch join, same window)
    val a8 = run("a8_hard_negatives").collect().toSeq
    val a8c = run("a8c_hard_negatives_adaptive").collect().toSeq
    assert(a8c === a8)
  }

  test("a11 truncated-dim recall: full retrieval set, exact arithmetic, " +
      "and a replica of the truncated ranking reproduces its hits") {
    val report = run("a11_mrl_recall").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    assert(report.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L))
    report.foreach { case (qid, (nExact, nRetr, nHit, recall)) =>
      // truncated scoring still ranks EVERY candidate (no blocking), so
      // the retrieved set is always full — any shortfall means the
      // truncation dropped candidates instead of information
      assert(nExact === 10L && nRetr === 10L, s"query $qid retrieval")
      assert(nHit <= nRetr)
      assert(recall === nHit.toDouble / nExact)
    }
    // independent replica: score the first-16-dim cosine in Scala over
    // the raw vectors and reproduce each query's hit count
    val vecs = graft.engine.Graft.table(spark, sfDir, "embeddings")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(16).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact10 = run("a1_ann_bruteforce").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    report.foreach { case (qid, (_, _, nHit, _)) =>
      val top10 = vecs.keys.filter(_ != qid).toSeq
        .map(v => (v, cos(vecs(qid), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10).map(_._1).toSet
      assert(top10.intersect(exact10(qid)).size === nHit,
        s"query $qid: replica hit count differs")
    }
  }

  test("asofJoin picks the latest at-or-before value per key") {
    import spark.implicits._
    val left = Seq((1, "a", 5), (2, "a", 10), (3, "b", 7), (4, "a", 2))
      .toDF("id", "k", "t")
    val right = Seq(("a", 3, 30.0), ("a", 10, 100.0), ("b", 8, 80.0))
      .toDF("k", "t", "v")
    val got = graft.engine.Functions
      .asofJoin(left, right, Seq("k"), "t", "v", "v")
      .orderBy("id").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (1, Some(30.0)),   // t=5 → latest a-rate at 3
      (2, Some(100.0)),  // t=10 → same-instant rate visible (>=)
      (3, None),         // t=7 → b-rate only at 8, nothing before
      (4, None)))        // t=2 → before first a-rate
  }

  test("a4 Lloyd step partitions the corpus: populations sum to N") {
    val e = graft.engine.Graft.table(spark, sfDir, "embeddings")
    val out = graft.queries.Registry.all.find(_.name == "a4_ivf_train").get
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every vector lands in exactly one cell; cells are drawn from the
    // k=8 init ids; inertia is finite and non-negative
    assert(out.map(_._2).sum === e.count())
    assert(out.map(_._1).forall(c => c >= 0 && c < 8))
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall(r => r._3 >= 0.0 && !r._3.isNaN))
  }

  test("a4b iterated Lloyd: iter-2 rows reproduce a4, inertia descends") {
    val a4 = run("a4_ivf_train").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rows = run("a4b_ivf_train_iters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // a4's reported step IS iteration 2 of the loop — same assignment,
    // same populations, bit-identical inertia
    val it2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSet
    assert(it2 === a4)
    // Lloyd's guarantee: total inertia never increases between rounds.
    // Tolerance scales with the DECIMAL(38,6) quantum dsum rounds each
    // per-row d2 to (±0.5e-6 per row, two sums compared), NOT a fixed
    // epsilon: near convergence the true descent can be smaller than
    // the accumulated rounding.
    val nTotal = rows.filter(_._1 == 1L).map(_._3).sum
    val tol = nTotal * 1e-6
    val totals = rows.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toSeq.sortBy(_._1).map(_._2)
    assert(totals.length === 3)
    totals.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + tol, s"inertia rose: $a -> $b (tol $tol)")
    }
  }

  test("bucket signatures are deterministic across evaluations") {
    val e = graft.engine.Graft.table(spark, sfDir, "embeddings")
    val b1 = SimilarityQueries.withBucket(e, "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = SimilarityQueries.withBucket(e, "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 === b2)
    assert(b1.values.toSet.subsetOf((0 until (1 << SimilarityQueries.NPlanes)).toSet))
  }
}
