package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.{CurationQueries, TextQueries}

/** Planted fixtures for the round-9 operators: t12 (BPE pair counts),
  * c7 (temperature-flattened mixture), c8 (deterministic epoch
  * shuffle), t13 (hashed linear quality scorer), d11 (SemDeDup
  * cluster-scoped semantic dedup). Each expectation is hand-computed
  * (t12/d11) or derived from a Scala replica of the cross-engine
  * base-31 fold (c7/c8/t13) — so the tests pin the SEMANTICS,
  * independently of the DuckDB oracle the driver also checks.
  */
class MixtureSpec extends SparkTestBase {

  /** Scala replica of graft_strhash (base-31 fold mod 1e9+7; ASCII
    * fixture, so chars == bytes == DuckDB's ascii()).
    */
  private def poly(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_mixturespec").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t12 counts pairs weighted by word frequency, deterministic rank") {
    // vocab: low x3, lower x1, lowest x1; "x9" and "a" and "!!" are
    // filtered by the letters-only >=2-char pre-tokenizer.
    val dir = writeDocs(Seq(
      (0L, "en", "s1", "low low lower x9 a"),
      (1L, "en", "s1", "lowest low !!")))
    val q = TextQueries.all.find(_.name == "t12_bpe_pairs").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // lo: 3+1+1=5, ow: 5, we: lower+lowest=2, then er/es/st x1 (alpha)
    assert(got.toSeq === Seq(
      (1L, "lo", 5L), (2L, "ow", 5L), (3L, "we", 2L),
      (4L, "er", 1L), (5L, "es", 1L), (6L, "st", 1L)))
  }

  test("c7 computes sqrt-flattened rates and keeps exactly the under-rate hashes") {
    // s1: 4 docs (n_max) -> rate 100000 (everything kept, h < 1e5 always);
    // s2: 1 doc -> rate floor(sqrt(1/4)*1e5) = 50000, kept iff its hash
    // lands under — computed here via the fold replica, not assumed.
    val rows = Seq(
      (0L, "en", "s1", "a b c"), (1L, "en", "s1", "d e"),
      (2L, "en", "s1", "f"), (3L, "en", "s1", "g h i j"),
      (4L, "en", "s2", "k l m"))
    val dir = writeDocs(rows)
    val q = CurationQueries.all.find(_.name == "c7_temperature_mixture").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val s2Kept = if (poly("4:s2:temp") % 100000 < 50000) 1L else 0L
    val s2Tokens = if (s2Kept == 1L) 3L else 0L
    assert(got.toSeq === Seq(
      ("s1", 4L, 100000L, 4L, 10L),
      ("s2", 1L, 50000L, s2Kept, s2Tokens)))
  }

  test("release mixture rates keep the largest source at exactly 100%") {
    // The max-source boundary contract (CorpusRelease.mixtureRates):
    // floor(sqrt(n_max/n_max) * 1e5) = 100000 EXACTLY, and the release's
    // keep test is mh < rate_1e5 over mh = pmod(..., 100000) in
    // [0, 99999] — so every max-source doc passes, structurally.
    // Flattening downsamples only sources smaller than the head; a
    // future tweak (<=, scale constant, rounding) that shifts the
    // boundary must fail here, not silently change release contents.
    import spark.implicits._
    val counts = Seq(("head", 400L), ("mid", 100L), ("tail", 1L))
      .toDF("source", "n_total")
    val rates = graft.pipeline.CorpusRelease.mixtureRates(counts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("head") === 100000L)
    // strict keep test is total for the max source: max possible mh is
    // 99999 < 100000
    assert(99999L < rates("head"))
    // and smaller sources get the exact floored sqrt ratio
    assert(rates("mid") === math.floor(math.sqrt(100.0 / 400.0) * 1e5).toLong)
    assert(rates("tail") === math.floor(math.sqrt(1.0 / 400.0) * 1e5).toLong)
  }

  test("c8 assigns the fold-replica permutation (shards, counts, order witness)") {
    val rows = (0L until 40L).map(i =>
      (i, "en", "s1", s"word$i text here"))
    val dir = writeDocs(rows)
    val q = CurationQueries.all.find(_.name == "c8_corpus_shuffle").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))

    // expected permutation from the fold replica
    val hashed = rows.map { case (id, _, _, _) => (id, poly(s"$id:epoch1")) }
    val expected = hashed.groupBy(_._2 % 8).toSeq.sortBy(_._1).map {
      case (shard, docs) =>
        val inOrder = docs.sortBy { case (id, h) => (h, id) }
        val witness = inOrder.zipWithIndex
          .map { case ((id, _), i) => id * (i + 1) }.sum
        (shard, docs.size.toLong, inOrder.map(_._2).max, witness)
    }
    assert(got.toSeq === expected)
    assert(got.map(_._2).sum === 40L) // partition of the corpus
  }

  test("t13 scores docs by the fold-replica integer weight sum") {
    val rows = Seq(
      (0L, "en", "s1", "alpha beta gamma"),
      (1L, "en", "s1", "delta epsilon"),
      (2L, "de", "s2", "zeta eta theta iota"))
    val dir = writeDocs(rows)
    val q = TextQueries.all.find(_.name == "t13_model_quality").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

    // replica: x1000 integer numerator of the mean token weight
    // (mean >= 0 iff wsum >= 0); witness = sum of kept wsums / 1000
    def wsum(text: String): Long =
      text.trim.split("\\s+").foldLeft(0L)((acc, tok) =>
        acc + (poly(tok) % 2001) - 1000L)
    val expected = rows.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (lang, docs) =>
        val kept = docs.filter(dc => wsum(dc._4) >= 0L)
        (lang, docs.size.toLong, kept.size.toLong, kept.map(_._1).sum,
          kept.map(dc => wsum(dc._4)).sum.toDouble / 1000.0)
    }
    assert(got.toSeq === expected)
  }

  test("t14 buckets docs by the integer bigram-weight threshold test") {
    val rows = Seq(
      (0L, "en", "s1", "alpha beta gamma delta"),
      (1L, "en", "s1", "epsilon zeta"),
      (2L, "de", "s2", "eta theta iota kappa lambda"),
      (3L, "de", "s2", "single"))  // < 2 tokens: excluded
    val dir = writeDocs(rows)
    val q = TextQueries.all.find(_.name == "t14_perplexity_buckets").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))

    // replica: per-doc integer bigram-weight sum + cross-multiplied
    // threshold test at +-300 per bigram
    def sNum(text: String): Long = {
      val tk = text.trim.split("\\s+")
      (0 until tk.length - 1).foldLeft(0L)((acc, i) =>
        acc + (poly(tk(i) + ":" + tk(i + 1)) % 2001) - 1000L)
    }
    def bucket(s: Long, nb: Long): String =
      if (s < -300L * nb) "head" else if (s < 300L * nb) "middle" else "tail"
    val expected = rows.filter(_._4.trim.split("\\s+").length >= 2)
      .map { case (id, lang, _, text) =>
        val nb = text.trim.split("\\s+").length - 1L
        (lang, bucket(sNum(text), nb), id, nb + 1L, sNum(text))
      }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((lang, b), docs) =>
        (lang, b, docs.size.toLong, docs.map(_._4).sum, docs.map(_._3).sum,
          docs.map(_._5).sum.toDouble / 1000.0)
      }
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
  }

  test("c9 allocates the sqrt-weighted budget with a sorted-fold normalizer") {
    val rows = Seq(
      (0L, "en", "big", (1 to 400).map(i => s"w$i").mkString(" ")),
      (1L, "en", "mid", (1 to 100).map(i => s"w$i").mkString(" ")),
      (2L, "en", "tiny", "just four little tokens"))
    val dir = writeDocs(rows)
    val q = CurationQueries.all.find(_.name == "c9_token_budget").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))

    // replica: same IEEE op sequence — sqrt per source, Z folded in
    // source-name order, weight = sqrt/Z, target = floor(1e7 * w)
    val toks = Map("big" -> 400L, "mid" -> 100L, "tiny" -> 4L)
    val z = toks.keys.toSeq.sorted
      .foldLeft(0.0)((acc, s) => acc + math.sqrt(toks(s).toDouble))
    val expected = toks.toSeq.sortBy(_._1).map { case (src, n) =>
      val w = math.sqrt(n.toDouble) / z
      val target = math.floor(1.0e7 * w).toLong
      (src, 1L, n, w, target, target.toDouble / n.toDouble)
    }
    assert(got.toSeq === expected)
    // sanity: weights sum to ~1 and the big source dominates
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    assert(got.maxBy(_._4)._1 === "big")
  }

  test("d11 drops within-cluster near-dups and keeps the angularly-far member") {
    // 8 basis centroids (vec 0-7); vec 8 duplicates e0 (cluster 0,
    // cos 1 -> dropped), vec 9 = 2*e1 (cluster 1, cos 1 -> dropped),
    // vec 10 is L2-closest to c0 but angularly far (cos 0.125 < 0.35
    // vs both cluster-0 mates) -> kept.
    val dim = 8
    val vecs: Seq[(Long, Seq[Float])] =
      (0 until dim).map(i =>
        (i.toLong, Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f))) ++
      Seq(
        (8L, Seq.tabulate(dim)(j => if (j == 0) 1.0f else 0.0f)),
        (9L, Seq.tabulate(dim)(j => if (j == 1) 2.0f else 0.0f)),
        (10L, Seq.tabulate(dim)(j => if (j == 0) 0.1f else -0.3f)))
    val dir = Files.createTempDirectory("graft_semdedup").toString
    spark.createDataFrame(vecs.map { case (id, v) => (id, v, 0) })
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val q = graft.queries.DedupQueries.all
      .find(_.name == "d11_semantic_dedup").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      (0L, 3L, 1L, 8L), (1L, 2L, 1L, 9L)) ++
      (2 until dim).map(i => (i.toLong, 1L, 0L, 0L))
    assert(got.toSeq === expected)
  }

  test("d11b trained cells stay bounded when the corpus doubles at doubled k") {
    // SemDeDup's cost model: k grows with the corpus at a target cell
    // population, so the within-cell quadratic scan stays O(corpus x
    // cell), never global. Exercise it: double the corpus (each vector
    // plus a deterministically jittered near-copy, interleaved ids so
    // first-k init draws from both halves) and double k. The mean cell
    // population must stay EXACTLY fixed (2n/2k = n/k), and the
    // quadratic pair-scan cost sum(pop^2) must scale like the corpus
    // (x2-ish), not like fixed-k (x4) — the trend guard that the dial
    // actually works.
    val base = graft.queries.DedupQueries
      .semanticDedupTrained(spark, sfDir, 8, 2)
      .collect().map(r => r.getLong(1))
    val src = graft.engine.Graft.table(spark, sfDir, "embeddings")
    val a = src.select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    val b = src.select((col("vec_id") * 2 + 1).as("vec_id"),
      expr("transform(embedding, (x, i) -> cast(x + 0.01 * " +
        "(pmod(vec_id * 31 + i, 7) - 3) as float))").as("embedding"))
    val dir = Files.createTempDirectory("graft_d11b_double").toString
    a.unionByName(b).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val doubled = graft.queries.DedupQueries
      .semanticDedupTrained(spark, dir, 16, 2)
      .collect().map(r => r.getLong(1))

    assert(doubled.sum == 2 * base.sum, "corpus did not double")
    assert(doubled.length == 2 * base.length, "cell count did not double")
    // mean population identical by construction; the distributional
    // guards: max cell and quadratic cost stay within the linear-scale
    // envelope (2x, with headroom for re-clustered boundaries).
    val (maxB, maxD) = (base.max, doubled.max)
    val (sqB, sqD) = (base.map(p => p * p).sum, doubled.map(p => p * p).sum)
    info(s"base pops=${base.toSeq.sorted.reverse} sumSq=$sqB")
    info(s"doubled pops=${doubled.toSeq.sorted.reverse} sumSq=$sqD")
    assert(maxD <= 2 * maxB,
      s"max cell grew superlinearly: $maxD > 2*$maxB")
    assert(sqD <= 3 * sqB,
      s"quadratic scan cost grew toward fixed-k blowup: $sqD > 3*$sqB")
  }

  test("d11c reports a planted mega-cluster's known population") {
    // the observable 're-train with larger k' signal: 8 basis
    // centroids (vec 0-7), then 12 near-copies of e0 (ids 8-19) — the
    // planted mega-cluster. Cell 0 holds {0, 8..19} = 13 vectors, the
    // other 7 cells hold their centroid only. Expected stats row:
    // n_clusters=8, n_vecs=20, max_pop=13, p99_pop (ceil(0.99*8)=8th
    // smallest of [1,1,1,1,1,1,1,13]) = 13, n_over_2x_avg (pop*8 >
    // 2*20 ⇔ pop > 5) = 1.
    val dim = 8
    val vecs: Seq[(Long, Seq[Float])] =
      (0 until dim).map(i =>
        (i.toLong, Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f))) ++
      (8 until 20).map(i =>
        (i.toLong, Seq.tabulate(dim)(j =>
          if (j == 0) 1.0f else if (j == i % dim) 0.01f * (i - 7) else 0.0f)))
    val dir = Files.createTempDirectory("graft_d11c").toString
    spark.createDataFrame(vecs.map { case (id, v) => (id, v, 0) })
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.DedupQueries.all
      .find(_.name == "d11c_semantic_cluster_stats").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq((8L, 8L, 20L, 13L, 13L, 1L)))
  }
}
