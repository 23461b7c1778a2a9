package graft

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Functions

/** Property-based checks: ScalaCheck generates adversarial inputs, a
  * driver-side reference implementation supplies ground truth, and one
  * batched Spark job per property compares every sample (per-sample
  * Spark jobs would be prohibitively slow).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  test("invariant: table checksum is partitioning- and order-independent") {
    // The checksum's whole value is that two clusters can scan the same
    // rows in ANY order/layout and get the same two numbers. The exact
    // DECIMAL accumulation makes this true; a refactor to a double sum
    // would still be commutative in theory but ulp-unstable in practice
    // — this guard would catch it.
    import graft.engine.Checksum
    val li = graft.engine.Graft.table(spark, sfDir, "lineitem")
    val cols = Seq("l_orderkey" -> Checksum.IntLike,
      "l_returnflag" -> Checksum.Str, "l_shipdate" -> Checksum.TsDay)
    val base = Checksum.of(li, cols).head()
    Seq(li.repartition(17), li.coalesce(1),
        li.orderBy(org.apache.spark.sql.functions.col("l_shipdate").desc))
      .foreach { variant =>
        val v = Checksum.of(variant, cols).head()
        assert(v.getLong(0) == base.getLong(0))
        assert(v.getDouble(1) == base.getDouble(1),
          "checksum changed under a pure re-layout")
      }
  }

  test("invariant: c10 weighted sample == driver-side reference sampler") {
    // Independent reimplementation of the whole operator (integer
    // Efraimidis-Spirakis): weights from the same length tier, replica
    // hashes via the driver-side StringPolyHash fold, min per doc,
    // k smallest by (key, doc_id). Catches a drifted weight tier,
    // replica-string format, or tie-break — anything the distributed
    // plan could get subtly wrong while still returning 25 rows.
    val docs = graft.engine.Graft.table(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (id, nChars) =>
      val w = 1L + math.min(4L, nChars / 200)
      val key = (1L to w).map { i =>
        graft.engine.StringPolyHash.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:$i"), 31L)
      }.min
      (id, w, key)
    }.sortBy { case (id, _, key) => (key, id) }.take(25).toSeq
    val got = graft.queries.Registry.all
      .find(_.name == "c10_weighted_sample").get.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // and the monotonicity that makes weighting sound: an extra replica
    // can only lower (improve) a doc's key — min over a superset
    docs.take(50).foreach { case (id, nChars) =>
      val w = 1L + math.min(4L, nChars / 200)
      def keyAt(wx: Long) = (1L to wx).map { i =>
        graft.engine.StringPolyHash.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:$i"), 31L)
      }.min
      assert(keyAt(w + 1) <= keyAt(w))
    }
  }

  test("property: int8 quantization error is bounded by scale/2 per element") {
    // a6's quantizer contract: q = floor(x/scale + 0.5) reconstructs to
    // within half a quantization step for every element (scale =
    // greatest(max|x|/127, 1e-30) per vector — the epsilon floor keeps
    // an all-zero vector from producing NaN) — the bound that makes
    // int8 cosine a faithful ranking proxy. An injected all-zero
    // vector exercises the degenerate path the fixture corpus avoids.
    val corpus = graft.engine.Graft.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "embedding")
    val dim = corpus.selectExpr("size(embedding) AS d").head().getInt(0)
    val zero = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS vec_id, " +
        s"array_repeat(CAST(0.0 AS FLOAT), $dim) AS embedding")
    val rows = corpus.unionByName(zero)
      .selectExpr("vec_id", "embedding",
        "greatest(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE)))) / 127.0, " +
          "1e-30) AS scale",
        "transform(embedding, x -> CAST(floor(" +
          "CAST(x AS DOUBLE) / greatest(aggregate(embedding, " +
          "CAST(0.0 AS DOUBLE), " +
          "(acc, x2) -> greatest(acc, abs(CAST(x2 AS DOUBLE)))) / 127.0, " +
          "1e-30) + 0.5) AS BIGINT)) AS q")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Long](3)
      emb.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x.toDouble - qi * scale) <= scale / 2 + 1e-9,
          s"vec ${r.getLong(0)}: |$x - $qi*$scale| exceeds scale/2")
      }
    }
    // the all-zero vector quantizes to exactly zeros, not NaN-cast junk
    val zq = rows.find(_.getLong(0) == -1L).get.getSeq[Long](3)
    assert(zq.forall(_ == 0L), s"all-zero vector must quantize to zeros: $zq")
  }

  test("property: graft_strhash equals the reference fold on random strings") {
    val gen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    val strs = samples(gen, 300)
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val got = strs.toDF("s")
      .withColumn("h", expr("graft_strhash(s)"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (s, h) => assert(h === ref(s), s"input '$s'") }
  }

  test("property: graft_nfc equals the JDK Normalizer on adversarial " +
      "unicode strings") {
    // Mix base letters, combining marks (acute/diaeresis/cedilla/
    // grave), precomposed characters, and the Angstrom sign U+212B
    // (an NFC singleton that recomposes to U+00C5) — the shapes that
    // distinguish a real normalizer from a pass-through.
    val gen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.choose(32.toChar, 126.toChar),
        2 -> Gen.oneOf('e', 'a', 'c', 'o', 'u', 'A'),
        2 -> Gen.oneOf('\u0301', '\u0308', '\u0327', '\u0300'),
        1 -> Gen.oneOf('\u00e9', '\u00e4', '\u00c5', '\u212b')))
        .map(_.mkString))
    val strs = samples(gen, 300)
    val got = strs.toDF("s")
      .withColumn("n", expr("graft_nfc(s)"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (s, n) =>
      assert(n === java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC),
        s"input codepoints ${s.map(_.toInt.toHexString).mkString(",")}")
    }
  }

  test("property: calendar shims match java.time on random dates") {
    // ±100 years around the epoch, covering pre-1970 and leap years
    val gen = Gen.chooseNum(-36500L, 36500L)
    val days = samples(gen, 400).distinct
    val df = days.map(d => java.sql.Date.valueOf(LocalDate.ofEpochDay(d)))
      .toDF("date")
      .select($"date",
        Functions.dowSun0($"date").as("dow"),
        Functions.isWeekend($"date").as("wknd"),
        Functions.isoYear($"date").cast("int").as("iy"),
        Functions.isoWeek($"date").cast("int").as("iw"))
      .collect()
    df.foreach { r =>
      val ld = r.getDate(0).toLocalDate
      val expectedDow = ld.getDayOfWeek.getValue % 7 // ISO Mon=1..Sun=7 → Sun=0
      assert(r.getInt(1) === expectedDow, s"dow $ld")
      assert(r.getBoolean(2) === (ld.getDayOfWeek == DayOfWeek.SATURDAY ||
        ld.getDayOfWeek == DayOfWeek.SUNDAY), s"weekend $ld")
      val wf = java.time.temporal.IsoFields.WEEK_BASED_YEAR
      assert(r.getInt(3) === ld.get(wf), s"isoYear $ld")
      assert(r.getInt(4) ===
        ld.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR),
        s"isoWeek $ld")
    }
  }

  test("property: asofJoin equals the naive latest-at-or-before lookup") {
    val leftGen = for {
      key <- Gen.chooseNum(0, 3)
      tm <- Gen.chooseNum(0, 50)
    } yield (key, tm)
    val rightGen = for {
      key <- Gen.chooseNum(0, 3)
      tm <- Gen.chooseNum(0, 50)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (key, tm, v)
    val lRows = samples(leftGen, 120).distinct.zipWithIndex
      .map { case ((k, tm), id) => (id.toLong, k, tm) }
    val rRows = samples(rightGen, 80)
    val left = lRows.toDF("id", "k", "t")
    val right = rRows.toDF("k", "t", "v")
    val got = graft.engine.Functions
      .asofJoin(left, right, Seq("k"), "t", "v", "ref")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // naive reference: latest right value at-or-before; ties on (k, t)
    // resolve to the LARGEST value (the documented determinism rule)
    lRows.foreach { case (id, k, tm) =>
      val candidates = rRows.filter(r => r._1 == k && r._2 <= tm)
      val expected =
        if (candidates.isEmpty) None
        else {
          val maxT = candidates.map(_._2).max
          Some(candidates.filter(_._2 == maxT).map(_._3).max)
        }
      assert(got(id) === expected, s"row id=$id k=$k t=$tm")
    }
  }

  test("invariant: sequence packing conserves every token (c3 vs t1)") {
    // Packing must move tokens into sequences, never create or drop
    // them: c3's per-lang packed totals equal t1's per-lang token
    // totals, and sequence counts are exactly what the totals demand.
    def byName(n: String) =
      graft.queries.Registry.all.find(_.name == n).get.run(spark, sfDir)
    val packed = byName("c3_sequence_pack").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val tokens = byName("t1_token_stats").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(packed.keySet === tokens.keySet)
    packed.foreach { case (lang, (nSeqs, totalTokens)) =>
      assert(totalTokens === tokens(lang), s"token loss in lang=$lang")
      // bin-by-running-count: max seq_id <= (total-1) div 2048, so the
      // DISTINCT id count is bounded above by total/2048 + 1. No lower
      // bound holds in general — a single huge doc occupies ONE seq_id
      // while total/2048 is large (ids skip when a doc straddles bins).
      assert(nSeqs >= 1L, s"lang=$lang no sequences")
      assert(nSeqs <= totalTokens / 2048L + 1, s"lang=$lang too many seqs")
    }
  }

  test("invariant: length-bucketed batching conserves tokens and docs (c5 vs t1)") {
    // Bucketing reshapes WHERE docs sit, never what they carry: c5's
    // doc and real-token totals equal the corpus totals t1 reports,
    // padding only ever adds (padded >= real), pad_frac is a true
    // fraction, and batch counts are exactly ceil(n_docs/8) per band.
    def byName(n: String) =
      graft.queries.Registry.all.find(_.name == n).get.run(spark, sfDir)
    val bands = byName("c5_length_buckets").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(bands.nonEmpty)
    val t1 = byName("t1_token_stats").collect()
    assert(bands.map(_._2).sum == t1.map(_.getLong(1)).sum, "doc loss")
    assert(bands.map(_._4).sum == t1.map(_.getLong(2)).sum, "token loss")
    bands.foreach { case (band, nDocs, nBatches, real, padded, frac) =>
      assert(nBatches == (nDocs + 7) / 8, s"band $band batch count")
      assert(padded >= real, s"band $band padded < real")
      assert(frac >= 0.0 && frac < 1.0, s"band $band pad_frac $frac")
      assert(frac == (padded - real).toDouble / padded)
    }
  }

  test("invariant: c6 domain cap keeps exactly min(K, n_docs) per source") {
    val rows = graft.queries.Registry.all.find(_.name == "c6_domain_cap")
      .get.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nKept) =>
      assert(nKept == math.min(15L, nDocs),
        s"$src: kept $nKept of $nDocs docs, cap is 15")
    }
    // total kept never exceeds cap * |sources|
    assert(rows.map(_._3).sum <= 15L * rows.length)
  }

  test("invariant: x8 version-diff classes partition the key universe") {
    // The four change classes must be a partition of v1 ∪ v2 — counted
    // independently here with plain filters over orders.
    val o = graft.engine.Graft.table(spark, sfDir, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey").as("k"))
      .collect().map(_.getLong(0))
    def m(k: Long) = k % 1000
    val v1 = o.filter(m(_) < 500).toSet
    val v2 = o.filter(k => m(k) >= 100 && m(k) < 600).toSet
    val expected = Map(
      "added" -> v2.diff(v1).size.toLong,
      "removed" -> v1.diff(v2).size.toLong,
      "changed" -> v1.intersect(v2).count(_ % 10 == 0).toLong,
      "unchanged" -> v1.intersect(v2).count(_ % 10 != 0).toLong)
    val got = graft.queries.Registry.all.find(_.name == "x8_version_diff")
      .get.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0))
    assert(got.values.sum == v1.union(v2).size.toLong)
  }

  test("property: partitioned forwardFill equals a per-key scanLeft") {
    // random sparse per-key series: (key, idx, Option[value])
    val gen = for {
      key <- Gen.chooseNum(0, 4)
      idx <- Gen.chooseNum(0, 30)
      v <- Gen.option(Gen.chooseNum(-1000, 1000).map(_.toDouble))
    } yield (key, idx, v)
    val rows = samples(gen, 500)
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, idx)
    val df = rows.toDF("k", "i", "v")
    val filled = Functions.forwardFill(df, "i", "v", "f", Seq("k"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // reference: per key, scan in idx order carrying the last non-null
    rows.groupBy(_._1).foreach { case (k, g) =>
      var last: Option[Double] = None
      g.sortBy(_._2).foreach { case (_, i, v) =>
        if (v.isDefined) last = v
        assert(filled((k, i)) === last, s"key $k idx $i")
      }
    }
  }

  test("invariant: x10 funnel stages are cumulative cuts anchored at the " +
      "raw corpus") {
    val docs = graft.engine.Graft.table(spark, sfDir, "documents")
    val n = docs.count()
    val toks = docs
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .first().getLong(0)
    val stages = graft.queries.Registry.all
      .find(_.name == "x10_corpus_funnel").get.run(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(stages.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // stage 1 is the raw corpus exactly
    assert(stages.head._2 === n && stages.head._3 === toks)
    // each later stage is a subset of the previous: all three measures
    // monotonically non-increasing
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3 && b._4 <= a._4,
        s"stage ${b._1} grew vs ${a._1}")
    }
  }

  test("property: min-merge registry is invariant under random batch " +
      "partitionings and fold orders") {
    // The o11 contract generalized: HOWEVER the corpus is cut into
    // ingest batches, and in WHATEVER order the batches fold, the
    // registry equals the one-shot fold. ScalaCheck picks the salt
    // that assigns docs to batches and the fold permutation; any
    // violation means the merge algebra (or its read-modify-overwrite
    // plumbing) broke commutativity/associativity.
    import graft.pipeline.MinMergeStats
    import graft.queries.{DedupQueries, Scratch}
    val toks = DedupQueries.segTokens(spark, sfDir)
    val segs = DedupQueries.docSegments(toks).localCheckpoint(true)
    val owners = DedupQueries.segmentOwners _
    val keys = DedupQueries.SegRegistryKeys
    val ord = DedupQueries.SegRegistryOrd
    val reference = {
      val cat = new graft.engine.Catalog(spark, Scratch.fresh(spark, "mmp_ref"))
      MinMergeStats.fold(cat, "reg", owners(segs), keys, ord)
      cat.table("reg").orderBy("h", "seg").collect().toSeq
    }
    val cases = samples(for {
      salt <- Gen.choose(0L, 1000000L)
      k <- Gen.choose(2, 4)
      perm <- Gen.delay(Gen.const(new scala.util.Random(salt)
        .shuffle((0 until k).toList)))
    } yield (salt, k, perm), 3)
    cases.zipWithIndex.foreach { case ((salt, k, perm), i) =>
      val cat = new graft.engine.Catalog(spark,
        Scratch.fresh(spark, s"mmp_$i"))
      perm.foreach { b =>
        // a batch = the docs a seeded hash assigns to it; owners are
        // computed PER BATCH, exactly the o11 ingest shape
        MinMergeStats.fold(cat, "reg",
          owners(segs.filter(
            pmod(col("doc_id") * 31L + salt, lit(k.toLong)) === b.toLong)),
          keys, ord)
      }
      val got = cat.table("reg").orderBy("h", "seg").collect().toSeq
      assert(got === reference,
        s"registry diverged for salt=$salt k=$k order=$perm")
    }
  }
}
