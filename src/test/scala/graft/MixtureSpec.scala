package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.{CurationQueries, TextQueries}

/** Planted fixtures for the three training-order operators added in
  * round 9: t12 (BPE pair counts), c7 (temperature-flattened mixture),
  * c8 (deterministic epoch shuffle). Each expectation is hand-computed
  * (t12) or derived from a Scala replica of the cross-engine base-31
  * fold (c7/c8) — so the tests pin the SEMANTICS, independently of the
  * DuckDB oracle the driver also checks.
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
}
