package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Planted-PII fixture for t7_pii_scrub (promised by its docstring).
  *
  * The synthetic `documents` corpus contains no regex-matching PII, so the
  * driver's oracle gate only exercises the denylist arm there. This spec
  * plants emails / SSN / phone / IPv4 / deny terms in a tiny documents
  * table and checks, against hand-computed expectations:
  *   - per-source redaction counts and docs-touched counts,
  *   - the scrubbed text itself (Java-regex replication of the fold), and
  *   - the scrub checksum (graft_strhash over the expected scrubbed text),
  * closing the loop on both the counting arm and the sequential-scrub arm.
  */
class TextSpec extends SparkTestBase {

  private val fixture = Seq(
    // (doc_id, lang, source, text): 2 emails | ssn+phone+ip | 2 deny | clean
    (0L, "en", "s1", "contact me at alice@example.com or bob.smith@mail.co today"),
    (1L, "en", "s1", "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1 end"),
    (2L, "en", "s2", "we love spark and vector pipelines"),
    (3L, "en", "s2", "clean text nothing here"))

  /** Same fold as the query: PII patterns then \b-wrapped deny terms. */
  private def scrubJava(text: String): String = {
    val repls = TextQueries.PiiPatterns.map { case (p, t) => (p, s"[$t]") } ++
      TextQueries.DenyTerms.map(t => (s"\\b$t\\b", "[TERM]"))
    repls.foldLeft(text) { case (acc, (pat, rep)) =>
      acc.replaceAll(pat, java.util.regex.Matcher.quoteReplacement(rep))
    }
  }

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft_textspec").toString
    val df = spark.createDataFrame(fixture)
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t7 scrub fold redacts every planted PII form (Java-regex replica)") {
    assert(scrubJava(fixture(0)._4) ==
      "contact me at [EMAIL] or [EMAIL] today")
    assert(scrubJava(fixture(1)._4) ==
      "ssn [SSN] phone [PHONE] ip [IP] end")
    assert(scrubJava(fixture(2)._4) ==
      "we love [TERM] and [TERM] pipelines")
    assert(scrubJava(fixture(3)._4) == fixture(3)._4) // untouched
  }

  test("t7_pii_scrub counts, touches, and checksums the planted fixture") {
    val dir = writeFixture()
    val q = TextQueries.all.find(_.name == "t7_pii_scrub").get
    val rows = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // Expected checksum = sum of graft_strhash over the expected scrubbed
    // text, computed through the same registered expression.
    import spark.implicits._
    val expChecksum = fixture
      .groupBy(_._3).view.mapValues { docs =>
        docs.map(d => scrubJava(d._4)).toDF("t")
          .select(sum(expr("graft_strhash(t)"))).first().getLong(0)
      }.toMap

    assert(rows.toSeq == Seq(
      ("s1", 2L, 5L, 2L, expChecksum("s1")),
      ("s2", 2L, 2L, 1L, expChecksum("s2"))))
  }

  // ---- t16 BPE encode: independent in-JVM replica ----

  /** Greedy leftmost pair-merge fold — a LIST-based replica of the
    * query's delimiter-string replace fold, so the two agreeing is a
    * real cross-check of the merge semantics, not the same code twice.
    */
  private def encodeTokens(word: String, merges: Seq[String]): Long = {
    var toks = word.map(_.toString).toList
    for (m <- merges) {
      val (a, b) = (m.substring(0, 1), m.substring(1, 2))
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      for (tk <- toks) {
        if (buf.nonEmpty && buf.last == a && tk == b)
          buf.update(buf.size - 1, m)
        else buf += tk
      }
      toks = buf.toList
    }
    toks.size.toLong
  }

  /** t12's merge learning, replicated: frequency-weighted adjacent-pair
    * counts over the vocab, top-n in (count desc, pair) order.
    */
  private def learnMerges(vocab: Map[String, Long], n: Int): Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) += c
    counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(n).map(_._1)
  }

  test("t16_bpe_encode matches a list-fold replica on an adversarial fixture") {
    // Words chosen to stress the merge loop: overlap runs (aaaa),
    // alternations (ababab), merge-order conflicts (the rank-1 merge
    // consuming a char the rank-2 merge wanted), repeated words
    // (frequency weighting), and OOV fallbacks (digits, single chars,
    // punctuation-bearing tokens).
    val bpeFixture = Seq(
      (0L, "en", "s1", "aaaa ababab banana bananas"),
      (1L, "en", "s1", "aaaa aaaa abc abd 42 x"),
      (2L, "en", "s2", "the the the theme lethe 3.14 a-b"),
      (3L, "en", "s2", "   "), // whitespace-only: no words, drops out
      (4L, "en", "s2", "zz qq zzqq qqzz"))
    val dir = Files.createTempDirectory("graft_bpespec").toString
    spark.createDataFrame(bpeFixture)
      .toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def words(text: String): Seq[String] =
      text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def eligible(w: String): Boolean =
      w.length >= 2 && w.forall(c => c >= 'a' && c <= 'z')
    val vocab = bpeFixture.flatMap(d => words(d._4)).filter(eligible)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merges = learnMerges(vocab, TextQueries.BpeMerges)
    val expected = bpeFixture.flatMap { d =>
      val ws = words(d._4)
      if (ws.isEmpty) None
      else Some((d._1, ws.size.toLong,
        ws.map(w => if (eligible(w)) w.length.toLong else 1L).sum,
        ws.map(w => if (eligible(w)) encodeTokens(w, merges) else 1L).sum))
    }

    val q = TextQueries.all.find(_.name == "t16_bpe_encode").get
    val rows = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == expected,
      s"merges=$merges")
    // The fixture must actually exercise merging: some eligible word
    // must compress below its character count.
    val (_, _, base, bpe) = rows.find(_._1 == 0L).get
    assert(bpe < base, "fixture never merged — test is vacuous")
  }

  test("t17 BM25 top-k: ranks are dense, scores non-increasing, and " +
      "every hit contains a term of its query") {
    val q = TextQueries.all.find(_.name == "t17_bm25_topk").get
    val rows = q.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val queryTerms = Map(
      1L -> Set("spark", "join"),
      2L -> Set("window", "agg", "stream"),
      3L -> Set("hash", "table", "scan"),
      4L -> Set("customer", "data"),
      5L -> Set("merge", "sort", "filter"))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (qid, hits) =>
      val byRank = hits.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq,
        s"qid=$qid ranks not dense")
      assert(byRank.length <= 5)
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"qid=$qid scores increase down the ranking")
      byRank.foreach { case (_, _, doc, score) =>
        assert(score > 0)
        val toks = texts(doc).trim.split("\\s+").toSet
        assert(toks.intersect(queryTerms(qid)).nonEmpty,
          s"qid=$qid doc=$doc contains no query term")
      }
    }
    assert(rows.map(_._1).toSet == queryTerms.keySet,
      "every query must return at least one hit on the corpus")
  }

  test("rrfFuse: a both-arms doc outranks single-arm docs; missing arm " +
      "contributes exactly zero") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted lists for one query: doc 10 ranks 2 in BOTH arms; docs
    // 11/12 are arm-1-only rank 1, docs 21/22 arm-2-only rank 1/3
    val b = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 12L, 3L))
      .toDF("qid", "doc_id", "brnk")
    val v = Seq((1L, 21L, 1L), (1L, 10L, 2L), (1L, 22L, 3L))
      .toDF("qid", "doc_id", "vrnk")
    val out = queries.TextQueries.rrfFuse(b, v).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    // both-arms doc: 1/62 + 1/62; single-arm rank-1 docs: 1/61
    assert(byDoc(10L) === 1.0 / 62.0 + 1.0 / 62.0)
    assert(byDoc(11L) === 1.0 / 61.0 && byDoc(21L) === 1.0 / 61.0)
    assert(byDoc(12L) === 1.0 / 63.0 && byDoc(22L) === 1.0 / 63.0)
    // the overlap doc wins the fused ranking outright
    assert(out.find(_._2 == 1L).get._1 === 10L)
    // dense ranks, ordered by score desc then doc_id
    assert(out.sortBy(_._2).map(_._1).toSeq === Seq(10L, 11L, 21L, 12L, 22L))
  }
}
