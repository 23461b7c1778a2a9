package graft

import org.apache.spark.sql.functions._

/** The native graft_strhash expression must equal the interpreted
  * per-character aggregate fold it replaces (the t4_fingerprint formula,
  * whose DuckDB twin is oracle-proven portable), and null-propagate.
  */
class StringPolyHashSpec extends SparkTestBase {
  import spark.implicits._

  private val foldSql =
    "aggregate(filter(split(s, ''), c -> c != ''), 0L, " +
      "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"

  test("graft_strhash == interpreted base-31 fold on real document text") {
    val diff = graft.engine.Graft.table(spark, sfDir, "documents")
      .select($"text".as("s"))
      .withColumn("native", expr("graft_strhash(s)"))
      .withColumn("fold", expr(foldSql))
      .filter($"native" =!= $"fold")
      .count()
    assert(diff === 0L)
  }

  test("graft_kgram_hashes rolling pass == per-substring refolds on real text") {
    val diff = graft.engine.Graft.table(spark, sfDir, "documents")
      .select($"text".as("s"))
      .withColumn("rolled", expr("graft_kgram_hashes(s, 8)"))
      .withColumn("refolded", expr(
        "transform(sequence(1, greatest(length(s) - 7, 1)), " +
          "i -> graft_strhash(substring(s, i, 8)))"))
      .filter(not($"rolled" === $"refolded"))
      .count()
    assert(diff === 0L)
  }

  test("graft_kgram_hashes matches refolds on non-ASCII text too") {
    val diff = Seq("héllo wörld, naïve café", "日本語のテキストです",
      "mixed ascii と 日本語 text").toDF("s")
      .withColumn("rolled", expr("graft_kgram_hashes(s, 8)"))
      .withColumn("refolded", expr(
        "transform(sequence(1, greatest(length(s) - 7, 1)), " +
          "i -> graft_strhash(substring(s, i, 8)))"))
      .filter(not($"rolled" === $"refolded"))
      .count()
    assert(diff === 0L)
  }

  test("graft_kgram_hashes short-string clamp and fixed values") {
    val got = Seq("ab", "abcd").toDF("s")
      .select(expr("graft_kgram_hashes(s, 3)")).collect()
    // "ab" shorter than k: one hash of the whole string
    assert(got(0).getSeq[Long](0) === Seq(97L * 31 + 98))
    // "abcd": hashes of "abc" and "bcd"
    val abc = (97L * 31 + 98) * 31 + 99
    val bcd = (98L * 31 + 99) * 31 + 100
    assert(got(1).getSeq[Long](0) === Seq(abc, bcd))
  }

  test("graft_strhash fixed values, empty string, and null propagation") {
    val got = Seq(Some("a"), Some("ab"), Some(""), None).toDF("s")
      .select(expr("graft_strhash(s)")).collect()
    assert(got(0).getLong(0) === 97L)            // 'a'
    assert(got(1).getLong(0) === 97L * 31 + 98L) // 'a'*31 + 'b'
    assert(got(2).getLong(0) === 0L)             // empty fold = init
    assert(got(3).isNullAt(0))
  }
}
