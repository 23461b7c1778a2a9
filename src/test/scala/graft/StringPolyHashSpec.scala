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

  test("graft_strhash fixed values, empty string, and null propagation") {
    val got = Seq(Some("a"), Some("ab"), Some(""), None).toDF("s")
      .select(expr("graft_strhash(s)")).collect()
    assert(got(0).getLong(0) === 97L)            // 'a'
    assert(got(1).getLong(0) === 97L * 31 + 98L) // 'a'*31 + 'b'
    assert(got(2).getLong(0) === 0L)             // empty fold = init
    assert(got(3).isNullAt(0))
  }
}
