package graft

import org.apache.spark.sql.functions._

/** The native graft_dot expression must be bit-identical to the
  * interpreted zip_with/aggregate left-fold it replaced, handle
  * mismatched lengths with zip semantics, reject wrong types, and
  * null-propagate.
  */
class FloatDotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val foldSql =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v)"

  test("graft_dot == interpreted left fold, bit for bit, on real embeddings") {
    val e = graft.engine.Graft.table(spark, sfDir, "embeddings")
    val pairs = e.select($"vec_id", $"embedding".as("a"))
      .crossJoin(e.select($"embedding".as("b"), $"vec_id".as("v2")))
      .filter($"vec_id" < 3)
    val diff = pairs
      .withColumn("native", expr("graft_dot(a, b)"))
      .withColumn("fold", expr(foldSql))
      .filter($"native" =!= $"fold")
      .count()
    assert(diff === 0L)
  }

  test("graft_dot zips to the shorter length and null-propagates") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(10.0f, 20.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val got = df.select(expr("graft_dot(a, b)")).collect()
    assert(got(0).getDouble(0) === 50.0) // 1*10 + 2*20, trailing 3 ignored
    assert(got(1).isNullAt(0))
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    val df = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot"))
  }
}
