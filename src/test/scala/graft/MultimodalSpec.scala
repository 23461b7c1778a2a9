package graft

import graft.queries.Registry

/** The stubbed decode stage must agree with a driver-side recompute of
  * the same deterministic features, for every document.
  */
class MultimodalSpec extends SparkTestBase {

  test("m3 frame counts match ceil(bytes/stride) for every video doc") {
    val nBytes = graft.engine.Graft.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(3)) === 2)
      .selectExpr("doc_id", "cast(length(cast(text as binary)) as long) as n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = Registry.all.find(_.name == "m3_frame_sample").get
      .run(spark, sfDir).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val expect = (nBytes(r.getLong(0)) - 1) / 64 + 1
      assert(r.getLong(1) === expect)
    }
  }

  test("m2 decode features match a driver-side recompute") {
    val docs = graft.engine.Graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val decoded = Registry.all.find(_.name == "m2_decode_features").get
      .run(spark, sfDir).collect()
    assert(decoded.length === docs.size)
    decoded.foreach { r =>
      val text = docs(r.getLong(0))
      val bytes = text.getBytes("UTF-8")
      assert(r.getLong(1) === bytes.length.toLong)
      assert(r.getInt(2) === (bytes.head & 0xff))
      assert(r.getInt(3) === (bytes.last & 0xff))
      assert(r.getLong(4) === bytes.map(_ & 0xff).map(_.toLong).sum)
    }
  }
}
