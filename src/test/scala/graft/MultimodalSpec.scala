package graft

import graft.queries.Registry

/** The stubbed decode stage must agree with a driver-side recompute of
  * the same deterministic features, for every document.
  */
class MultimodalSpec extends SparkTestBase {

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
