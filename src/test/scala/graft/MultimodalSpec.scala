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

  test("m5 payload dedup prices planted duplicate payloads, ignores " +
      "unique ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc_id % 3 keys media_kind (0=image, 1=audio, 2=video): docs 3
    // and 6 are both image with IDENTICAL bytes (one dup copy, doc 6);
    // doc 4 (audio) shares those bytes too, so the canonical is global
    // (doc 3) and audio's copy also counts as a dup. Docs 1, 2 unique.
    val payload = "identical media bytes for the dedup fixture"
    val docs = Seq(
      (1L, "unique audio payload one"),
      (2L, "unique video payload two"),
      (3L, payload), (4L, payload), (6L, payload))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-m5").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.all.find(_.name == "m5_payload_dedup").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val pb = payload.length.toLong
    // image: docs 3 (canonical) and 6 (dup copy)
    assert(out("image") === ((2L, 1L, 1L, pb)))
    // audio: doc 1 unique + doc 4's copy of the globally-canonical bytes
    assert(out("audio") === ((2L, 2L, 1L, pb)))
    // video: doc 2 only, nothing dedupable
    assert(out("video") === ((1L, 1L, 0L, 0L)))
  }
}
