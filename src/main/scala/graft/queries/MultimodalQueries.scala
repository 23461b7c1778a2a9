package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft

/** Per-document features produced by the stubbed binary "decode" stage
  * (see [[MultimodalQueries]] m2). The decode itself is a deterministic
  * fake — this container ships no image/audio codecs — but the Spark
  * plumbing (binary column, typed output schema, partition-parallel
  * mapPartitions batches) is real.
  */
final case class DecodedFeatures(
    doc_id: Long,
    n_bytes: Long,
    first_byte: Int,
    last_byte: Int,
    checksum: Long)

/** Multimodal-column handling for a training-data pipeline: opaque
  * `binary` payloads with typed metadata, and a decode/feature-extract
  * stage as a partition-parallel typed transformation.
  *
  * The `documents.text` column stands in for raw media bytes (UTF-8
  * encoded); real deployments swap the fake decoder for a codec call,
  * keeping schema, batching, and partitioning identical. At 100 TB the
  * payload column stays unprojected (column pruning keeps it out of
  * every query that doesn't decode) and decode runs once per partition
  * with no shuffle.
  */
object MultimodalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Graft.table(s, d, n)

  /** documents with an opaque binary payload + typed metadata columns. */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("media_kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .withColumn("media_width", (lit(32) + pmod(col("doc_id") * 7, lit(64))).cast("long"))
      .withColumn("media_height", (lit(32) + pmod(col("doc_id") * 13, lit(64))).cast("long"))

  def all: Seq[Q] = Seq(

    Q("m1_binary_meta",
      "Multimodal metadata — opaque binary payload column + typed " +
        "metadata (kind/width/height), rolled up per kind; the payload " +
        "is pruned out of the scan wherever it isn't decoded",
      (s, d) => withPayload(t(s, d, "documents"))
        .groupBy(col("media_kind"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          min(col("media_width")).as("min_width"),
          max(col("media_height")).as("max_height"))
        .orderBy("media_kind"),
      Some(
        """SELECT media_kind, COUNT(*) AS n_docs,
          |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          |  MIN(media_width) AS min_width,
          |  MAX(media_height) AS max_height
          |FROM (
          |  SELECT text,
          |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
          |    32 + (doc_id * 7) % 64 AS media_width,
          |    32 + (doc_id * 13) % 64 AS media_height
          |  FROM documents) t
          |GROUP BY 1 ORDER BY media_kind""".stripMargin)),

    Q("m2_decode_features",
      "Multimodal decode stub — partition-parallel mapPartitions over " +
        "(doc_id, payload) producing typed features. The byte loop " +
        "stands in for a codec; schema/batching/partitioning are real.",
      (s, d) => {
        import s.implicits._
        val payloads = withPayload(t(s, d, "documents"))
          .select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
        // STUB decode: a real deployment would hand `bytes` to an image/
        // audio codec here; this deterministic fake keeps the oracle exact.
        // Contract: the corpus is ASCII (bytes == code points) — the
        // oracle computes over characters (with (?s) so newlines count
        // too); non-ASCII data would need a byte-exact oracle. Empty/null
        // payloads decode to all-zero features (ascii('') = 0 there).
        val decoded = payloads.mapPartitions(_.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          if (bytes.isEmpty) DecodedFeatures(id, 0L, 0, 0, 0L)
          else {
            var sum = 0L
            var k = 0
            while (k < bytes.length) { sum += bytes(k) & 0xff; k += 1 }
            DecodedFeatures(id, bytes.length.toLong,
              bytes.head & 0xff, bytes.last & 0xff, sum)
          }
        })
        decoded.toDF().orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
          |  CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte,
          |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(regexp_extract_all(text, '(?s).'), c -> CAST(ascii(c) AS BIGINT))),
          |    (acc, c) -> acc + c) AS BIGINT) AS checksum
          |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("m3_frame_sample",
      "Multimodal frame sampling — every video payload yields one " +
        "\"frame\" per 64-byte stride (window + first-byte digest per " +
        "frame) via the same partition-parallel decode stub; a real " +
        "deployment swaps the stride loop for codec keyframe extraction",
      (s, d) => {
        import s.implicits._
        val payloads = withPayload(t(s, d, "documents"))
          .filter(col("media_kind") === "video")
          .select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
        // Empty payloads yield zero frames and drop out of the per-doc
        // aggregate — mirrored by the oracle's octet_length > 0 filter.
        val frames = payloads.flatMap { case (id, bytes) =>
          val stride = 64
          if (bytes == null) Nil
          else (0 until bytes.length by stride).map { off =>
            (id, (off / stride).toLong, bytes(off) & 0xff)
          }
        }.toDF("doc_id", "frame_no", "first_byte")
        frames.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum($"first_byte".cast("long")).as("digest_sum"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |  CAST((octet_length(encode(text)) - 1) // 64 + 1 AS BIGINT) AS n_frames,
          |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(generate_series(0, (octet_length(encode(text)) - 1) // 64),
          |      f -> CAST(ascii(substr(text, f * 64 + 1, 1)) AS BIGINT))),
          |    (acc, v) -> acc + v) AS BIGINT) AS digest_sum
          |FROM documents
          |WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
          |ORDER BY doc_id""".stripMargin)),

    Q("m4_resize_meta",
      "Multimodal resize stage — image payloads rescaled to fit a " +
        "128x128 box preserving aspect ratio; pure metadata arithmetic " +
        "here (the byte-level resample lives behind the same decode " +
        "stub), grouped per target bucket",
      (s, d) => {
        import s.implicits._
        val imgs = withPayload(t(s, d, "documents"))
          .filter($"media_kind" === "image")
        val scaled = imgs
          .withColumn("scale",
            lit(128.0) / greatest($"media_width", $"media_height"))
          .withColumn("out_w", floor($"media_width" * $"scale").cast("long"))
          .withColumn("out_h", floor($"media_height" * $"scale").cast("long"))
        scaled.groupBy($"out_w")
          .agg(count(lit(1)).as("n_images"),
            min($"out_h").as("min_h"),
            max($"out_h").as("max_h"))
          .orderBy("out_w")
      },
      Some(
        """SELECT out_w, COUNT(*) AS n_images,
          |  MIN(out_h) AS min_h, MAX(out_h) AS max_h
          |FROM (
          |  SELECT CAST(FLOOR(w * s) AS BIGINT) AS out_w,
          |         CAST(FLOOR(h * s) AS BIGINT) AS out_h
          |  FROM (
          |    SELECT w, h, 128.0 / GREATEST(w, h) AS s
          |    FROM (SELECT 32 + (doc_id * 7) % 64 AS w,
          |                 32 + (doc_id * 13) % 64 AS h
          |          FROM documents WHERE doc_id % 3 = 0) dims) scaled) t
          |GROUP BY 1 ORDER BY out_w""".stripMargin)),

    Q("m5_payload_dedup",
      "Multimodal payload dedup — content-hash dedup over the opaque " +
        "binary column, the image/audio dedup primitive that needs NO " +
        "codec: identical bytes are identical media regardless of " +
        "metadata, so md5 over the payload (computed on the raw " +
        "bytes — the oracle twin hashes the text the payload encodes, " +
        "byte-identical by construction) keys a global canonical-" +
        "per-content choice (min doc_id), and the per-kind report " +
        "prices what a dedup pass saves: canonical docs, duplicate " +
        "copies, and the dedupable byte mass. At 100 TB this is the " +
        "d1 shape over payload digests: one hash shuffle of (digest, " +
        "doc_id, n_bytes) triples — the payloads themselves never " +
        "move, and the scan prunes every other column.",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("doc_id"))
        withPayload(t(s, d, "documents"))
          .withColumn("h", md5(col("payload")))
          .withColumn("nb", length(col("payload")).cast("long"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("media_kind"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("h")).as("n_unique_payloads"),
            count(when(col("rn") > 1, 1)).as("n_dup_copies"),
            coalesce(sum(when(col("rn") > 1, col("nb"))), lit(0L))
              .as("bytes_dedupable"),
            sum(col("nb")).as("bytes_total"))
          .orderBy("media_kind")
      },
      Some(
        """WITH p AS (
          |  SELECT doc_id,
          |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          |      ELSE 'video' END AS media_kind,
          |    md5(text) AS h,
          |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |  FROM documents),
          |r AS (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          |  FROM p)
          |SELECT media_kind, COUNT(*) AS n_docs,
          |  COUNT(DISTINCT h) AS n_unique_payloads,
          |  COUNT(*) FILTER (rn > 1) AS n_dup_copies,
          |  CAST(COALESCE(SUM(nb) FILTER (rn > 1), 0) AS BIGINT)
          |    AS bytes_dedupable,
          |  CAST(SUM(nb) AS BIGINT) AS bytes_total
          |FROM r GROUP BY 1 ORDER BY media_kind""".stripMargin)),

    Q("m6_frame_neardup",
      "Cross-video NEAR-dup via frame signatures — the practical " +
        "video-dedup primitive m5's whole-payload hash cannot see " +
        "(re-encoded/trimmed copies differ byte-wise but share " +
        "frames): every video frame (the m3 64-byte stride stub; a " +
        "real deployment emits a perceptual hash per decoded frame) " +
        "carries a 7-byte polynomial signature, and two videos pair " +
        "when they share >= 3 distinct frame signatures. The join is " +
        "the d1 digest shape — (doc, sig) rows equi-joined on sig, " +
        "never video-pairs-all-pairs — with the winnowing hot-sig " +
        "prune (a signature in > 10 docs is boilerplate — intros, " +
        "black frames — and is dropped BEFORE the pair join, the " +
        "same count-over-window on the join's own shuffle). At " +
        "100 TB: payloads never shuffle (signatures are 8 bytes/" +
        "frame), the pair fan-out is bounded by the prune cap, and " +
        "the frame store writes partitioned-by-sig-prefix for " +
        "incremental probes (the o6 index pattern).",
      (s, d) => {
        import s.implicits._
        val stride = 64
        val payloads = withPayload(t(s, d, "documents"))
          .filter(col("media_kind") === "video" &&
            length(col("payload")) > 0)
          .select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
        val frames = payloads.flatMap { case (id, bytes) =>
          (0 until bytes.length by stride).map { off =>
            var sig = 0L
            var j = 0
            while (j < 7) {
              val b = if (off + j < bytes.length) bytes(off + j) & 0xffL
                      else 0L
              sig = sig * 256 + b; j += 1
            }
            (id, sig)
          }
        }.toDF("doc_id", "sig").distinct()
        val wSig = org.apache.spark.sql.expressions.Window
          .partitionBy(col("sig"))
        val pruned = frames
          .withColumn("nd", count(lit(1)).over(wSig))
          .filter(col("nd") <= 10)
          .select(col("doc_id"), col("sig"))
        val a = pruned.select(col("doc_id").as("doc_a"), col("sig"))
        val b = pruned.select(col("doc_id").as("doc_b"),
          col("sig").as("sig_b"))
        a.join(b, col("sig") === col("sig_b") &&
            col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared_sigs"))
          .filter(col("n_shared_sigs") >= 3)
          .orderBy("doc_a", "doc_b")
      },
      Some(
        """WITH vids AS (
          |  SELECT doc_id, text FROM documents
          |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
          |frames AS (
          |  SELECT DISTINCT doc_id,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(generate_series(0, 6),
          |        j -> CAST(ascii(substr(text, f * 64 + j + 1, 1)) AS BIGINT))),
          |      (acc, b) -> acc * 256 + b) AS sig
          |  FROM vids, LATERAL UNNEST(generate_series(0,
          |    (octet_length(encode(text)) - 1) // 64)) g(f)),
          |pruned AS (
          |  SELECT doc_id, sig FROM (
          |    SELECT doc_id, sig, COUNT(*) OVER (PARTITION BY sig) AS nd
          |    FROM frames) t WHERE nd <= 10),
          |pairs AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    COUNT(*) AS n_shared_sigs
          |  FROM pruned a JOIN pruned b
          |    ON a.sig = b.sig AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
          |SELECT doc_a, doc_b, n_shared_sigs FROM pairs
          |ORDER BY doc_a, doc_b""".stripMargin))
  )
}
