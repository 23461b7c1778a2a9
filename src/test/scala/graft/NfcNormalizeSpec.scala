package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native graft_nfc expression must perform real Unicode canonical
  * composition (NFC), be the identity on ASCII and already-composed
  * text, be idempotent, and null-propagate \u2014 and the codegen'd
  * dataframe path must agree with the JDK Normalizer it wraps.
  *
  * All non-ASCII is spelled as \\uXXXX escapes so composed vs
  * decomposed forms are unambiguous in source.
  */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_nfc composes decomposed sequences to their NFC form") {
    val got = Seq(
      "e\u0301",  // e + combining acute -> U+00E9
      "a\u0308",  // a + combining diaeresis -> U+00E4
      "c\u0327a", // c + combining cedilla -> U+00E7, then 'a'
      "already composed \u00e9\u00e4\u00e7")
      .toDF("s").select(expr("graft_nfc(s)")).as[String].collect()
    assert(got(0) === "\u00e9")
    assert(got(1) === "\u00e4")
    assert(got(2) === "\u00e7a")
    assert(got(3) === "already composed \u00e9\u00e4\u00e7")
  }

  test("graft_nfc is the identity on ASCII and idempotent everywhere") {
    val df = graft.engine.Graft.table(spark, sfDir, "documents")
      .select(concat($"text", lit("e\u0301")).as("s"))
    assert(df.filter(expr("graft_nfc(s) != graft_nfc(graft_nfc(s))"))
      .count() === 0L)
    // the corpus itself is ASCII: normalization must not touch it
    val raw = graft.engine.Graft.table(spark, sfDir, "documents")
    assert(raw.filter(expr("graft_nfc(text) != text")).count() === 0L)
    // and each augmented doc must compose exactly one code point away
    assert(df.filter(expr("length(graft_nfc(s)) != length(s) - 1"))
      .count() === 0L)
  }

  test("graft_nfc null-propagates and matches the JDK Normalizer") {
    val got = Seq(Option.empty[String], Some("e\u0301"), Some("plain"))
      .toDF("s").select(expr("graft_nfc(s)")).as[Option[String]].collect()
    assert(got(0).isEmpty)
    assert(got(1).contains("\u00e9"))
    assert(got(2).contains("plain"))
    for (s <- Seq("e\u0301", "plain ascii", "mixed e\u0301 und u\u0308"))
      assert(
        graft.engine.NfcNormalize.nfc(UTF8String.fromString(s)).toString ===
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  test("ASCII fast path returns the input object itself (zero-alloc)") {
    val in = UTF8String.fromString("pure ascii text 12345")
    assert(graft.engine.NfcNormalize.nfc(in) eq in)
    // already-NFC non-ASCII takes the isNormalized no-copy path
    val nfcAlready = UTF8String.fromString("caf\u00e9")
    assert(graft.engine.NfcNormalize.nfc(nfcAlready) eq nfcAlready)
  }
}
