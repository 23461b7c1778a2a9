package graft.engine

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(s)` — Unicode canonical composition (NFC) of a string.
  *
  * The text-canonicalization primitive a crawl pipeline runs before any
  * content-hash dedup: the same visible text arrives from different
  * sources as composed (U+00E9) or decomposed (U+0065 U+0301) code
  * point sequences, and every downstream digest — `graft_strhash`
  * shingles, MinHash bands, exact-substring grams — treats them as
  * different documents unless normalized first. NFC is the W3C-
  * recommended interchange form, is idempotent, and is guaranteed
  * stable across Unicode versions for assigned code points
  * (Unicode normalization stability policy), so the JVM executors and
  * a utf8proc-based oracle (DuckDB `nfc_normalize`) agree byte-for-
  * byte.
  *
  * Spark ships no normalization builtin, so this is a native codegen'd
  * Expression (the preference order: builtin > custom Expression >
  * UDF). The hot path is the ASCII fast path: a branch-free byte scan
  * (high bit set?) returns the input UTF8String untouched — zero
  * allocation, no String round-trip — so on the overwhelmingly-ASCII
  * bulk of a web corpus the expression costs one memory sweep.
  * Non-ASCII rows take `java.text.Normalizer.isNormalized` (a cheap
  * quick-check pass that allocates nothing when the text is already
  * NFC, which nearly all real text is) before paying for an actual
  * recomposition. NULL in → NULL out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.engine.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static so generated code calls straight into it (stays inside
    * whole-stage codegen). ASCII and already-normalized inputs return
    * the input object itself — the copy happens only when composition
    * actually changes bytes.
    */
  def nfc(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
