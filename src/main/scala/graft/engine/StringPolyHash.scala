package graft.engine

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Base-`base` polynomial rolling hash of a string, mod 1e9+7, over
  * Unicode code points — `acc = (acc * base + codepoint) % 1000000007`,
  * 0 init, left to right. `graft_strhash(s)` defaults to base 31.
  *
  * Base 31 is the SAME function `t4_fingerprint` computes with the
  * interpreted higher-order `aggregate(split(...))` expression and the
  * DuckDB oracle computes with `list_reduce(list_transform(
  * regexp_extract_all(s, '(?s).'), c -> ascii(c)), ...)` — proven
  * portable across both engines. Compiled here to a tight per-row loop
  * (no per-character lambda interpretation, no md5 digest + hex parse),
  * it is the cheap digest for the dedup hot path: one hash per
  * shingle/token over the whole corpus is the dominant cost of
  * MinHash/SimHash at 100 TB. Distinct bases give independent-enough
  * hash families (SimHash draws 64 vote bits from three bases).
  *
  * NULL in → NULL out. The base must be a literal (plan-time constant
  * on both engines, or the oracle could not mirror it).
  */
case class StringPolyHash(left: Expression, right: Expression)
    extends BinaryExpression {

  def this(child: Expression) = this(child, Literal(31))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ByteType | ShortType | IntegerType | LongType)
          if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_strhash requires (string, literal integral base), got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_strhash"

  override protected def nullSafeEval(s: Any, b: Any): Any =
    StringPolyHash.hash(s.asInstanceOf[UTF8String],
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, b) => s"graft.engine.StringPolyHash.hash($s, (long) $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringPolyHash =
    copy(left = newLeft, right = newRight)
}

/** `graft_kgram_hashes(s, k)` — array of every k-gram's base-31 hash in
  * one compiled O(len) rolling pass (vs O(len*k) refolds + a substring
  * allocation per position through the interpreted `transform` lambda).
  * Element i equals `graft_strhash(substring(s, i+1, k))` exactly, so
  * the DuckDB twin stays the per-substring fold. The winnowing
  * fingerprint hot path.
  */
case class KgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ByteType | ShortType | IntegerType | LongType)
          if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_kgram_hashes requires (string, literal integral k), got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_kgram_hashes"

  override protected def nullSafeEval(s: Any, k: Any): Any =
    StringPolyHash.kgramArray(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.engine.StringPolyHash.kgramArray($s, (int) $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KgramHashes =
    copy(left = newLeft, right = newRight)
}

object StringPolyHash {
  final val Mod = 1000000007L

  /** [[kgramHashes]] boxed for the expression layer. */
  def kgramArray(s: UTF8String, k: Int)
      : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(kgramHashes(s, k))

  /** Left-fold over code points: (acc * base + cp) % 1e9+7. Static so
    * generated code calls straight into it (stays inside whole-stage
    * codegen, one virtual-free call per row).
    */
  def hash(s: UTF8String, base: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** All k-gram base-31 hashes of `s` in ONE O(len) pass via the
    * textbook rolling update `h' = ((h - cp_out*31^(k-1)) * 31 +
    * cp_in) mod p` — each element is EXACTLY
    * `hash(substring(s, i, k), 31)` (the rolling recurrence and the
    * direct fold compute the same polynomial mod p), without the
    * O(len*k) refold or a substring allocation per position. Strings
    * shorter than k yield one hash of the whole string (mirroring
    * substring's clamping).
    */
  def kgramHashes(s: UTF8String, k: Int): Array[Long] = {
    val str = s.toString
    // code points, decoded once
    val cps = new Array[Int](str.length)
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n <= k) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 31 + cps(j)) % Mod; j += 1 }
      return Array(acc)
    }
    var pow = 1L // 31^(k-1) mod p
    var e = 0
    while (e < k - 1) { pow = pow * 31 % Mod; e += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * 31 + cps(j)) % Mod; j += 1 }
    out(0) = h
    var p = 1
    while (p <= n - k) {
      h = (((h - cps(p - 1) * pow % Mod + Mod) % Mod) * 31 +
        cps(p + k - 1)) % Mod
      out(p) = h
      p += 1
    }
    out
  }
}
