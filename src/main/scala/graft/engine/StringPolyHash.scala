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

object StringPolyHash {
  final val Mod = 1000000007L

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
}
