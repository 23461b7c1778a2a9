package graft.engine

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Base-31 polynomial rolling hash of a string, mod 1e9+7, over Unicode
  * code points — `acc = (acc * 31 + codepoint) % 1000000007`, 0 init,
  * left to right.
  *
  * This is the SAME function `t4_fingerprint` computes with the
  * interpreted higher-order `aggregate(split(...))` expression and the
  * DuckDB oracle computes with `list_reduce(list_transform(
  * regexp_extract_all(s, '(?s).'), c -> ascii(c)), ...)` — proven
  * portable across both engines. Compiled here to a tight per-row loop
  * (no per-character lambda interpretation, no md5 digest + hex parse),
  * it is the cheap digest for the dedup hot path: one hash per shingle
  * over the whole corpus is the dominant cost of MinHash at 100 TB.
  *
  * NULL in → NULL out.
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_strhash requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_strhash"

  override protected def nullSafeEval(input: Any): Any =
    StringPolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.StringPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)
}

object StringPolyHash {
  final val Mod = 1000000007L

  /** Left-fold over code points: (acc * 31 + cp) % 1e9+7. Static so
    * generated code calls straight into it (stays inside whole-stage
    * codegen, one virtual-free call per row).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
