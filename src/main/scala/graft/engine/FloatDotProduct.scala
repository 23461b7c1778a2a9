package graft.engine

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native dot product of two float-array columns with whole-stage
  * codegen — the one place the built-in surface genuinely falls short:
  * `aggregate(zip_with(...))` evaluates a lambda per element through the
  * interpreted higher-order-function path, which dominates the
  * vector-similarity queries' profile. This compiles to a tight
  * primitive loop instead.
  *
  * Semantics are EXACTLY the left-fold the queries used before (products
  * as double in index order, 0.0 init), so results stay bit-identical to
  * the DuckDB oracle's `list_reduce(list_zip(...))` twin. Extra trailing
  * elements of a longer vector are ignored (zip semantics).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // A NULL element anywhere poisons the whole product, exactly like the
  // interpreted fold (null product → null accumulator) and the oracle's
  // list_reduce — returning a finite number for such rows would silently
  // diverge.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extensions: registers `graft_dot` and `graft_strhash` so any
  * session created with `spark.sql.extensions=graft.engine.GraftExtensions`
  * can call them from SQL and `expr(...)` — the public, cluster-safe
  * registration path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        FloatDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kgram_hashes"),
      new ExpressionInfo(classOf[KgramHashes].getName, "graft_kgram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kgram_hashes takes exactly 2 arguments: (string, k)")
        KgramHashes(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_strhash"),
      new ExpressionInfo(classOf[StringPolyHash].getName, "graft_strhash"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => new StringPolyHash(s)
        case Seq(s, b) => StringPolyHash(s, b)
        case _ => throw new IllegalArgumentException(
          "graft_strhash takes 1 or 2 arguments: (string[, base])")
      }))
  }
}
