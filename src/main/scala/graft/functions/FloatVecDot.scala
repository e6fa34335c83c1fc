package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<float> columns, widening each element
  * to double (exact) and accumulating sequentially from 0.0 — the same IEEE
  * operation sequence as DuckDB's list kernels over DOUBLE[] casts
  * (verified bit-identical), so oracle hash-compares survive.
  *
  * Why a custom Catalyst Expression (SURVEY §4 escape hatch (b)): the
  * DataFrame-level alternatives each lose an order of magnitude on
  * similarity-join hot paths — higher-order functions
  * (aggregate/zip_with/transform) are CodegenFallback (interpreted closure
  * call per element), and an unrolled 64-term scalar chain defeats
  * whole-stage codegen via the generated-method size limit. This compiles
  * to a tight primitive loop inside WSCG (`doGenCode`), keeps the
  * 4-byte-per-element float arrays on the wire, and needs no fixed
  * dimensionality.
  *
  * Contract: elements must be non-null (embedding vectors); length
  * mismatch truncates to the shorter side. Norms are `FloatVecDot(a, a)`.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
