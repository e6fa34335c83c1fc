package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer dot product over two array<tinyint> columns — the ADC
  * (asymmetric distance computation) kernel for scalar-quantized (SQ8)
  * similarity search. Every product |q_i·x_i| ≤ 127² and dims are small, so
  * the long accumulator is exact — the oracle compares the BIGINT result
  * directly, no float tolerance anywhere.
  *
  * Same rationale as [[FloatVecDot]]: higher-order functions are
  * CodegenFallback (an interpreted closure call per element), while this
  * compiles to a tight primitive loop inside whole-stage codegen. The
  * tinyint arrays keep 1 byte per element on the wire — the entire point of
  * SQ8 at 100 TB is that the scan streams codes at 4× the vector/s of
  * float32.
  *
  * Contract: elements non-null (quantizer output); length mismatch
  * truncates to the shorter side.
  */
case class ByteVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ByteVecDot =
    copy(left = newLeft, right = newRight)
}
