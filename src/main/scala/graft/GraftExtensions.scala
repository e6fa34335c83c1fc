package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVecDot, SortedIntersectCount}

/** Session extension that registers the native kernels as SQL functions,
  * so `spark.sql("SELECT float_vec_dot(a, b) ...")` works cluster-wide:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * For an already-running session (extensions are builder-time only), use
  * [[GraftExtensions.register]] which injects the same functions into the
  * session's FunctionRegistry at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      { args =>
        require(args.length == 2, "float_vec_dot(arrayFloat, arrayFloat)")
        FloatVecDot(args.head, args(1))
      }),
    (
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      { args =>
        require(args.length == 2, "sorted_intersect_count(arrayString, arrayString)")
        SortedIntersectCount(args.head, args(1))
      })
  )

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
