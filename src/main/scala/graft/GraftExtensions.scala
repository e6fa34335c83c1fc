package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BoundedLevenshtein, ByteVecDot, FloatVecDot, SortedIntersectCount, SortedLongIntersectCount}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // Bounded edit-distance predicates silently upgrade to the banded
    // kernel (plans/BoundedLevenshteinRewrite) — plain-SQL users get the
    // affix-trimmed DP without knowing the function exists.
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRewrite)
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
      }),
    (
      FunctionIdentifier("sorted_long_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "sorted_long_intersect_count"),
      { args =>
        require(args.length == 2, "sorted_long_intersect_count(arrayBigint, arrayBigint)")
        SortedLongIntersectCount(args.head, args(1))
      }),
    (
      FunctionIdentifier("byte_vec_dot"),
      new ExpressionInfo(classOf[ByteVecDot].getName, "byte_vec_dot"),
      { args =>
        require(args.length == 2, "byte_vec_dot(arrayTinyint, arrayTinyint)")
        ByteVecDot(args.head, args(1))
      }),
    (
      FunctionIdentifier("bounded_levenshtein"),
      new ExpressionInfo(classOf[BoundedLevenshtein].getName, "bounded_levenshtein"),
      { args =>
        require(args.length == 3, "bounded_levenshtein(str, str, kLiteral)")
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bounded_levenshtein: k must be an INT literal, got $other")
        }
        BoundedLevenshtein(args.head, args(1), k)
      })
  )

  /** Runtime registration into an existing session (idempotent): the
    * kernel functions plus the bounded-Levenshtein optimizer rewrite.
    */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BoundedLevenshteinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BoundedLevenshteinRewrite
  }
}
