package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: a Spark query plus (optionally) the equivalent
  * DuckDB SQL oracle the driver hash-compares against at sf0.01.
  *
  * Oracle SQL references tables by bare name (`orders`, `lineitem`, ...) per
  * the driver contract; the driver resolves them over the same parquet dir.
  * Queries with `oracle = None` get a weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** In-query invariant for the no-oracle (sketch/estimate) keys: the query
    * ITSELF throws if `cond` is false on any row, so a sketch regression
    * fails every runner of the query — the driver's Verify harness and the
    * bench, not just scalatest. Mechanism: `assert_true(cond, msg)` returns
    * NULL when the condition holds and raises at runtime otherwise, so
    * `filter(assert_true(...).isNull)` keeps every row, changes no schema,
    * and costs one codegen'd comparison per (post-aggregate, usually
    * handful-sized) row. The scalatest specs keep the TIGHT statistical
    * pins; these bands are the loud tripwire for gross breakage.
    */
  def requireBand(df: DataFrame, cond: org.apache.spark.sql.Column,
                  msg: String): DataFrame = {
    import org.apache.spark.sql.functions.{assert_true, lit}
    df.filter(assert_true(cond, lit(msg)).isNull)
  }
}
