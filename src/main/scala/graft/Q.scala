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
}
