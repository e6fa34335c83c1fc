package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared key in [[queries]] is an operator from SURVEY.md §2; keys
  * with a [[oracleSql]] entry are hash-compared against DuckDB at sf0.01.
  */
object SparkEntry {

  private lazy val allQ: Seq[Q] =
    graft.queries.DiffQueries.all ++
      graft.queries.RelationalQueries.all ++
      graft.queries.AggWindowQueries.all ++
      graft.queries.FnQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.DedupVariantQueries.all ++
      graft.queries.TextAnalysisQueries.all ++
      graft.queries.StreamingQueries.all ++
      graft.queries.CurationQueries.all ++
      graft.queries.FunnelQueries.all ++
      graft.queries.SignalQueries.all ++
      graft.queries.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Differ.summary(
      graft.queries.DiffQueries.left(spark, "/root/testdata/sf0.001"),
      graft.queries.DiffQueries.right(spark, "/root/testdata/sf0.001"),
      Seq("o_orderkey"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
