package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Scale-out write path (SURVEY §2.B sink row).
  *
  * `writePartitioned` is the 100 TB-safe shape: repartition on the
  * partition columns first so each Hive-style output directory is written
  * by as few tasks as possible — without it, every one of the N input
  * tasks opens a file in every partition directory (N × P small files, the
  * classic small-files explosion). Optional in-partition sort gives
  * parquet row-group clustering (better min/max pruning for readers).
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       overwrite: Boolean = true): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val repartitioned = df.repartition(partitionCols.map(col): _*)
    val clustered =
      if (sortCols.isEmpty) repartitioned
      else repartitioned.sortWithinPartitions(sortCols.map(col): _*)
    clustered.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
