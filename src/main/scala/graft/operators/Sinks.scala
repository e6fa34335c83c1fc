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

  /** Bucketed (+ optionally sorted) table write: hashes rows into
    * `nBuckets` files per partition ON THE BUCKET COLUMNS at write time,
    * so every later equi-join or aggregation keyed on those columns reads
    * co-located buckets and plans NO Exchange — the write-once,
    * join-many-times amortization that pays for itself at 100 TB (a
    * repeated fact-fact join on a 100 TB table otherwise re-shuffles the
    * full table every run). `sortBy` additionally pre-sorts each bucket so
    * sort-merge joins skip their Sort too. Requires a catalog table
    * (bucket metadata lives in the metastore); SinksSpec pins the
    * exchange-free join plan.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w0 = df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w1 =
      if (sortCols.isEmpty) w0 else w0.sortBy(sortCols.head, sortCols.tail: _*)
    val w2 = path.fold(w1)(p => w1.option("path", p))
    w2.format("parquet").saveAsTable(table)
  }

  /** Small-files compaction — the maintenance job every long-lived 100 TB
    * table needs: streaming micro-batches and fine-grained partitioned
    * writes accrete thousands of KB-sized files per directory, and at read
    * time each one costs a task schedule + a parquet footer fetch. Rewrites
    * the input into ceil(rows / targetRowsPerFile) files of near-equal row
    * count. `repartition(n)` (round-robin) rather than `coalesce(n)`:
    * coalesce merges ADJACENT input partitions without a shuffle, so a few
    * dense inputs yield one giant file next to many tiny ones — the same
    * skew the compaction was meant to remove. The extra shuffle is the
    * price of even output, paid once per maintenance run.
    * `maxRecordsPerFile` backstops the row target against a future writer
    * that splits differently.
    */
  def writeCompacted(df: DataFrame, path: String,
                     targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(files).write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
  }
}
