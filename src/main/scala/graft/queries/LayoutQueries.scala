package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-layout planning — the table-maintenance side of a 100 TB store:
  * which rows land in which file, and what the resulting per-file column
  * ranges (= parquet footer min/max stats) let a scan skip.
  */
object LayoutQueries {

  /** Bit-interleave of two 8-bit NORMALIZED coordinates (Morton/Z-order
    * curve): p's bit i lands at position 2i+1, s's at 2i — a 16-bit
    * z-value. Interleaving normalized coordinates, not raw values, is
    * what makes the curve balance dimensions of unequal range (raw-bit
    * interleave degenerates to "sort by the wider column": the narrow
    * column's high bits are all zero, so they never split a file — the
    * production z-order implementations all rank/normalize first). Pure
    * integer shift/mask arithmetic, whole-stage-codegen'd, regenerated
    * verbatim in the DuckDB oracle.
    */
  private[graft] def zValue(p: Column, s: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(p, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  private def zValueSql(p: String, s: String): String =
    (0 until 8).map { i =>
      s"((($p >> $i) & 1) << ${2 * i + 1}) + ((($s >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  def all: Seq[Q] = Seq(

    Q("sort_zorder",
      s"""WITH st AS (SELECT min(l_partkey) AS pmin, max(l_partkey) + 1 AS pmax1,
         |                   min(l_suppkey) AS smin, max(l_suppkey) + 1 AS smax1
         |            FROM lineitem),
         |n AS (SELECT l_partkey AS p, l_suppkey AS s,
         |             (l_partkey - pmin) * 256 // (pmax1 - pmin) AS np,
         |             (l_suppkey - smin) * 256 // (smax1 - smin) AS ns
         |      FROM lineitem, st),
         |z AS (SELECT p, s, np, ${zValueSql("np", "ns")} AS zv FROM n),
         |a AS (SELECT p, s, zv // 1024 AS zb, np // 4 AS lb FROM z)
         |SELECT 'zorder' AS layout, CAST(zb AS BIGINT) AS file_id,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       min(p) AS p_min, max(p) AS p_max,
         |       min(s) AS s_min, max(s) AS s_max
         |FROM a GROUP BY 2
         |UNION ALL
         |SELECT 'linear', CAST(lb AS BIGINT),
         |       CAST(count(*) AS BIGINT),
         |       min(p), max(p), min(s), max(s)
         |FROM a GROUP BY 2""".stripMargin) { (s, d) =>
      // Z-order layout planner: assign every row to one of 64 target files
      // by Morton z-value over NORMALIZED (l_partkey, l_suppkey) — each
      // dim min-max-scaled to 8 bits first, so both contribute equally to
      // the curve regardless of raw range (rank/quantile scaling is the
      // skew-proof production variant; min-max keeps the oracle exact on
      // this uniform fixture). Per file the report carries min/max of the
      // RAW values in BOTH dims — exactly the parquet footer stats
      // data-skipping consults. The 'linear' control (sort by partkey
      // alone) spans the FULL suppkey range per file, so a suppkey
      // predicate skips nothing; z-order splits each dim into ~8 ranges
      // across the 64 files (top 6 z bits = 3 from each dim) and prunes
      // 2-D point/range queries (LayoutSpec pins the >=4x second-dim
      // span win). File cut = value-based integer division — no
      // data-dependent quantiles, no global sort in the report. At 100 TB
      // the write path is repartitionByRange(zv).sortWithinPartitions(zv),
      // the same one-shuffle cost as a plain sorted write; only the
      // 64-file census ever aggregates here.
      val li = Tables.cachedTable(s, d, "lineitem")
      val st = li.agg(
        min(col("l_partkey")).as("pmin"), (max(col("l_partkey")) + 1).as("pmax1"),
        min(col("l_suppkey")).as("smin"), (max(col("l_suppkey")) + 1).as("smax1"))
      val a = li.select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .crossJoin(broadcast(st))
        .withColumn("np", expr("(p - pmin) * 256L div (pmax1 - pmin)"))
        .withColumn("ns", expr("(s - smin) * 256L div (smax1 - smin)"))
        .withColumn("zv", zValue(col("np"), col("ns")))
        .withColumn("zb", expr("zv div 1024L"))
        .withColumn("lb", expr("np div 4L"))
      def census(name: String, bucket: String): DataFrame =
        a.groupBy(col(bucket).cast("long").as("file_id"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min(col("p")).as("p_min"), max(col("p")).as("p_max"),
            min(col("s")).as("s_min"), max(col("s")).as("s_max"))
          .select(lit(name).as("layout"), col("file_id"), col("n_rows"),
            col("p_min"), col("p_max"), col("s_min"), col("s_max"))
      census("zorder", "zb").unionByName(census("linear", "lb"))
    },

    Q("maintenance_compact",
      """WITH m AS (
        |  SELECT o_orderkey % 512 AS file_id,
        |         CAST(sum(32 + length(o_orderpriority) + length(o_orderstatus))
        |              AS BIGINT) AS size_bytes
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(size_bytes) AS total, count(*) AS nf FROM m),
        |f AS (SELECT file_id, size_bytes,
        |             CASE WHEN size_bytes * nf < total THEN 1 ELSE 0 END AS small
        |      FROM m, t),
        |c AS (SELECT file_id, size_bytes,
        |             coalesce(sum(size_bytes) OVER (ORDER BY file_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS cum_before
        |      FROM f WHERE small = 1),
        |ct AS (SELECT sum(size_bytes) AS ctotal FROM c)
        |SELECT file_id, size_bytes, CAST(1 AS BIGINT) AS compact,
        |       CAST(cum_before * 8 // ctotal AS BIGINT) AS bin
        |FROM c, ct
        |UNION ALL
        |SELECT file_id, size_bytes, 0, -1 FROM f WHERE small = 0""".stripMargin) {
      (s, d) =>
        // Small-file compaction planner — the OPTIMIZE/maintenance job of a
        // 100 TB lake, run on METADATA only: a per-file size manifest
        // (synthesized here as 512 pseudo-files over orders with a
        // deterministic per-row byte estimate; in production it is the FS
        // listing and never touches data). Below-average files are packed
        // into 8 target bins by a running-sum cut (bin = bytes-before × 8
        // div compactable-bytes) — each bin lands within one file-size of
        // total/8, and the assignment drives a repartition-by-bin rewrite.
        // The ordered window is metadata-scale (millions of manifest rows
        // at worst, partitionable by table partition) — the DATA-scale
        // work stays in the rewrite job this plan feeds.
        val m = Tables.cachedTable(s, d, "orders")
          .groupBy((col("o_orderkey") % 512).as("file_id"))
          .agg(sum(lit(32) + length(col("o_orderpriority")) +
            length(col("o_orderstatus"))).as("size_bytes"))
        val t = m.agg(sum(col("size_bytes")).as("total"),
          count(lit(1)).as("nf"))
        val f = m.crossJoin(broadcast(t))
          .withColumn("small",
            when(col("size_bytes") * col("nf") < col("total"), 1).otherwise(0))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("file_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val c = f.filter(col("small") === 1)
          .withColumn("cum_before", coalesce(sum(col("size_bytes")).over(w), lit(0L)))
        val ct = c.agg(sum(col("size_bytes")).as("ctotal"))
        val packed = c.crossJoin(broadcast(ct))
          .select(col("file_id"), col("size_bytes"), lit(1L).as("compact"),
            expr("cum_before * 8L div ctotal").cast("long").as("bin"))
        val kept = f.filter(col("small") === 0)
          .select(col("file_id"), col("size_bytes"), lit(0L).as("compact"),
            lit(-1L).as("bin"))
        packed.unionByName(kept)
    }
  )
}
