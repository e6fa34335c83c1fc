package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-layout planning — the table-maintenance side of a 100 TB store:
  * which rows land in which file, and what the resulting per-file column
  * ranges (= parquet footer min/max stats) let a scan skip.
  */
object LayoutQueries {

  /** Bit-interleave of the low 16 bits of two columns (Morton/Z-order
    * curve): p's bit i lands at position 2i+1, s's at 2i. Pure integer
    * shift/mask arithmetic, whole-stage-codegen'd, and regenerated
    * verbatim in the DuckDB oracle.
    */
  private def zValue(p: Column, s: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(p, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  private def zValueSql(p: String, s: String): String =
    (0 until 16).map { i =>
      s"((($p >> $i) & 1) << ${2 * i + 1}) + ((($s >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  def all: Seq[Q] = Seq(

    Q("sort_zorder",
      s"""WITH b AS (SELECT l_partkey & 65535 AS p16, l_suppkey & 65535 AS s16
         |           FROM lineitem),
         |z AS (SELECT p16, s16, ${zValueSql("p16", "s16")} AS zv FROM b),
         |m AS (SELECT max(zv) AS zmax, max(p16) AS pmax FROM z),
         |a AS (SELECT p16, s16,
         |             zv * 64 // (zmax + 1) AS zb,
         |             p16 * 64 // (pmax + 1) AS lb
         |      FROM z, m)
         |SELECT 'zorder' AS layout, CAST(zb AS BIGINT) AS file_id,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       min(p16) AS p_min, max(p16) AS p_max,
         |       min(s16) AS s_min, max(s16) AS s_max
         |FROM a GROUP BY 2
         |UNION ALL
         |SELECT 'linear', CAST(lb AS BIGINT),
         |       CAST(count(*) AS BIGINT),
         |       min(p16), max(p16), min(s16), max(s16)
         |FROM a GROUP BY 2""".stripMargin) { (s, d) =>
      // Z-order layout planner: assign every row to one of 64 target files
      // by Morton z-value over (l_partkey, l_suppkey), and report each
      // file's min/max in BOTH dimensions — exactly the parquet footer
      // stats a scan's data-skipping consults. The 'linear' rows are the
      // control (sort by partkey alone): its files span the FULL suppkey
      // range, so a suppkey predicate skips nothing, while the z-order
      // files bound both dimensions (~sqrt(n) span each) and prune 2-D
      // point/range queries. File cut = value-based integer division on
      // the z-value (exact in both engines, no data-dependent quantiles,
      // no global sort in the report). At 100 TB the write path is
      // repartitionByRange(zv).sortWithinPartitions(zv) — one range
      // shuffle, the same one a plain sorted write pays — making this the
      // free 2-D upgrade of a 1-D layout; only the 64-file census ever
      // aggregates here.
      val li = Tables.cachedTable(s, d, "lineitem")
      val base = li.select(
        col("l_partkey").bitwiseAND(lit(65535L)).as("p16"),
        col("l_suppkey").bitwiseAND(lit(65535L)).as("s16"))
        .withColumn("zv", zValue(col("p16"), col("s16")))
      val mx = base.agg(max(col("zv")).as("zmax"), max(col("p16")).as("pmax"))
      val a = base.crossJoin(broadcast(mx))
        .withColumn("zb", expr("zv * 64L div (zmax + 1)"))
        .withColumn("lb", expr("p16 * 64L div (pmax + 1)"))
      def census(name: String, bucket: String): DataFrame =
        a.groupBy(col(bucket).cast("long").as("file_id"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min(col("p16")).as("p_min"), max(col("p16")).as("p_max"),
            min(col("s16")).as("s_min"), max(col("s16")).as("s_max"))
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
