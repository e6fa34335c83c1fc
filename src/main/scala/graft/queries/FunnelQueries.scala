package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multi-gate curation loss accounting — the report a pipeline owner reads
  * before anything trains: per language, how many documents survive each
  * quality gate and the whole chain.
  *
  * Deliberately COMPOSED, not re-implemented: the Spark side calls the four
  * declared gate queries (whose frames ride their shared caches — tf agg,
  * bigram-occ), and the DuckDB oracle embeds the sibling keys' own oracle
  * SQL as subqueries, so the funnel can never drift from the gates it
  * reports on — if a gate's definition changes, the funnel follows in BOTH
  * engines by construction.
  */
object FunnelQueries {

  private def gateFn(all: Seq[Q], name: String) = all.find(_.name == name).get.fn
  private def gateSql(all: Seq[Q], name: String) =
    all.find(_.name == name).get.oracle.get

  def all: Seq[Q] = Seq(
    Q("curation_funnel", {
      val g = gateSql(TextAnalysisQueries.all, "quality_gopher")
      val p = gateSql(TextAnalysisQueries.all, "quality_perplexity")
      val i = gateSql(TextAnalysisQueries.all, "dsir_importance")
      val f = gateSql(CurationQueries.all, "quality_filter")
      s"""SELECT d.lang,
         |       COUNT(*) AS n_docs,
         |       CAST(sum(f.keep) AS BIGINT) AS n_quality,
         |       CAST(sum(g.keep) AS BIGINT) AS n_gopher,
         |       CAST(sum(p.keep) AS BIGINT) AS n_perplexity,
         |       CAST(sum(i.keep) AS BIGINT) AS n_dsir,
         |       CAST(sum(f.keep * g.keep * p.keep * i.keep) AS BIGINT) AS n_all
         |FROM documents d
         |JOIN ($f) f USING (doc_id)
         |JOIN ($g) g USING (doc_id)
         |JOIN ($p) p USING (doc_id)
         |JOIN ($i) i USING (doc_id)
         |GROUP BY 1""".stripMargin
    }) { (s, d) =>
      // Every gate emits one row per doc (left-join-complete by their own
      // contracts), so the funnel joins are inner and count-preserving.
      // 100 TB shape: four doc_id-keyed equi-joins of keep-bit frames that
      // each reuse already-shared intermediates — the funnel itself adds
      // only id+bit shuffles and a lang-sized rollup.
      def keep(all: Seq[Q], name: String) =
        gateFn(all, name)(s, d).select(col("doc_id"), col("keep"))
      val docs = Tables.cachedTable(s, d, "documents").select("doc_id", "lang")
      docs
        .join(keep(CurationQueries.all, "quality_filter")
          .withColumnRenamed("keep", "kf"), "doc_id")
        .join(keep(TextAnalysisQueries.all, "quality_gopher")
          .withColumnRenamed("keep", "kg"), "doc_id")
        .join(keep(TextAnalysisQueries.all, "quality_perplexity")
          .withColumnRenamed("keep", "kp"), "doc_id")
        .join(keep(TextAnalysisQueries.all, "dsir_importance")
          .withColumnRenamed("keep", "ki"), "doc_id")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("kf").as("n_quality"),
          sum("kg").as("n_gopher"),
          sum("kp").as("n_perplexity"),
          sum("ki").as("n_dsir"),
          sum(col("kf") * col("kg") * col("kp") * col("ki")).as("n_all"))
    }
  )
}
