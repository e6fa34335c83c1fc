package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.TextOps

/** Corpus-curation surface: the selection/retention steps a training-data
  * pipeline runs AFTER the signal extractors (text_quality, dedup_*) —
  * eval-set decontamination, deterministic stratified sampling, and a
  * C4-style keep/drop quality gate.
  *
  * Determinism: decisions are integer comparisons (cross-multiplied
  * ratios, never double thresholds on divided values), ranks are sha256
  * hash orders tie-broken on the unique doc_id — both engines replay them
  * bit-for-bit.
  */
object CurationQueries {

  /** Eval doc ids: the fixture's stand-in benchmark suite. */
  private val EvalMaxId = 5
  /** Distinct shared 3-gram shingles needed to flag contamination. */
  private val MinShared = 2
  /** Per-language sample size. */
  private val SampleK = 20
  /** quality_filter gates: tokens >= MinTokens AND distinct-token ratio
    * >= DistinctNum/DistinctDen (compared via cross-multiplication).
    */
  private val MinTokens = 20
  private val (distinctNum, distinctDen) = (2, 5) // ratio >= 0.4

  def all: Seq[Q] = Seq(

    Q("decontaminate",
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(
         |           CASE WHEN len(toks) < 3 THEN []
         |                ELSE list_transform(generate_series(1, len(toks) - 2),
         |                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)) AS sh
         |  FROM t),
         |ev AS (SELECT doc_id AS eval_id, sh FROM g WHERE doc_id < $EvalMaxId),
         |tr AS (SELECT doc_id, sh FROM g WHERE doc_id >= $EvalMaxId)
         |SELECT tr.doc_id, ev.eval_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM tr JOIN ev USING (sh)
         |GROUP BY 1, 2 HAVING count(*) >= $MinShared""".stripMargin) {
      (s, d) =>
        // Benchmark decontamination: flag corpus docs sharing >= MinShared
        // distinct 3-gram shingles with any eval-set doc. The eval side is
        // always tiny (a benchmark suite, not a corpus), so it rides a
        // BROADCAST into a single corpus pass; only the matching
        // (doc, eval, shingle) hits — never the corpus — reach the
        // pair-count shuffle. At 100 TB: same plan, eval shingle set built
        // once and broadcast to every executor.
        val g = Tables.cachedTable(s, d, "documents")
          .select(col("doc_id"),
            explode(array_distinct(TextOps.trigrams(TextOps.tokens(col("text"))))).as("sh"))
        val ev = g.filter(col("doc_id") < EvalMaxId)
          .select(col("doc_id").as("eval_id"), col("sh"))
        g.filter(col("doc_id") >= EvalMaxId)
          .join(broadcast(ev), "sh")
          .groupBy("doc_id", "eval_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MinShared)
    },

    Q("sample_stratified",
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16), doc_id) AS rank
         |  FROM documents)
         |SELECT lang, doc_id, CAST(rank AS BIGINT) AS rank
         |FROM h WHERE rank <= $SampleK""".stripMargin) {
      (s, d) =>
        // Deterministic stratified sample: SampleK docs per language by
        // sha256(doc_id) hash rank (stable across re-runs and backfills —
        // never rand()). Two-phase top-k per group: at 100 TB a window
        // partitioned by lang alone would funnel each language's entire
        // corpus through one task; the bucketed local top-k bounds every
        // task at k rows before the per-group merge.
        val docs = Tables.cachedTable(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            substring(sha2(col("doc_id").cast("string"), 256), 1, 16).as("h"))
        TextOps.topKPerGroup(docs, Seq("lang"),
          Seq(col("h"), col("doc_id")), k = SampleK, bucketOn = col("doc_id"))
          .select(col("lang"), col("doc_id"), col("rank"))
    },

    Q("quality_filter",
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
         |sig AS (SELECT doc_id, lang, len(toks) AS n_tokens,
         |               len(list_distinct(toks)) AS n_distinct FROM t)
         |SELECT doc_id, lang,
         |       CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(n_distinct AS BIGINT) AS n_distinct,
         |       CAST(CASE WHEN n_tokens < $MinTokens THEN 0
         |                 WHEN n_distinct * $distinctDen < n_tokens * $distinctNum THEN 0
         |                 ELSE 1 END AS BIGINT) AS keep,
         |       CASE WHEN n_tokens < $MinTokens THEN 'too_short'
         |            WHEN n_distinct * $distinctDen < n_tokens * $distinctNum THEN 'low_diversity'
         |            ELSE 'ok' END AS reason
         |FROM sig""".stripMargin) {
      (s, d) =>
        // C4/Gopher-style quality gate: keep/drop + first-failing-rule
        // reason per doc. Decisions are INTEGER comparisons (the
        // distinct-token-ratio threshold is cross-multiplied, never a
        // double division compared to 0.4), so the verdict is
        // engine-exact. Pure per-row projection + two array ops — a
        // single corpus scan with no shuffle at any scale.
        val toks = TextOps.tokens(col("text"))
        Tables.cachedTable(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_distinct"))
          .withColumn("keep",
            when(col("n_tokens") < MinTokens, 0L)
              .when(col("n_distinct") * distinctDen < col("n_tokens") * distinctNum, 0L)
              .otherwise(1L))
          .withColumn("reason",
            when(col("n_tokens") < MinTokens, "too_short")
              .when(col("n_distinct") * distinctDen < col("n_tokens") * distinctNum, "low_diversity")
              .otherwise("ok"))
    }
  )
}
