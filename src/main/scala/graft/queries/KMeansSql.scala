package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.VectorOps

/** The single parity point for the IVF quantizer family: the tuning
  * constants, the shared Spark-side cached codebook/assignment builder,
  * AND the DuckDB CTE chain replaying
  * [[graft.operators.VectorOps.kmeansCodebook]] step for step. Kept in one
  * place because two declared queries (dedup_embed_ivf, sim_search_ivf)
  * share the codebook — both the Scala calls and the oracle SQL derive
  * every knob from the constants below, so a default change cannot
  * silently break Spark/oracle parity (r5 advice: the SQL hardcoded `sc2`
  * and `rn <= 4`, coupled only by convention).
  *
  * Parity contract with the Scala side (any drift fails the hash gate):
  *   - p is 1-based here, 0-based in Spark — only ever joined within one
  *     engine, so the offset is invisible;
  *   - every cross-row sum goes through CAST(... AS DECIMAL(27,12)) per
  *     term (exact, order-free), then CAST AS DOUBLE — identical rounding
  *     in both engines;
  *   - seed ranking is pure integer arithmetic ((vec_id % 2147483647) *
  *     2654435761 % 2^32, ties by vec_id), bucket split is integer floor
  *     division — no floats anywhere near the seed choice;
  *   - affinity ranking = dot/sqrt(csq) DESC, ties by cell — two IEEE ops
  *     on exactly-derived doubles, so the row_number order matches.
  */
private[graft] object KMeansSql {

  /** Cell-count cap: k = min(KCap, ceil(sqrt(n))). */
  val KCap = 24
  /** Fixed Lloyd rounds (no data-dependent stopping — determinism). */
  val Iters = 2
  /** Floor on probe cells for the pair-dedup family (dedup_embed_ivf). */
  val NProbeDedupMin = 4
  /** √n divisor for the dedup probe count — see [[nProbeDedup]]. */
  val NProbeDiv = 8.0
  /** Probe cells for the single-probe ANN query (sim_search_ivf). */
  val NProbeSearch = 3

  /** Probe cells for the pair-dedup family, scaled with corpus size:
    * max(NProbeDedupMin, ⌈√n / NProbeDiv⌉). Once k hits its [[KCap]] the
    * cell count stops growing with n, so a FIXED probe count decays in
    * recall as the corpus grows (measured at tau = 0.4: nprobe = 4 gave
    * recall 1.00 at n = 500 but 0.91 at n = 2000). Growing probes with √n
    * restores it: this rule gives 4 at n = 500 (recall 1.00) and 6 at
    * n = 2000 (recall 0.9935 ≥ the 0.95 floor PipelineSpec pins). The
    * oracle derives the same count in SQL from its `params` CTE
    * ([[nProbeDedupSql]]) so Spark/DuckDB parity is structural.
    */
  def nProbeDedup(n: Long): Int =
    math.max(NProbeDedupMin, math.ceil(math.sqrt(n.toDouble) / NProbeDiv).toInt)

  /** The SQL twin of [[nProbeDedup]] — a scalar subquery over the `params`
    * CTE emitted by [[codebookCtes]]; splice into `WHERE rn <= ...`.
    */
  def nProbeDedupSql: String =
    s"(SELECT greatest($NProbeDedupMin, CAST(ceil(sqrt(n) / $NProbeDiv) AS INT)) FROM params)"

  /** Deepest rank any consumer reads for corpus size n — the shared
    * assignment keeps rn ≤ this.
    */
  def maxRn(n: Long): Int = math.max(nProbeDedup(n), NProbeSearch)

  /** Name of the final affinity-ranking CTE emitted by [[codebookCtes]] —
    * consumers MUST read the scored assignment from here, never from a
    * hardcoded `sc2`.
    */
  def scoredCte(iters: Int = Iters): String = s"sc$iters"

  /** Shared Spark-side scored assignment (vec_id, cell, rn ≤ MaxRn), built
    * ONCE per (session, dir) and cached: one embeddings count (to derive
    * k), one codebook build (materialized LocalRelation — see
    * kmeansCodebook), one full-corpus scoring pass. dedup_embed_ivf and
    * sim_search_ivf both filter this table, mirroring how their oracle SQL
    * both read `scoredCte()` — r5 built the whole iterative codebook DAG
    * independently per consumer branch (60× sim_search_ivf regression).
    */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/ivf-scored/k=$KCap/iters=$Iters/maxrn=sqrtn$NProbeDiv") {
      val emb = Tables.cachedTable(spark, dir, "embeddings")
      // keepAffinity: the scoring pass already computes the cosine — caching
      // it costs one extra double column and saves embed_cluster_inertia a
      // full re-scoring pass (measured 5.1s → assignment-read at sf0.1).
      VectorOps.scoredCells(emb, codebook(spark, dir), maxRn(emb.count()),
        keepAffinity = true)
    }

  /** The shared IVF coarse codebook — a materialized LocalRelation, built
    * once per (session, dir); assignments and the cluster-quality report
    * (embed_cluster_inertia) are two consumers of one Lloyd build.
    */
  def codebook(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/ivf-codebook/k=$KCap/iters=$Iters") {
      val emb = Tables.cachedTable(spark, dir, "embeddings")
      val k = math.min(KCap, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
      VectorOps.kmeansCodebook(emb, k, Iters)
    }

  /** Dedup-grade cosine threshold for the IVF pair family. */
  val DedupTau = 0.4

  /** The shared IVF near-dup pair list (vec_a < vec_b, cos_sim ≥ tau),
    * built ONCE per (session, dir) over [[assignments]] and cached: the
    * pair REPORT (dedup_embed_ivf) and the keep/drop MATERIALIZATION
    * (dedup_semantic) are two consumers of the same pair computation — at
    * 100 TB the pair list is the persisted intermediate a dedup job
    * writes, not something each downstream report re-joins the corpus
    * for.
    */
  def dedupPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/ivf-pairs/tau=$DedupTau/nprobe=sqrtn$NProbeDiv") {
      import org.apache.spark.sql.functions.col
      val n = Tables.cachedTable(spark, dir, "embeddings").count()
      val assign = assignments(spark, dir).filter(col("rn") <= nProbeDedup(n))
      VectorOps.pairsByAssignment(
        Tables.cachedTable(spark, dir, "embeddings"), assign, tau = DedupTau)
    }

  /** Incremental-ingest embedding dedup — the daily-batch twin of
    * [[dedupPairs]] (and the embeddings mirror of dedup_delta's winnow
    * shape): today's arrivals (the deterministic 10% shard
    * `vec_id % 10 = 7`) probe the STORED index of the existing corpus
    * only, never each other. The batch side carries its `NProbeDedup`
    * probe cells (from the shared cached [[assignments]]); the corpus
    * side is the once-built home-cell [[index]] (rn = 1, one row per old
    * vector). Each (new, old) pair can meet in at most one cell — the old
    * vector is stored under exactly one home cell — so no distinct is
    * needed and the exact cosine verifies in the join's codegen stage.
    *
    * At 100 TB: the index is the bucketed-by-cell table a nightly job
    * appends to; the batch (probe cells + vectors, batch-sized) is
    * BROADCAST into it, so the day's dedup reads the index in place with
    * zero corpus shuffle and batch-sized fan-in.
    */
  def deltaPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val nAll = Tables.cachedTable(spark, dir, "embeddings").count()
    val newShard = col("vec_id") % 10 === 7
    val probeCells = assignments(spark, dir)
      .filter(col("rn") <= nProbeDedup(nAll) && newShard)
      .select(col("vec_id"), col("cell"))
    val batch = Tables.cachedTable(spark, dir, "embeddings")
      .filter(newShard)
      .select(col("vec_id"), col("embedding").as("va"))
      .withColumn("nrm_a", sqrt(VectorOps.normSqF(col("va"))))
      .join(broadcast(probeCells), Seq("vec_id"))
      .select(col("vec_id").as("new_id"), col("cell"), col("va"), col("nrm_a"))
    val stored = index(spark, dir)
      .filter(!newShard)
      .select(col("vec_id").as("old_id"), col("cell"), col("embedding").as("vb"))
      .withColumn("nrm_b", sqrt(VectorOps.normSqF(col("vb"))))
    broadcast(batch).join(stored, Seq("cell"))
      .withColumn("cos_raw",
        VectorOps.dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos_raw") >= DedupTau)
      .select(col("new_id"), col("old_id"), round(col("cos_raw"), 5).as("cos_sim"))
  }

  /** The materialized IVF index: every corpus vector stored under its home
    * cell (rn = 1) — embeddings columns + `cell`. Cached per (session,
    * dir). At 100 TB this is the corpus written bucketed/partitioned by
    * cell (build once, amortized over all queries); a search then reads
    * only its broadcast probe cells — no corpus shuffle per query.
    */
  def index(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/ivf-index/k=$KCap/iters=$Iters") {
      import org.apache.spark.sql.functions.col
      Tables.cachedTable(spark, dir, "embeddings").join(
        assignments(spark, dir).filter(col("rn") === 1).select("vec_id", "cell"),
        Seq("vec_id"))
    }

  // -- product quantization ------------------------------------------------

  /** Subspace count for the PQ family (dim must divide evenly). */
  val PqM = 4
  /** Per-subspace cell cap: k = min(PqKCap, ceil(sqrt(n))). */
  val PqKCap = 16
  /** Fixed Lloyd rounds per subspace (determinism, cf. [[Iters]]). */
  val PqIters = 2
  /** Probe id for the declared ADC search (house probe, cf. sim_search_topk). */
  val PqProbeId = 0L

  /** The shared PQ codebook (sub, cell, sp, c), built ONCE per
    * (session, dir) — a materialized LocalRelation, trivially broadcast.
    */
  def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/pq-codebook/m=$PqM/k=$PqKCap/iters=$PqIters") {
      VectorOps.pqCodebook(
        Tables.cachedTable(spark, dir, "embeddings"), PqM, PqKCap, PqIters)
    }

  /** The materialized PQ code index: ONE row per vector with its m cell
    * codes pivoted wide (c0..c{m-1}) — FAISS's contiguous code layout.
    * Built once per (session, dir); the per-vector pivot agg is part of
    * the INDEX build (amortized), so an ADC query is one scan of this
    * narrow table + m broadcast lookup joins — zero per-query corpus
    * shuffle. At 100 TB this is the codes table a nightly job writes
    * (m bytes of cell ids per vector vs 4·dim bytes of floats — the
    * 64× memory cut that makes billion-scale ANN fit in RAM).
    */
  def pqCodesWide(spark: SparkSession, dir: String): DataFrame =
    Tables.cached(spark, s"$dir/pq-codes/m=$PqM/k=$PqKCap/iters=$PqIters") {
      import org.apache.spark.sql.functions.first
      VectorOps.pqCodes(
        Tables.cachedTable(spark, dir, "embeddings"), pqCodebook(spark, dir))
        .groupBy("vec_id")
        .pivot("sub", 0 until PqM)
        .agg(first("cell"))
        .toDF("vec_id" +: (0 until PqM).map(i => s"c$i"): _*)
    }

  /** CTEs from `e` through the per-subspace codebook chain — the PQ twin
    * of [[codebookCtes]], replaying [[VectorOps.pqCodebook]] step for
    * step with `sub` added to every key. Final CTEs: `cent{iters}`
    * (sub, cell, sp, c) and `sc{iters}` (vec_id, sub, cell, rn) — codes
    * are `sc{iters} WHERE rn = 1`. Consumers append their tail after
    * this block.
    */
  def pqCtes(m: Int = PqM, kCap: Int = PqKCap, iters: Int = PqIters): String = {
    val head =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |params AS (SELECT count(*) AS n,
         |                  least($kCap, CAST(ceil(sqrt(count(*))) AS INT)) AS k FROM e),
         |dims AS (SELECT max(len(v)) AS dim FROM e),
         |pos0 AS (
         |  SELECT vec_id, unnest(generate_series(1, len(v))) AS p, unnest(v) AS x
         |  FROM e),
         |nsq AS (SELECT vec_id, CAST(sum(CAST(x*x AS DECIMAL(27,12))) AS DOUBLE) AS n2
         |        FROM pos0 GROUP BY 1),
         |posq AS (SELECT pos0.vec_id,
         |                CAST((p - 1) // (dim // $m) AS INT) AS sub,
         |                CAST((p - 1) % (dim // $m) AS INT) AS sp,
         |                x / sqrt(nsq.n2) AS x
         |         FROM pos0 JOIN nsq USING (vec_id), dims),
         |rk AS (SELECT vec_id, row_number() OVER (
         |         ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296, vec_id) AS rn
         |       FROM e),
         |seeds AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, ((rn - 1) * k) // n AS cell,
         |         row_number() OVER (PARTITION BY ((rn - 1) * k) // n ORDER BY rn) AS pick
         |  FROM rk, params) WHERE pick = 1),
         |cent0 AS (SELECT p.sub, s.cell, p.sp, p.x AS c
         |          FROM seeds s JOIN posq p ON p.vec_id = s.vec_id)""".stripMargin
    val rounds = (0 to iters).map { i =>
      val score =
        s""",
           |csq$i AS (SELECT sub, cell,
           |                 CAST(sum(CAST(c*c AS DECIMAL(27,12))) AS DOUBLE) AS csq
           |          FROM cent$i GROUP BY 1, 2),
           |dot$i AS (SELECT posq.vec_id, cent$i.sub, cent$i.cell,
           |                 CAST(sum(CAST(posq.x*cent$i.c AS DECIMAL(27,12))) AS DOUBLE) AS dot
           |          FROM posq JOIN cent$i USING (sub, sp) GROUP BY 1, 2, 3),
           |sc$i AS (SELECT d.vec_id, d.sub, d.cell,
           |                row_number() OVER (PARTITION BY d.vec_id, d.sub
           |                  ORDER BY d.dot / sqrt(c.csq) DESC, d.cell) AS rn
           |         FROM dot$i d JOIN csq$i c USING (sub, cell))""".stripMargin
      val update = if (i == iters) "" else
        s""",
           |cent${i + 1} AS (SELECT a.sub, a.cell, p.sp,
           |                  CAST(sum(CAST(p.x AS DECIMAL(27,12))) AS DOUBLE)/count(*) AS c
           |           FROM (SELECT vec_id, sub, cell FROM sc$i WHERE rn = 1) a
           |           JOIN posq p USING (vec_id, sub) GROUP BY 1, 2, 3)""".stripMargin
      score + update
    }.mkString
    head + rounds
  }

  /** CTEs from `e` (vec_id, v DOUBLE[]) through `sc{iters}` — the final
    * (vec_id, cell, rn) affinity ranking over the converged codebook.
    * Consumers append their own CTEs / final SELECT after this block.
    */
  def codebookCtes(kCap: Int = KCap, iters: Int = Iters): String = {
    val head =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |params AS (SELECT count(*) AS n,
         |                  least($kCap, CAST(ceil(sqrt(count(*))) AS INT)) AS k FROM e),
         |pos0 AS (
         |  SELECT vec_id, unnest(generate_series(1, len(v))) AS p, unnest(v) AS x
         |  FROM e),
         |nsq AS (SELECT vec_id, CAST(sum(CAST(x*x AS DECIMAL(27,12))) AS DOUBLE) AS n2
         |        FROM pos0 GROUP BY 1),
         |pos AS (SELECT pos0.vec_id, p, x / sqrt(nsq.n2) AS x
         |        FROM pos0 JOIN nsq USING (vec_id)),
         |rk AS (SELECT vec_id, row_number() OVER (
         |         ORDER BY ((vec_id % 2147483647) * 2654435761) % 4294967296, vec_id) AS rn
         |       FROM e),
         |seeds AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, ((rn - 1) * k) // n AS cell,
         |         row_number() OVER (PARTITION BY ((rn - 1) * k) // n ORDER BY rn) AS pick
         |  FROM rk, params) WHERE pick = 1),
         |cent0 AS (SELECT s.cell, p.p, p.x AS c
         |          FROM seeds s JOIN pos p ON p.vec_id = s.vec_id)""".stripMargin
    val rounds = (0 to iters).map { i =>
      val score =
        s""",
           |csq$i AS (SELECT cell, CAST(sum(CAST(c*c AS DECIMAL(27,12))) AS DOUBLE) AS csq
           |          FROM cent$i GROUP BY 1),
           |dot$i AS (SELECT pos.vec_id, cent$i.cell,
           |                 CAST(sum(CAST(pos.x*cent$i.c AS DECIMAL(27,12))) AS DOUBLE) AS dot
           |          FROM pos JOIN cent$i USING (p) GROUP BY 1, 2),
           |sc$i AS (SELECT d.vec_id, d.cell,
           |                row_number() OVER (PARTITION BY d.vec_id
           |                  ORDER BY d.dot / sqrt(c.csq) DESC, d.cell) AS rn
           |         FROM dot$i d JOIN csq$i c USING (cell))""".stripMargin
      val update = if (i == iters) "" else
        s""",
           |cent${i + 1} AS (SELECT a.cell, p.p,
           |                  CAST(sum(CAST(p.x AS DECIMAL(27,12))) AS DOUBLE)/count(*) AS c
           |           FROM (SELECT vec_id, cell FROM sc$i WHERE rn = 1) a
           |           JOIN pos p USING (vec_id) GROUP BY 1, 2)""".stripMargin
      score + update
    }.mkString
    head + rounds
  }

  /** [[codebookCtes]] with every CTE NAME prefixed and the leading `WITH `
    * stripped — lets one oracle splice the IVF chain NEXT TO the PQ chain
    * (both otherwise emit the same base names: e, params, pos0, …). The
    * rename is mechanical (\b-guarded whole-word replace over the closed
    * CTE-name list); column names (cell, dot, csq, p, …) are not in the
    * list, so they stay untouched — any slip fails the sim_search_ivf_pq
    * hash gate immediately.
    */
  def codebookCtesPrefixed(prefix: String, kCap: Int = KCap,
                           iters: Int = Iters): String = {
    val names = Seq("e", "params", "pos0", "nsq", "pos", "rk", "seeds") ++
      (0 to iters).flatMap(i => Seq(s"cent$i", s"csq$i", s"dot$i", s"sc$i"))
    var sql = codebookCtes(kCap, iters).stripPrefix("WITH ")
    for (n <- names.sortBy(-_.length))
      sql = sql.replaceAll(s"\\b$n\\b", prefix + n)
    sql
  }
}
