package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.FloatVecDot

/** Embedding-column kernels: cosine similarity, brute-force and blocked
  * similarity search, centroid hygiene. SURVEY.md §2.C.
  *
  * Arithmetic discipline (cross-engine determinism, SURVEY §7.5):
  *   - float elements are widened to double (exact) before any arithmetic;
  *   - per-row reductions are sequential left folds (`aggregate`), which
  *     match DuckDB's list kernels bit-for-bit (verified empirically);
  *   - cross-row reductions (centroids) go through DECIMAL sums, which are
  *     exact and order-independent — a double sum across shuffle partitions
  *     would not even be deterministic run-to-run;
  *   - cosine = dot / (sqrt(na) * sqrt(nb)) — NOT sqrt(na*nb), which
  *     differs in the last ulp from DuckDB's list_cosine_similarity.
  */
object VectorOps {

  /** Exact double widening of an array<float> column. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sequential-fold sum of squares. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** Cosine similarity of two array<double> columns, bit-compatible with
    * DuckDB `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Native codegen'd dot product over RAW array<float> columns — the hot
    * kernel for similarity joins (see [[graft.functions.FloatVecDot]] for
    * why the HOF and unrolled-scalar alternatives are each ~10x slower).
    */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native sum of squares over a raw array<float>. */
  def normSqF(a: Column): Column = dotF(a, a)

  /** Brute-force top-k cosine neighbors of one probe vector. The probe side
    * is a 1-row broadcast, so the scan is a single embarrassing-parallel
    * pass + TakeOrderedAndProject — no shuffle of the corpus. This is the
    * correct plan for a single probe even at 100 TB; for probe *batches*
    * use [[cosineJoinThreshold]]-style blocking or an ANN index (IVF: block
    * on a coarse-quantizer cell id; LSH: random-hyperplane bucket key) so
    * candidate generation stays sub-quadratic.
    */
  def topKByCosine(emb: DataFrame, probeId: Long, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).as("v"))
    val p = e.filter(col(idCol) === probeId).select(col("v").as("pv"))
    val cos = dotF(col("v"), col("pv")) /
      (sqrt(normSqF(col("v"))) * sqrt(normSqF(col("pv"))))
    e.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(p))
      .select(col(idCol), round(cos, 5).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** All pairs with cosine >= tau, blocked on `blockCol` (e.g. a cluster /
    * label / coarse-quantizer id) so candidate generation is bounded by the
    * largest block, never the full cross product. Exact within blocks — the
    * same contract as [[TextOps.nearDupPairs]]; at 100 TB the block key
    * comes from an IVF/LSH assignment instead of a given label.
    */
  // Shuffle budget: one block-keyed self-join (narrow: id, block, float
  // array, one precomputed norm double per side); no aggregation.
  def cosineJoinThreshold(emb: DataFrame, tau: Double,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          blockCol: String = "label"): DataFrame = {
    // Norms are precomputed once per vector (the naive per-pair cosine
    // recomputes both norm folds for every pair — 3x the arithmetic);
    // dot/(sqrt(na)*sqrt(nb)) is preserved operation-for-operation, so
    // results stay bit-identical to DuckDB's list_cosine_similarity. Raw
    // float arrays stay on the wire; the native kernel widens per element.
    val e = emb.select(col(idCol), col(blockCol), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(normSqF(col("v"))))
    val a = e.select(
      col(idCol).as("vec_a"), col(blockCol).as("block_a"),
      col("v").as("va"), col("nrm").as("nrm_a"))
    val b = e.select(
      col(idCol).as("vec_b"), col(blockCol).as("block_b"),
      col("v").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, col("block_a") === col("block_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos_raw") >= tau)
      .select(
        col("vec_a"), col("vec_b"), col("block_a").as("label"),
        round(col("cos_raw"), 5).as("cos_sim"))
  }

  /** IVF-style coarse-quantizer assignment: each vector goes to its
    * `nprobe` highest-affinity cells, where the codebook is the per-label
    * DECIMAL-exact centroid table (at 100 TB: a k-means codebook — same
    * shape, tiny either way, broadcast) and affinity is the DECIMAL-exact
    * dot with the centroid (order-free sums, so the row_number ranking is
    * deterministic and engine-portable; ties broken by cell id).
    *
    * The assignment deliberately IGNORES the vector's own label: two
    * cross-label neighbours land in the same cell whenever they both sit
    * closest to it, which pure label blocking can never achieve (measured
    * at sf0.01: 54 of the 59 cosine≥0.4 pairs are cross-label).
    *
    * Shuffle budget: posexplode → (cell,p)-keyed centroid agg (codebook,
    * broadcast back) + one (vec,cell) affinity agg + one per-vector top-k
    * window. Vectors never ride a shuffle — only (id, pos, scalar) rows.
    */
  def quantizerAssign(emb: DataFrame, nprobe: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      labelCol: String = "label"): DataFrame = {
    val dec = DecimalType(27, 12)
    val pos = emb.select(
      col(idCol), col(labelCol),
      posexplode(toDouble(col(vecCol))).as(Seq("p", "x")))
    val cent = pos.groupBy(col(labelCol).as("cell"), col("p"))
      .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
    val aff = pos.drop(labelCol).join(broadcast(cent), Seq("p"))
      .groupBy(col(idCol), col("cell"))
      .agg(sum((col("x") * col("c")).cast(dec)).cast("double").as("a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("a").desc, col("cell"))
    aff.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col(idCol), col("cell"))
  }

  /** Embedding near-dup pairs blocked by the coarse quantizer instead of
    * the semantic label — the 100 TB path for [[cosineJoinThreshold]]:
    * candidates = pairs sharing ≥1 of their `nprobe` assigned cells
    * (recall is tuned by cell count × nprobe, exactly like an IVF index),
    * then the exact codegen'd cosine verifies each candidate. With this
    * corpus's 10 coarse cells and nprobe=2, candidates are ~37% of the
    * quadratic and recall vs the naive all-pairs truth is ~56% at τ=0.4 —
    * the knobs to raise both are more/finer cells (√n cells at scale),
    * which the 10 given labels cap here.
    */
  def dedupByQuantizer(emb: DataFrame, tau: Double, nprobe: Int = 2,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    // Verify INSIDE the cell join: with coarse cells the candidate set is
    // orders of magnitude larger than the surviving pair set (sf0.1:
    // ~4.6M candidates -> 623 pairs), so distinct-then-fetch would
    // shuffle millions of pair rows and then re-attach vectors with two
    // more joins. Attaching vectors to the (id, cell) assignment rows
    // first keeps the dot + threshold streaming through the join's
    // codegen stage — candidates never hit a shuffle — and the final
    // distinct (for pairs colliding in both probe cells) handles only
    // rows that already passed tau.
    val assign = quantizerAssign(emb, nprobe, idCol, vecCol, labelCol)
    val e = emb.select(col(idCol), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(normSqF(col("v"))))
    val av = assign.join(e, idCol)
    val a = av.select(col(idCol).as("vec_a"), col("cell"),
      col("v").as("va"), col("nrm").as("nrm_a"))
    val b = av.select(col(idCol).as("vec_b"), col("cell"),
      col("v").as("vb"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", dotF(col("va"), col("vb")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos_raw") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 5).as("cos_sim"))
      .distinct()
  }

  /** Embedding-column hygiene report: per vector its dimensionality, L2
    * norm, and Euclidean distance to its label's centroid.
    *
    * Centroid = per-(label, position) mean via posexplode + DECIMAL(27,12)
    * sums (exact, order-free → deterministic under shuffle), then rejoined
    * to the exploded elements; the per-vector distance sum goes through the
    * same decimal discipline. Two shuffles total (centroid agg + rejoin
    * agg); both shuffle only (id/label, pos, scalar) triples, never whole
    * vectors.
    */
  def centroidHygiene(emb: DataFrame,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      labelCol: String = "label"): DataFrame = {
    val dec = DecimalType(27, 12)
    val e = emb.select(col(idCol), col(labelCol), toDouble(col(vecCol)).as("v"))
    val pos = e.select(
      col(idCol), col(labelCol),
      posexplode(col("v")).as(Seq("p", "x")))
    val cent = pos.groupBy(col(labelCol), col("p"))
      .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
    pos.join(cent, Seq(labelCol, "p"))
      .groupBy(col(idCol), col(labelCol))
      .agg(
        count(lit(1)).as("dim"),
        round(sqrt(sum((col("x") * col("x")).cast(dec)).cast("double")), 5).as("norm"),
        round(sqrt(sum(((col("x") - col("c")) * (col("x") - col("c"))).cast(dec)).cast("double")), 5)
          .as("dist_centroid"))
      .select(col(idCol), col(labelCol), col("dim"), col("norm"), col("dist_centroid"))
  }
}
