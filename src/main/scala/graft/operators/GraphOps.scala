package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minimal distributed graph kernel: connected components by iterative
  * min-label propagation — the missing last step of every dedup pipeline
  * (pair emitters produce EDGES; retention needs CLUSTERS and one
  * representative per cluster).
  *
  * Scale shape: each round is one edge-keyed join + one min aggregation
  * + one pointer-jumping join (label ← label(label) — labels are vertex
  * ids, so the lookup is a self-join), all shuffling (id, label) pairs
  * only. Neighbor-min alone needs O(diameter) rounds — measured 20+ on
  * the sf0.1 near-dup graph, whose 0.9-Jaccard chains are long; pointer
  * jumping halves the remaining distance-to-root every round, giving
  * O(log diameter) total. The driver loop checks a single scalar per
  * round (`changed` count), never collects data, and `localCheckpoint`
  * truncates the lineage so the plan doesn't grow with the round count
  * (at cluster scale: `checkpoint` to reliable storage instead).
  * Min-label CC is order-insensitive, so the result is deterministic
  * under any scheduling.
  */
object GraphOps {

  /** Label every vertex with the smallest vertex id reachable from it.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected; both orientations
    *                 are added internally, self-loops are harmless)
    * @return (id, cluster) — cluster = min id of the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    // LAZY localCheckpoint throughout: the per-round labelSum action both
    // answers the convergence check and materializes the checkpoint in the
    // SAME job — an eager checkpoint would cost a second materialization
    // per round (measured ~40% of dedup_clusters wall time at sf0.1,
    // pure fixed job overhead at toy scale).
    // Self-loops fold the vertex's OWN label into the propagation
    // aggregate: min over N(v) ∪ {v} needs no separate left-outer
    // "fold" join per round (r6 — saved one shuffle join per round,
    // ~15% of dedup_clusters wall time), and every vertex is guaranteed
    // a row in the aggregate output.
    // No distinct() on the symmetrized edges: min-label propagation is
    // idempotent under duplicate edges, so dedup would only shrink a
    // pathologically duplicated input — one exchange + aggregate of setup
    // cost for nothing on the (unique-pair) dedup edge sets this serves.
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(vertices.select(col("id").as("src"), col("id").as("dst")))
      // Partition the (static) edge set by the per-round join key ONCE:
      // localCheckpoint preserves outputPartitioning, so every round's
      // propagation join re-shuffles only the (id, label) side, not the
      // edges — at 100 TB the edge set is the big side, so this moves the
      // per-round shuffle from O(E) to O(V).
      .repartition(col("dst"))
      .localCheckpoint(false)
    // Labels are monotonically non-increasing, so the label sum strictly
    // decreases on any change: one aggregate per round detects the
    // fixpoint without a join against the previous labels.
    // coalesce: sum over zero rows is NULL, and empty vertices must yield
    // an empty labels frame, not an NPE.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("cluster").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    // pointer jumping: labels are vertex ids, so label(label(v)) is one
    // self-join; a label's own label is never larger, so each jump halves
    // every vertex's remaining distance to its component root. Both sides
    // of the self-join read the SAME lazily-checkpointed frame, so the
    // upstream (propagation) subtree is computed once per round, not once
    // per reference.
    def jump(df: DataFrame): DataFrame = df.as("x")
      .join(df.select(col("id").as("jid"), col("cluster").as("jcluster")),
        col("x.cluster") === col("jid"))
      .select(col("x.id").as("id"), col("jcluster").as("cluster"))
      .localCheckpoint(false)
    // best label over N(v) ∪ {v} in ONE keyed aggregation — the
    // self-loops make the separate fold-with-own-label join redundant
    def propagate(lbl: DataFrame): DataFrame =
      sym.join(lbl, sym("dst") === lbl("id"))
        .groupBy(col("src")).agg(min("cluster").as("cluster"))
        .select(col("src").as("id"), col("cluster"))
        .localCheckpoint(false)
    // Round 1 without the label join: initial labels ARE the vertex ids,
    // so the first propagation min over N(v) ∪ {v} is a plain min(dst)
    // aggregate of sym — r7, one shuffle join + one driver job less than
    // starting the generic loop from identity labels (which also needed
    // its own labelSum action just to seed the convergence check).
    // Round 2 runs in the SAME action: a convergence check after round 1
    // is pure overhead (it can only fire on an edge-free graph, which the
    // round-3 check still catches), so the first labelSum materializes the
    // first TWO steps — r7, one driver job less again.
    var labels = jump(propagate(jump(
      sym.groupBy(col("src")).agg(min("dst").as("cluster"))
        .select(col("src").as("id"), col("cluster"))
        .localCheckpoint(false))))
    var prevSum = labelSum(labels)
    var lastDelta = java.math.BigDecimal.ZERO
    var i = 2
    var converged = false
    if (sys.env.contains("GRAFT_CC_DEBUG")) System.err.println(s"[cc] rounds 1-2 sum=$prevSum")
    while (!converged && i < maxIter) {
      // One jump per round: measured on the sf0.1 near-dup graph, a second
      // jump does NOT reduce the round count (propagation reach, not
      // pointer depth, is the binding constraint — both converge in 5
      // rounds) and costs an extra join + checkpoint per round.
      val next = jump(propagate(labels))
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      lastDelta = prevSum.subtract(nextSum)
      prevSum = nextSum
      i += 1
      if (sys.env.contains("GRAFT_CC_DEBUG")) System.err.println(s"[cc] round $i delta=$lastDelta")
    }
    require(converged,
      s"connectedComponents: label sum still decreasing after $i/$maxIter " +
        s"pointer-jumping rounds (last round's delta = $lastDelta); the " +
        s"component diameter exceeds 2^$maxIter — raise maxIter")
    labels
  }

  /** Fixed-iteration PageRank — the centrality/quality signal web-crawl
    * curation pipelines attach to documents (CommonCrawl publishes exactly
    * this per host); over a kNN similarity graph it scores how "central" a
    * document is in embedding space.
    *
    * pr₀ = 1/N; prᵢ₊₁(v) = teleport/N + damping·Σ_{(u,v)∈E} prᵢ(u)/outdeg(u).
    * Dangling mass (nodes with no out-edges) is dropped, the standard
    * simplification — totals then sum to < 1, which is fine for a relative
    * quality signal. Fixed `iters` (no convergence probe) keeps the whole
    * computation one declarative plan AND lets a SQL oracle replay it as
    * unrolled CTEs.
    *
    * Cross-engine determinism: every per-edge contribution pr(u)/outdeg(u)
    * is ONE IEEE division of a bit-identical double by an exact integer,
    * then quantized to a scaled BIGINT — floor(x·1e12) — BEFORE the
    * per-target sum (order-free exact integer sum). floor, NOT a decimal
    * cast: Spark casts double→DECIMAL through the value's SHORTEST string
    * repr (BigDecimal(Double.toString)) while DuckDB rounds the exact
    * binary expansion, and at a 1e-12 quantum with ÷3 repeating digits
    * the two disagree ~0.2% of the time (measured: 15 of 7500
    * quantizations, each off by one decimal ulp). floor of an identical
    * double is identical everywhere. The update is then two IEEE ops on
    * identically-parsed literals. `damping` and `teleport` are separate
    * args because `1 - 0.85` is NOT double 0.15 in either engine's
    * literal arithmetic — callers pass both, pre-parsed.
    *
    * Scale shape per iteration: one src-keyed equi-join of the (static)
    * out-degree-annotated edges against the node-sized pr frame, one
    * dst-keyed partial-agg sum, one left join back to the vertex set —
    * O(E) + O(V) shuffle, the classic distributed PR round. At many
    * iterations or real scale, checkpoint pr every few rounds (cf.
    * [[connectedComponents]]); at fixed depth 5 the lineage stays bounded.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    require(math.abs(damping + teleport - 1.0) < 1e-9,
      s"damping ($damping) + teleport ($teleport) must sum to 1")
    val n = vertices.agg(count(lit(1)).as("nn"))
    val od = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val eo = edges.select(col("src"), col("dst")).join(od, "src")
    var pr = vertices.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = eo.join(pr, eo("src") === pr("id"))
        .select(col("dst"),
          floor(col("pr") / col("od") * lit(1000000000000.0)).as("c"))
        .groupBy("dst").agg(sum("c").as("sc"))
      pr = vertices.crossJoin(broadcast(n))
        .join(contrib, vertices("id") === contrib("dst"), "left")
        .select(vertices("id"),
          (lit(teleport) / col("nn") +
            lit(damping) * (coalesce(col("sc"), lit(0L)) / lit(1000000000000.0)))
            .as("pr"))
    }
    pr.select(col("id"), col("pr").as("pagerank"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007), `iters` fixed
    * rounds: each node adopts the MOST FREQUENT label among its neighbors
    * (ties → smallest label; isolated nodes keep their own). Unlike
    * [[connectedComponents]]' min-label convergence this finds dense
    * communities, not reachability classes — a bridge edge between two
    * clusters does not merge them unless a majority crosses it.
    *
    * Determinism: counts are exact integers and the (count DESC, label
    * ASC) tie-break totals the order, so fixed-round output is unique —
    * which is also why the round count is FIXED, not converged: LPA on a
    * cyclic graph can oscillate, and a data-dependent stop would break
    * replay. Per round: one edge-keyed join + a (node, label) partial agg
    * + a per-node top-1 window partitioned by node (bounded by degree) —
    * the O(E) + O(V·d) shuffle shape, nothing global.
    *
    * `edges` is treated as DIRECTED input and symmetrized here.
    */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       iters: Int = 3): DataFrame = {
    // Symmetrized edge list is re-read every round; cache it so its
    // union+distinct shuffle runs once, not `iters` times — and CLUSTERED
    // BY THE PER-ROUND JOIN KEY (r15 optimization round): distinct()
    // leaves it hash-partitioned on the (src, dst) pair, which does not
    // co-locate equal src values, so every round's propagation join
    // re-shuffled the edge side. One repartition inside the cached build
    // makes all `iters` joins exchange-free on the edge side
    // (InMemoryRelation preserves outputPartitioning) — the
    // connectedComponents `sym` discipline. At cluster scale: persist to
    // a bucketed-by-src table, same effect across jobs.
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).cache()
    var lbl = vertices.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to iters) {
      // Majority label with (count DESC, label ASC) tie-break, as a pure
      // hash aggregation: max_by over the ordering struct (c, -lbl) picks
      // the same winner as the former row_number window but with partial
      // (map-side) aggregation and no per-node sort — one fewer exchange
      // flavor per round. lbl ids are non-negative, so -lbl is ASC label.
      val mode = und.join(lbl, und("src") === lbl("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("lbl"), struct(col("c"), (-col("lbl")).as("nl")))
          .as("nlbl"))
      // lbl always holds exactly the vertex set (starts there; left join
      // preserves it), so no re-join with `vertices` is needed.
      lbl = lbl.join(mode, lbl("id") === mode("dst"), "left")
        .select(lbl("id"), coalesce(col("nlbl"), col("lbl")).as("lbl"))
    }
    lbl.select(col("id"), col("lbl").as("community"))
  }
}
