package graft

import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner}
import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.queries.{DiffQueries, RelationalQueries, FnQueries}

/** Physical/optimized-plan shape assertions (SURVEY §4): these pin the
  * scale-relevant properties — parquet pushdown + pruning, broadcast on the
  * dim chain, top-k without a global sort, and the changed/unchanged inner
  * join (no full-outer + filter).
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def queryNamed(all: Seq[Q], name: String) =
    all.find(_.name == name).get.fn(spark, sf)

  private def physical(all: Seq[Q], name: String): String =
    queryNamed(all, name).queryExecution.executedPlan.toString

  test("project_filter pushes predicates and prunes columns at the parquet scan") {
    // Other suites may have cached lineitem@sf0.001 (Tables.cachedTable);
    // the cache manager would then substitute the InMemoryRelation into
    // this fresh read and hide the parquet pushdown this test pins.
    // Unpersist just that frame (NOT clearCache — other pins depend on
    // other cached frames) and restore it after; later uses re-cache
    // lazily off the same reference.
    val li = Tables.cachedTable(spark, sf, "lineitem")
    li.unpersist(blocking = true)
    val plan = try physical(RelationalQueries.all, "project_filter")
    finally li.cache()
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThan(l_quantity"), plan.take(2000))
    // pruned read schema: no l_partkey/l_suppkey etc. in ReadSchema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(physical(RelationalQueries.all, "join_broadcast").contains("BroadcastHashJoin"))
  }

  test("sort_limit_topk plans TakeOrderedAndProject (no global sort)") {
    assert(physical(FnQueries.all, "sort_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("diff_changed / diff_unchanged are inner joins, not filtered full-outer") {
    for (name <- Seq("diff_changed", "diff_unchanged")) {
      val joins = queryNamed(DiffQueries.all, name)
        .queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
      assert(joins.nonEmpty && joins.forall(_ == Inner), s"$name joins: $joins")
    }
  }

  test("diff_full is a single full-outer join (the one unavoidable shuffle)") {
    val joins = queryNamed(DiffQueries.all, "diff_full")
      .queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins == Seq(FullOuter), joins.toString)
  }

  test("diff_type_coerce / diff_normalized stay projection-only over diff_full's plan (r12)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    for (name <- Seq("diff_type_coerce", "diff_normalized")) {
      val df = queryNamed(DiffQueries.all, name)
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
      assert(joins == Seq(FullOuter), s"$name joins: $joins")
      // widening / normalization are per-row projections — the plan must
      // carry exactly diff_full's two side exchanges, nothing more.
      val shuffles = strip(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 2, s"$name grew an exchange (${shuffles.size})")
    }
  }

  test("diff_dup_key_rank: one window per side sharing the join's exchange (r12)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = queryNamed(DiffQueries.all, "diff_dup_key_rank")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins == Seq(FullOuter), s"must stay ONE full-outer join: $joins")
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 2, s"expected one rank window per side, got ${windows.size}")
    // The scale contract: the window's hash(keys) partitioning satisfies
    // the join's (keys, rank) clustering, so the rank never costs an extra
    // exchange — two shuffles total, one per side, same as diff_full.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2,
      s"rank window must reuse the join exchange (got ${shuffles.size}):\n" +
        plan.toString.take(2000))
  }

  test("diff_merge3 is exactly two full-outer joins, no cartesian") {
    val qe = queryNamed(DiffQueries.all, "diff_merge3").queryExecution
    val joins = qe.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins == Seq(FullOuter, FullOuter), joins.toString)
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "merge3 must stay an equi sort-merge chain")
  }

  test("as-of join plan contains no cartesian/broadcast-nested-loop blowup") {
    val plan = physical(RelationalQueries.all, "join_asof")
    assert(!plan.contains("CartesianProduct"), "as-of join must not go cartesian")
  }

  test("join_geo_grid: the radius predicate rides an EQUI cell join") {
    // A bare 2-D distance predicate plans as a nested-loop cartesian; the
    // grid trick (supplier exploded to 3x3 neighbor cells, customer at its
    // home cell) must keep it an equi join with dist² as a residual filter.
    val plan = physical(RelationalQueries.all, "join_geo_grid")
    assert(!plan.contains("CartesianProduct"), "geo join went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "geo join went nested-loop")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi join in plan:\n${plan.take(1200)}")
  }

  test("dedup_substring: shingle census joins equi-only, counts collapse pre-join") {
    val plan = physical(graft.queries.DedupVariantQueries.all, "dedup_substring")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "substring census must stay equi on the shingle")
    // (doc, shingle) multiplicity collapses in a partial agg BEFORE the
    // doc-frequency join — positions never ride the join input.
    assert(plan.contains("HashAggregate"), "expected pre-join partial aggregation")
  }

  test("join_range_bucketed: the pure range predicate rides an EQUI bucket join") {
    val plan = physical(RelationalQueries.all, "join_range_bucketed")
    // A bare |t_b - t_a| <= W predicate plans as a nested-loop cartesian;
    // the bucket trick must keep it an equi join with the range as a
    // residual filter.
    assert(!plan.contains("CartesianProduct"), "range join went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join went nested-loop")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi join in plan:\n${plan.take(1200)}")
  }

  test("similarity joins never go cartesian and keep the native kernels codegen'd") {
    val pipeline = graft.queries.PipelineQueries.all ++ graft.queries.DedupVariantQueries.all
    for (name <- Seq("sim_join_threshold", "sim_knn_graph", "dedup_minhash_lsh",
                     "dedup_simhash", "dedup_ngram")) {
      val plan = physical(pipeline, name)
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name went nested-loop")
    }
    // the custom expressions surface in the plan (not folded away / UDF'd)
    assert(physical(pipeline, "sim_join_threshold").contains("float_vec_dot"),
      "FloatVecDot missing from plan")
    // dedup_near now serves the SHARED cached pair list (its declared plan
    // is an InMemoryTableScan), so pin the underlying pair CONSTRUCTION
    // directly: still no cartesian, and the merge-verify kernel codegen'd.
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "lang", "text")
    val pairPlan = graft.operators.TextOps.nearDupPairs(docs, minJaccard = 0.9)
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("CartesianProduct"), "nearDupPairs went cartesian")
    assert(!pairPlan.contains("BroadcastNestedLoopJoin"), "nearDupPairs went nested-loop")
    assert(pairPlan.contains("sorted_intersect_count"),
      "SortedIntersectCount missing from plan")
  }

  test("graph_pagerank: per-iteration joins stay equi; only the N scalar nest-loops") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "graph_pagerank")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "graph_pagerank went cartesian")
    // one broadcast of the 1-row N scalar per iteration + the seed
    assert(bnlj <= 6, s"$bnlj nested-loop joins — an edge/pr join degenerated")
  }

  test("dedup_lines is one equi-join over the shared span cache, no cartesian") {
    val qe = queryNamed(graft.queries.DedupVariantQueries.all, "dedup_lines")
      .queryExecution
    val joins = qe.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins == Seq(Inner), joins.toString)
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "span-count join must stay equi")
    // Both consumers (count/min agg and the join probe) read the ONE
    // cached span explode, not two corpus scans.
    assert(plan.split("InMemoryTableScan").length - 1 >= 2, plan.take(3000))
  }

  test("dedup_simhash's banded scan is pure hash/merge equi-joins on the chunk keys") {
    // The r2 scale-killer was an O(block²) theta-join; the banded rewrite
    // must plan every per-chunk join as an EQUI join (SMJ/BHJ with the
    // (block, chunk) equalities as keys) — a join that fell back to
    // nested-loop/cartesian would mean Catalyst failed to extract them.
    val df = queryNamed(graft.queries.DedupVariantQueries.all, "dedup_simhash")
    val plan = df.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty, "no joins found — plan shape changed?")
    assert(joins.forall(l => l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin")
      || l.contains("ShuffledHashJoin")),
      s"non-equi join in banded scan:\n${joins.mkString("\n")}")
    // the equi keys really are the exploded chunk columns, not just the
    // block: both the chunk index and the chunk value must be join keys
    assert(joins.exists(l => l.contains("a_ck") && l.contains("a_cv")),
      "chunk (index, value) not join keys")
  }

  test("dedup_embed_ivf verifies inside the cell join: no exchange between dot and join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.col
    // Pin the UNCACHED pair construction — the declared query returns the
    // cached shared pair list (KMeansSql.dedupPairs), whose top-level plan
    // is just an InMemoryTableScan; the property under test is the plan
    // that executes inside that cache build.
    val df = {
      val n = Tables.cachedTable(spark, sf, "embeddings").count()
      val assign = graft.queries.KMeansSql.assignments(spark, sf)
        .filter(col("rn") <= graft.queries.KMeansSql.nProbeDedup(n))
      graft.operators.VectorOps.pairsByAssignment(
        Tables.cachedTable(spark, sf, "embeddings"), assign,
        tau = graft.queries.KMeansSql.DedupTau)
    }
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    // the verify kernel (dot of the two candidate vectors) appears at all
    val verifyNodes = plan.collect {
      case p if p.expressions.exists(_.toString.contains("float_vec_dot(va")) => p
    }
    assert(verifyNodes.nonEmpty, s"verify dot not found:\n${plan.toString.take(2000)}")
    // ...and at least one such node sits directly on top of the cell join:
    // walking down from it, every path reaches a Join BEFORE any Exchange —
    // candidate pairs stream from the join into the dot+tau filter without
    // ever being shuffled (the 100 TB claim: 4.6M candidates, 0 shuffled).
    def joinBeforeExchange(p: SparkPlan): Boolean = p.nodeName match {
      case n if n.contains("Exchange") => false
      case n if n.contains("Join") => true
      case _ => p.children.nonEmpty && p.children.forall(joinBeforeExchange)
    }
    assert(verifyNodes.exists(n => n.children.forall(joinBeforeExchange)),
      "an Exchange sits between the cell join and the cosine verify")
  }

  test("sim_search_ivf probes broadcast cells against the materialized index: zero corpus shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = queryNamed(graft.queries.PipelineQueries.all, "sim_search_ivf")
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    // The 100 TB property: a search touches the (once-built) index only
    // through a broadcast of its probe cells — the per-query plan never
    // shuffles the corpus. Broadcast exchanges are expected (pcells,
    // probe); shuffle exchanges are not.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"corpus shuffle in sim_search_ivf:\n${plan.toString.take(2000)}")
    assert(plan.toString.contains("BroadcastHashJoin"), "probe-cell join is not broadcast")
    assert(plan.toString.contains("TakeOrderedAndProject"), "top-k fell back to a global sort")
  }

  test("dedup_delta_embed broadcasts the batch into the stored index: no self-join, no index shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = queryNamed(graft.queries.DedupVariantQueries.all, "dedup_delta_embed")
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    // The daily-batch contract: the (cached) index is read in place; the
    // batch side rides a broadcast. No shuffle anywhere in the per-day plan.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"index shuffle in dedup_delta_embed:\n${plan.toString.take(2000)}")
    assert(plan.toString.contains("BroadcastHashJoin"), "batch-into-index join is not broadcast")
    // ...and the new shard never self-joins: the two cell-join inputs carry
    // complementary shard filters (= 7 on the batch, <> 7 on the index).
    val s = plan.toString
    assert(s.contains("= 7") && (s.contains("NOT") || s.contains("<> 7")),
      s"complementary shard filters missing — batch may be self-joining:\n${s.take(2000)}")
  }

  test("decontaminate broadcasts the eval side; quality_filter never shuffles") {
    val cur = graft.queries.CurationQueries.all
    val decon = physical(cur, "decontaminate")
    assert(decon.contains("BroadcastHashJoin"), "eval shingle join is not broadcast")
    assert(!decon.contains("CartesianProduct") && !decon.contains("SortMergeJoin"),
      "decontaminate shuffles the corpus for the eval join")
    val qf = physical(cur, "quality_filter")
    assert(!qf.contains("Exchange") && !qf.contains("Join"),
      s"quality_filter must be a single-scan projection:\n${qf.take(800)}")
  }

  test("sim_search_lsh probes broadcast signatures; candidate cosine stays codegen'd") {
    val plan = physical(graft.queries.PipelineQueries.all, "sim_search_lsh")
    assert(plan.contains("BroadcastHashJoin"), "probe-signature join is not broadcast")
    assert(!plan.contains("CartesianProduct"), "sim_search_lsh went cartesian")
    assert(plan.contains("TakeOrderedAndProject"), "top-k fell back to a global sort")
    assert(plan.contains("float_vec_dot"), "exact-cosine kernel missing from plan")
  }

  test("pack_sequences windows are partitioned (no single-task global scan)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.CurationQueries.all, "pack_sequences")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected a window for the running sum")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "running-sum window lost its (lang, shard) partitioning — single-task scan")
  }

  test("split_assign is a pure projection: zero exchanges, zero joins") {
    val plan = physical(graft.queries.PipelineQueries.all, "split_assign")
    assert(!plan.contains("Exchange"), s"split_assign shuffles:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "split_assign must not join")
  }

  test("events_funnel and quality_checks never go cartesian/nested-loop") {
    val all = graft.queries.StreamingQueries.all ++ graft.queries.DiffQueries.all
    for (name <- Seq("events_funnel", "events_cohort", "quality_checks")) {
      val plan = physical(all, name)
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name went nested-loop")
    }
  }

  test("quality_checks is one aggregation pass (single scan, no self-joins)") {
    val plan = queryNamed(graft.queries.DiffQueries.all, "quality_checks")
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.nodeName == "InMemoryRelation" || r.nodeName == "LogicalRelation" => r
    }
    // 6 check rows union the SAME single-agg subtree; per-branch scan reuse
    // is fine, but no branch may rescan per metric (6 branches max).
    assert(scans.size <= 6, s"${scans.size} scans — a job per check?")
  }

  test("diff_incremental filters dirty buckets via broadcast (no corpus-side shuffle join)") {
    val plan = physical(DiffQueries.all, "diff_incremental")
    // the dirty-bucket set (≤ buckets rows) must ride a broadcast
    // LeftSemi — a shuffled semi would re-shuffle both snapshots just to
    // apply what is semantically a per-task filter.
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"dirty-bucket filter is not a broadcast semi:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), "diff_incremental went cartesian")
  }

  test("join_star broadcasts every dimension: one fact scan, no fact shuffle before the agg") {
    val plan = physical(RelationalQueries.all, "join_star")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"dimension chain not fully broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"fact table got shuffled for a dim join:\n${plan.take(1500)}")
  }

  test("events_attribution is one partitioned range window — no join, no global sort") {
    val df = queryNamed(graft.queries.StreamingQueries.all, "events_attribution")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "attribution must be window-shaped, not a purchases-vs-touches self-join")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the lookback window lost its user_id partitioning — single-task scan")
  }

  test("stream_join extracts the user equi-key (never a time-theta cartesian)") {
    val plan = physical(graft.queries.StreamingQueries.all, "stream_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join lost its equi key:\n${plan.take(1500)}")
  }

  test("banded MinHash candidates come from ONE bucket self-join, not per-band unions") {
    // r6 rewrote minHashLshPairs from a union of per-band joins to a single
    // self-join on the exploded (block, band, mh) bucket key (bands× fewer
    // corpus scans). Pin the shape: no Union anywhere, and exactly 3 joins
    // (bucket self-join + the two token-set lookups of the exact verify) —
    // a regression to per-band unions would add a join and a Union per band.
    val pipeline = graft.queries.PipelineQueries.all ++ graft.queries.DedupVariantQueries.all
    for (name <- Seq("dedup_minhash_lsh", "dedup_ngram")) {
      val plan = queryNamed(pipeline, name).queryExecution.optimizedPlan
      val joins = plan.collect { case j: Join => j }.size
      val unions = plan.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }.size
      assert(unions == 0, s"$name: $unions Union nodes — per-band unions are back?")
      assert(joins == 3, s"$name: $joins joins (expected bucket join + 2 verify lookups)")
    }
  }

  test("split_assign written partitioned-by-split prunes at the scan (static + dynamic)") {
    // The claim in split_assign's scaladoc: downstream readers filtering on
    // `split` prune whole partition directories, never scanning the 90%
    // train split to read the 5% val split. Write the assignment
    // partitioned-by-split (the 100 TB layout), then pin both pruning
    // modes on the read-back.
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-split-dpp").toString
    val assigned = queryNamed(graft.queries.PipelineQueries.all, "split_assign")
    graft.operators.Sinks.writePartitioned(assigned, out, Seq("split"))
    val fact = spark.read.parquet(out)

    // 1. Static pruning: a literal split predicate lands in
    //    PartitionFilters (directory pruning), not a post-scan Filter.
    val static = fact.filter(col("split") === "val")
    val staticScan = static.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(staticScan.contains("split"), s"split predicate not in PartitionFilters: $staticScan")
    assert(static.count() > 0 && static.count() < assigned.count())

    // 2. Dynamic partition pruning: when the split of interest only
    //    arrives via a join against a filtered dimension, the fact scan
    //    must carry a dynamicpruningexpression subquery instead of
    //    reading all three splits.
    import spark.implicits._
    // Two traps the DPP rule has: (a) the dim must be a real source, not a
    // LocalRelation — Catalyst folds a filter over literal rows into the
    // relation, leaving no predicate for the rule to see; (b) the predicate
    // must be "likely selective" (EqualTo/In/Like...) — a bare boolean
    // column is not.
    Seq(("val", "keep"), ("test", "drop"), ("train", "drop"))
      .toDF("split", "tag").write.parquet(s"$out-dim")
    val dim = spark.read.parquet(s"$out-dim")
    val joined = fact.join(dim.filter(col("tag") === "keep"), Seq("split"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no DPP subquery on the partitioned scan:\n${plan.take(2000)}")
    assert(joined.count() == static.count())
  }

  // Operator-level join census: traverses the physical tree (cached
  // InMemoryTableScans are leaves, so a cached table's ONE-TIME build plan
  // is excluded — only what every consumer re-executes is counted).
  private def joinCensus(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    (plan.collect { case j: BroadcastHashJoinExec => j }.size,
      plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size,
      plan.collect { case j: CartesianProductExec => j }.size)
  }

  test("domain_mix_temp gates the corpus through a broadcast ppm table (scalars are the only BNLJs)") {
    val (bhj, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.CurationQueries.all, "domain_mix_temp"))
    assert(cart == 0, "domain_mix_temp went cartesian")
    // the per-row acceptance gate joins the corpus against the
    // sources-sized ppm table — that join must be a broadcast, never a
    // corpus shuffle; the 1-row total/Z scalar cross-joins live inside the
    // cached mix-table build, so the per-run plan has NO nested loops.
    assert(bhj >= 1, "ppm row gate is not a broadcast join")
    assert(bnlj == 0, s"$bnlj nested-loop joins in the per-run plan")
  }

  test("quality_perplexity joins stay equi; the vocab scalar is the only broadcast-nested-loop") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.TextAnalysisQueries.all, "quality_perplexity"))
    assert(cart == 0, "quality_perplexity went cartesian")
    assert(bnlj <= 1, s"$bnlj nested-loop joins — a count-table join degenerated")
  }

  test("text_bm25 broadcasts the query side; the corpus scalar is the only nested-loop") {
    val df = queryNamed(graft.queries.TextAnalysisQueries.all, "text_bm25")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "text_bm25 went cartesian")
    assert(bnlj <= 1, s"$bnlj nested-loop joins — only the 1-row (n_docs, total) scalar may")
    // The declared plan may read the shared bm25-scores cache (warmed by a
    // sibling test), hiding the construction — pin the posting-join shape
    // on a cache-bypassing rebuild, like the nearDupPairs pin.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tf = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val qt = Seq((1L, "spark"), (1L, "customer")).toDF("query_id", "tok")
    val plan = broadcast(qt).join(tf, "tok").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the tiny query-terms side must broadcast into the posting join")
  }

  test("rank_fusion: one full-outer merge of the two rank lists, no cartesian, integer rrf") {
    val df = queryNamed(graft.queries.TextAnalysisQueries.all, "rank_fusion")
    // The merge lives inside the cached fusion-ranks frame: when a sibling
    // test warmed the cache the declared plan shows an InMemoryRelation,
    // so look for the full-outer in whichever plan carries it.
    val outers = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == FullOuter => j
    }
    val cachedPlans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }
    assert(outers.size == 1 || cachedPlans.exists(_.contains("FullOuter")),
      s"no full-outer list merge visible (outers=${outers.size}, " +
        s"cached=${cachedPlans.size})")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "rank_fusion went cartesian")
    assert(bnlj <= 1, s"$bnlj nested-loop joins — only the bm25 scalar may")
    assert(df.schema("rrf").dataType == org.apache.spark.sql.types.LongType,
      "rrf must stay an exact BIGINT — no float fusion")
  }

  test("dsir_importance: count-table joins stay equi; only the vocab scalars nest-loop") {
    val df = queryNamed(graft.queries.TextAnalysisQueries.all, "dsir_importance")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "dsir_importance went cartesian")
    assert(bnlj <= 2, s"$bnlj nested-loop joins — only the 1-row vocab pair may")
  }

  test("events_sessionize windows share one user-hash partitioning (no global window, ≤2 exchanges)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.StreamingQueries.all, "events_sessionize")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected break-flag + running-sum windows")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "a sessionize window lost its user_id partitioning — single-task scan")
    // lag and the running session index share (user_id | ts_us, event_id):
    // one exchange + one sort serve both; the only other exchange is the
    // final per-(user, session) aggregation.
    val exchanges = physical(graft.queries.StreamingQueries.all, "events_sessionize")
      .linesIterator.count(_.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("Exchange"))
    assert(exchanges <= 2, s"$exchanges exchanges — the windows stopped sharing their shuffle")
  }

  test("text_scrub_blocklist is a pure projection: zero exchanges, zero joins") {
    val plan = physical(graft.queries.TextAnalysisQueries.all, "text_scrub_blocklist")
    assert(!plan.contains("Exchange"), s"scrub shuffles:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "scrub must not join")
  }

  test("quality_gopher joins stay equi on doc_id; no cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.TextAnalysisQueries.all, "quality_gopher"))
    assert(cart == 0 && bnlj == 0, s"quality_gopher went non-equi ($bnlj BNLJ, $cart cartesian)")
  }

  test("embed_quantize folds per row: zero exchanges, zero joins, no explode") {
    val plan = physical(graft.queries.PipelineQueries.all, "embed_quantize")
    assert(!plan.contains("Exchange"), s"quantize shuffles:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "quantize must not join")
    assert(!plan.contains("Generate"), "quantize must not explode the vectors")
  }

  test("budget_select broadcasts band offsets; fine windows stay (lang, band)-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.CurationQueries.all, "budget_select")
    val (bhj, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, s"budget_select went non-equi ($bnlj BNLJ, $cart cartesian)")
    assert(bhj >= 1, "band-offset join must broadcast (it is KB-sized by construction)")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "a budget_select window lost its partitioning — whole-language scan")
  }

  test("text_ngram_lm count-table joins stay equi; scalar vocab is the only broadcast-nested-loop") {
    val plan = physical(graft.queries.TextAnalysisQueries.all, "text_ngram_lm")
    assert(!plan.contains("CartesianProduct"), "text_ngram_lm went cartesian")
    // the c1/c2 joins must be hash/merge equi-joins on the ngram keys; the
    // 1-row vocab scalar legitimately rides a broadcast nested loop.
    val nlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj <= 1, s"$nlj nested-loop joins — a count-table join degenerated")
  }

  test("dedup_containment candidates and fetches stay equi; no cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.DedupVariantQueries.all, "dedup_containment"))
    assert(cart == 0 && bnlj == 0,
      s"containment went non-equi ($bnlj BNLJ, $cart cartesian) — the prefix×postings join must key on the shingle")
  }

  test("dedup_edit: variant-hash-keyed equi joins + both native kernels") {
    val df = queryNamed(graft.queries.DedupVariantQueries.all, "dedup_edit")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, s"dedup_edit went non-equi ($bnlj BNLJ, $cart cartesian)")
    // The native affix-trimming banded kernel (r7) — a regression to the
    // built-in (no trim) costs 2.5x, to the unbounded 2-arg form O(len²).
    assert(df.queryExecution.optimizedPlan.toString.contains("bounded_levenshtein"),
      "native BoundedLevenshtein kernel lost")
    // r8: candidates must come from the SymSpell delete-neighborhood
    // postings (delete_variant_hashes), NOT a nation-block self-join —
    // a regression to block² is the scale-killer the r7 verdict flagged.
    assert(df.queryExecution.optimizedPlan.toString.contains("delete_variant_hashes"),
      "SymSpell DeleteVariantHashes kernel lost — candidate space degenerated")
  }

  test("graph_triangles: three vertex-equi joins, no cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.PipelineQueries.all, "graph_triangles"))
    assert(cart == 0 && bnlj == 0, s"triangles went non-equi ($bnlj BNLJ, $cart cartesian)")
  }

  test("text_readability is a pure projection: zero exchanges, zero joins") {
    val plan = physical(graft.queries.TextAnalysisQueries.all, "text_readability")
    assert(!plan.contains("Exchange"), s"readability shuffles:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "readability must not join")
  }

  test("events_spike: day-grain agg feeds a type-partitioned range window, ≤2 exchanges") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.StreamingQueries.all, "events_spike")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "spike window lost its event_type partitioning — single-task scan")
    val exchanges = physical(graft.queries.StreamingQueries.all, "events_spike")
      .linesIterator.count(_.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("Exchange"))
    assert(exchanges <= 2, s"$exchanges exchanges — expected day-agg + window only")
  }

  test("cooccur_lift: equi pair join, scalar-only nested loop, top-k without global sort") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "cooccur_lift")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "cooccur_lift went cartesian")
    assert(bnlj <= 1, s"$bnlj nested-loop joins — only the 1-row total may")
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-100 must be TakeOrderedAndProject, not a global sort")
  }

  test("anomaly_mad: both stats joins stay prio-equi; no cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.AggWindowQueries.all, "anomaly_mad"))
    assert(cart == 0 && bnlj == 0, s"anomaly_mad went non-equi ($bnlj BNLJ, $cart cartesian)")
  }

  test("text_entropy: doc-keyed equi joins only, no cartesian, no window") {
    val df = queryNamed(graft.queries.SignalQueries.all, "text_entropy")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0,
      s"entropy went non-equi ($bnlj BNLJ, $cart cartesian) — the doc-stats join degenerated")
    assert(df.schema("entropy").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("text_pmi: vocab-equi fetch joins, scalar-only nested loops, top-k without global sort") {
    val df = queryNamed(graft.queries.SignalQueries.all, "text_pmi")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0, "text_pmi went cartesian")
    assert(bnlj <= 2, s"$bnlj nested-loop joins — only the two 1-row totals may")
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-100 must be TakeOrderedAndProject, not a global sort")
  }

  test("sim_search_sq8: codegen'd ADC kernel, broadcast probe, no corpus exchange") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "sim_search_sq8")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("byte_vec_dot"), "ByteVecDot missing — ADC fell back to a HOF")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 must not be a global sort")
    // one corpus pass: the only join is the 1-row broadcast probe, and no
    // shuffle exchange touches the code table (cached or not).
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges == 0, s"corpus shuffle in sq8 search:\n${plan.take(1500)}")
  }

  test("sim_search_pq: ADC over the wide code index — broadcast lookups only, no corpus exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = queryNamed(graft.queries.PipelineQueries.all, "sim_search_pq")
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    // The PQ contract: per-query work is one scan of the (once-built,
    // cached) wide code table + m broadcast lookup joins against the
    // LocalRelation qd table + top-k. A shuffle exchange in the QUERY plan
    // (the index build's own exchanges live inside the InMemoryRelation
    // and are amortized) would mean the corpus moved for a single probe.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"corpus shuffle in sim_search_pq:\n${plan.toString.take(1500)}")
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), "top-20 must not be a global sort")
    assert(s.contains("BroadcastHashJoin"), "qd lookups must broadcast")
    assert(!s.contains("SortMergeJoin"), "a lookup join fell back to SMJ")
  }

  test("sample_weighted is a pure projection + TakeOrderedAndProject: no join, no shuffle") {
    val df = queryNamed(graft.queries.SignalQueries.all, "sample_weighted")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-100 must not be a global sort")
    assert(!plan.contains("Join"), "weighted sampling must not join")
    assert(!plan.linesIterator.exists(l => l.contains("Exchange") && !l.contains("Broadcast")),
      s"weighted sampling shuffles:\n${plan.take(1200)}")
  }

  test("graph_label_prop: all joins equi, mode pick is a window-free hash agg") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.PipelineQueries.all, "graph_label_prop")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, s"label prop went non-equi ($bnlj BNLJ, $cart cartesian)")
    // r7 rewrote the per-round majority pick from a row_number window to a
    // max_by hash aggregation (partial agg, no per-node sort); a Window
    // reappearing here means the rewrite regressed.
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty,
      "label prop's mode pick regressed from max_by agg to a window")
  }

  test("dedup_report: composed audit stays equi-joined, no cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.FunnelQueries.all, "dedup_report"))
    assert(cart == 0 && bnlj == 0, s"dedup_report went non-equi ($bnlj BNLJ, $cart cartesian)")
  }

  test("text_feature_hash: one keyed agg off the shared tf frame — no join, no window") {
    val df = queryNamed(graft.queries.SignalQueries.all, "text_feature_hash")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, "feature hashing must not join")
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "feature hashing must be agg-shaped")
  }

  test("events_markov: one user-partitioned lag window + broadcast marginal join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.SignalQueries.all, "events_markov")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "markov lag window lost its user_id partitioning — single-task scan")
    val (bhj, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, "markov marginal join went non-equi")
    assert(bhj >= 1, "the types-sized row-marginal frame must broadcast")
  }

  test("agg_histogram: 1-row stats broadcast, no wide join, no cartesian") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "agg_histogram")
    val (_, bnlj, cart) = joinCensus(df)
    // The crossJoin(broadcast(stats)) is the intended shape: a 1-row
    // broadcast build side (BNLJ), never a CartesianProduct and never a
    // shuffle join of the fact against anything.
    assert(cart == 0, "histogram stats join degenerated to a cartesian")
    assert(bnlj == 1, s"expected exactly the 1-row stats broadcast, got $bnlj BNLJs")
    assert(!df.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "histogram must not shuffle-join")
  }

  test("embed_drift: both snapshots in one scan — zero joins, zero windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.PipelineQueries.all, "embed_drift")
    // Conditional aggregation means the even/odd snapshot split never
    // becomes a self-join of the embeddings table.
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "embed_drift must not self-join the snapshots")
    assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "embed_drift must be pure aggregation")
  }

  test("events_concurrency: band-partitioned running sums + broadcast offsets, never a global cumsum") {
    val df = queryNamed(graft.queries.StreamingQueries.all, "events_concurrency")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "a running sum lost its partition spec — whole-type boundary stream in one task")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"day offsets must broadcast into the delta stream:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), "events_concurrency went cartesian")
  }

  test("multimodal_chunks is explode + agg only — no join anywhere") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "multimodal_chunks")
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "the chunk census must not join; 32-byte hashes are the only shuffled payload")
  }

  test("split_leakage_check reads the cached pair list with zero joins (split is a projection)") {
    // The audit's scale claim: split assignment is a pure function of the
    // stable doc id, so once the near-dup pair list exists the leakage
    // census never touches the corpus — no join back to documents. With
    // the shared pair cache materialized (as in any real run), the plan is
    // InMemoryTableScan -> project -> 6-row agg.
    graft.queries.PipelineQueries.sharedNearDupPairs(spark, sf).count()
    val df = queryNamed(graft.queries.PipelineQueries.all, "split_leakage_check")
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "split_leakage_check must be a pure projection over the pair list")
    assert(df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "pair list should come from the shared cache")
  }

  test("graph_jaccard: equi wedge joins + TakeOrderedAndProject, no cartesian") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "graph_jaccard")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"wedge generation must stay an equi join on the shared vertex:\n${plan.take(1500)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-50 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("diff_scd2: history windows stay key-partitioned (never a global version sort)") {
    val df = queryNamed(DiffQueries.all, "diff_scd2")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "scd2 lag/segment windows lost their key partitioning")
  }

  test("graph_modularity: community fetches stay equi; only scalar frames cross-join") {
    val plan = queryNamed(graft.queries.PipelineQueries.all, "graph_modularity")
      .queryExecution.executedPlan.toString
    // The 1-row m2/i2 frames crossJoin by design (BroadcastNestedLoop on a
    // scalar is the domain_mix convention); a real CartesianProduct would
    // mean the edge or community sets nested.
    assert(!plan.contains("CartesianProduct"),
      s"modularity audit went cartesian:\n${plan.take(1500)}")
  }

  test("events_forecast: predictions broadcast into the test scan") {
    val plan = queryNamed(graft.queries.StreamingQueries.all, "events_forecast")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the (type, hod) prediction table must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), "events_forecast went cartesian")
  }

  test("tokenizer_fertility: per-row HOF counting — no join, no explode") {
    val df = queryNamed(graft.queries.TextAnalysisQueries.all, "tokenizer_fertility")
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "fertility is one scan + langs agg, never a join")
    assert(df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.isEmpty,
      "token arrays must never explode into rows")
  }

  test("domain_gini: ranking window runs on the sources-sized agg, partitioned by lang") {
    val df = queryNamed(graft.queries.CurationQueries.all, "domain_gini")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "gini rank window lost its lang partitioning")
    assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      "domain_gini is agg -> tiny window -> agg, never a join")
  }

  test("graph_kcore peels with equi semi-joins only — no cartesian") {
    val plan = queryNamed(graft.queries.PipelineQueries.all, "graph_kcore")
      .queryExecution.executedPlan.toString
    // The per-round count crossJoins are 1-row scalar frames (the
    // domain_mix convention); anything nesting real edge sets would
    // surface as a CartesianProduct.
    assert(!plan.contains("CartesianProduct"),
      s"kcore peel went cartesian:\n${plan.take(1500)}")
  }

  test("embed_whiten: corpus projects against a broadcast direction — no corpus self-join") {
    val plan = queryNamed(graft.queries.PipelineQueries.all, "embed_whiten")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"projection must join the 64-row direction by broadcast, not shuffle:\n${plan.take(1500)}")
  }

  test("embed_recall_eval: probe sides broadcast; top-k windows stay probe-partitioned") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "embed_recall_eval")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "a ranking window lost its probe partitioning")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"probe cells / probe vectors must broadcast into the index scan:\n${plan.take(1500)}")
  }

  test("join_asof_nearest: both direction windows share ONE user-keyed exchange") {
    val plan = queryNamed(graft.queries.RelationalQueries.all, "join_asof_nearest")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"nearest must cost exactly what backward costs (1 exchange), got $exchanges:\n${plan.take(1200)}")
    assert(plan.linesIterator.count(_.contains("Window [")) >= 2,
      s"both direction frames must plan as windows:\n${plan.take(600)}")
  }

  test("join_bloom_prefilter: bloom probe filters the fact BEFORE its join exchange") {
    val df = queryNamed(graft.queries.RelationalQueries.all, "join_bloom_prefilter")
    val plan = df.queryExecution.executedPlan.toString
    // the dimension join must be a broadcast hash join (urgent orders are
    // dim-sized) and nothing may plan a cartesian
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the mightContain filter (xxhash64 probe) must sit below the join —
    // i.e. appear in the plan text AFTER the join node it feeds
    val lines = plan.linesIterator.toSeq
    val joinLine = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val probeLine = lines.indexWhere(_.contains("xxhash64"))
    assert(joinLine >= 0 && probeLine > joinLine,
      s"bloom probe must filter map-side below the join:\n${plan.take(1500)}")
  }

  test("agg_topk_heap: a two-stage ObjectHashAggregate, no window, no sort-by-all-rows") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "agg_topk_heap")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty, "heap top-k must not plan a window")
    val plan = df.queryExecution.executedPlan.toString
    // typed Aggregator → ObjectHashAggregate with a partial stage: only
    // k-entry buffers cross the exchange, never the input rows
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"partial-merge stage missing (map-side combine lost):\n${plan.take(1500)}")
  }

  test("sort_zorder: scalar maxima broadcast; no global sort anywhere in the census") {
    val df = queryNamed(graft.queries.LayoutQueries.all, "sort_zorder")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // value-based file cut: the only exchanges are the two census
    // aggregations and the scalar-maxima broadcast — never a range
    // partitioning (that belongs to the WRITE path, not the report)
    assert(!plan.contains("rangepartitioning"),
      s"census must not globally sort:\n${plan.take(1500)}")
  }

  test("scan_partition_prune: the status filter is a PartitionFilter at the scan") {
    val plan = physical(RelationalQueries.all, "scan_partition_prune")
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderstatus"),
      s"status filter not pushed to partition pruning:\n${plan.take(1500)}")
    // pruned at list time: the data filter must NOT reappear as a pushed
    // parquet filter (the column only exists in the directory name) —
    // extract the PushedFilters bracket alone; the whole FileScan prints
    // as one line that also holds the PartitionFilters
    val pushed = """PushedFilters: \[([^\]]*)\]""".r
      .findFirstMatchIn(scanLine).map(_.group(1)).getOrElse("")
    assert(!pushed.contains("o_orderstatus"), s"PushedFilters: [$pushed]")
  }

  test("join_scd2_pit: validity explode makes it an equi-join — no range join fallback") {
    val plan = physical(DiffQueries.all, "join_scd2_pit")
    assert(!plan.contains("CartesianProduct"), "PIT join went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "PIT join went nested-loop")
    assert(plan.contains("Generate explode"), "bounded validity explode missing")
  }

  test("window_ewma: all 8 lag frames share ONE user-keyed exchange and sort") {
    val plan = physical(graft.queries.AggWindowQueries.all, "window_ewma")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val sorts = plan.linesIterator.count(l => l.contains("Sort ") && !l.contains("SortAgg"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n${plan.take(1500)}")
    assert(sorts == 1, s"expected 1 sort feeding every lag, got $sorts")
  }

  test("text_pii_scrub is a pure projection: zero exchanges, zero joins") {
    val plan = physical(graft.queries.TextAnalysisQueries.all, "text_pii_scrub")
    assert(!plan.contains("Exchange"), s"PII scrub must not shuffle:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), "PII scrub must not join")
  }

  test("embed_matryoshka_eval: both rankings stay probe-partitioned; probes broadcast") {
    val plan = physical(graft.queries.PipelineQueries.all, "embed_matryoshka_eval")
    assert(plan.contains("BroadcastExchange"), "probe side must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "corpus x probes must be the broadcast scan, not a cartesian")
  }

  test("text_span_corruption is map-only: zero exchanges, zero joins") {
    val plan = physical(graft.queries.TextAnalysisQueries.all, "text_span_corruption")
    assert(!plan.contains("Exchange"), s"span corruption must not shuffle:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), "span corruption must not join")
  }

  test("embed_random_projection folds per row: no join, one label-agg exchange") {
    val plan = physical(graft.queries.PipelineQueries.all, "embed_random_projection")
    assert(!plan.contains("Join"), "projection must not join")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected only the labels-sized agg exchange, got $exchanges")
  }

  test("quality_fasttext_score: model application is agg-only — no join anywhere") {
    val plan = physical(graft.queries.SignalQueries.all, "quality_fasttext_score")
    assert(!plan.contains("Join"), s"scoring must not join:\n${plan.take(1500)}")
  }

  test("join_bucketed_colocated: SMJ over bucketed scans — no shuffle, no sort") {
    val plan = physical(RelationalQueries.all, "join_bucketed_colocated")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
    // the ONLY exchange is the final 5-group agg — the join itself reads
    // co-located buckets with nothing in between
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"bucketed join must not shuffle (1 agg exchange only), got $exchanges:\n${plan.take(2000)}")
    // one file per bucket + sortBy at write time: no Sort feeds the SMJ
    val sorts = plan.linesIterator.count(l => l.contains("+- Sort ") || l.contains(":- Sort "))
    assert(sorts == 0, s"pre-sorted buckets must not re-sort, got $sorts:\n${plan.take(2000)}")
  }

  test("join_partition_pruned: the declared key's fact scan carries the DPP subquery") {
    val plan = physical(RelationalQueries.all, "join_partition_pruned")
    assert(plan.contains("dynamicpruningexpression"),
      s"no DPP subquery on the partitioned fact scan:\n${plan.take(2000)}")
  }

  test("multimodal_phash / dedup_url_normalize: only the fingerprint key shuffles") {
    for ((all, name) <- Seq(
      (graft.queries.PipelineQueries.all: Seq[Q], "multimodal_phash"),
      (graft.queries.DedupVariantQueries.all: Seq[Q], "dedup_url_normalize"))) {
      val plan = physical(all, name)
      assert(!plan.contains("Join"), s"$name must not join:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian")
    }
  }

  test("join_null_safe: the NULL-keyed dim broadcasts; no cartesian") {
    val plan = physical(RelationalQueries.all, "join_null_safe")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"<=> must stay a hash-joinable equality:\n${plan.take(1500)}")
  }

  test("dedup_delta_bloom: bloom probe filters the batch BELOW the exact fp join") {
    val df = queryNamed(graft.queries.DedupVariantQueries.all, "dedup_delta_bloom")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the map-side mightContain filter (xxhash64 of fp) must sit below the
    // (new x old) fingerprint join that consumes the suspected rows
    val lines = plan.linesIterator.toSeq
    val joinLine = lines.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    val probeLine = lines.indexWhere(_.contains("xxhash64"))
    assert(joinLine >= 0 && probeLine > joinLine,
      s"bloom must prefilter below the exact join:\n${plan.take(2000)}")
  }

  test("quality_spearman: every row_number rank window is band-partitioned") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "quality_spearman")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val rankWindows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.windowExpressions.exists(_.sql.contains("row_number"))
        => w
    }
    assert(rankWindows.nonEmpty, "the banded rank windows must survive optimization")
    assert(rankWindows.forall(_.partitionSpec.nonEmpty),
      "a permutation-rank window lost its band partitioning (whole-table single-task sort)")
  }

  test("tokenizer_coverage_curve: no corpus-scale window — the cumulative is banded on the frequency grid") {
    val df = queryNamed(graft.queries.TextAnalysisQueries.all, "tokenizer_coverage_curve")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val unpart = windows.filter(_.partitionSpec.isEmpty)
    // the ONLY legal unpartitioned window is bandedCumsum's offset prefix,
    // which orders by the band key over the band-grid-sized aggregate —
    // anything else is the r12 single-task vocab sort come back
    assert(unpart.forall(_.orderSpec.forall(_.sql.toLowerCase.contains("band"))),
      s"an unpartitioned window escaped the band-offset grid: " +
        s"${unpart.map(_.orderSpec.map(_.sql)).mkString("; ")}")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "the banded running-sum windows must survive optimization")
  }

  test("diff_catalog: one full-outer diff exchange per table pair, no cartesian") {
    val plan = physical(graft.queries.DiffQueries.all, "diff_catalog")
    assert(!plan.contains("CartesianProduct"), "spines/scalars must broadcast")
    val fullOuters = plan.linesIterator.count(_.contains("FullOuter"))
    assert(fullOuters == 3,
      s"expected exactly one full-outer per table pair (3 pairs), got $fullOuters")
  }

  test("stream_diff_stream batch twin: two (window,key) aggs meet in ONE full-outer, no cartesian") {
    val plan = physical(graft.queries.StreamingQueries.all, "stream_diff_stream")
    assert(!plan.contains("CartesianProduct"))
    val fullOuters = plan.linesIterator.count(_.contains("FullOuter"))
    assert(fullOuters == 1, s"expected one full-outer exchange, got $fullOuters")
    // r14 digest widening must ride the SAME partial aggregate — the sha
    // slice sums are just two more agg expressions, never an extra
    // shuffle: exactly one exchange per side feeding the join (plus the
    // join's own requirement satisfied by them), so the whole plan
    // carries exactly 2 data exchanges.
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"digest sums must not add an exchange — expected 2, got $exchanges\n$plan")
  }

  test("stream_diff_values batch twin: struct-max latest pick is window-free, one full-outer") {
    val df = queryNamed(graft.queries.StreamingQueries.all, "stream_diff_values")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "the latest pick must be a map-side struct MAX, never a row_number over raw traffic")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.linesIterator.count(_.contains("FullOuter")) == 1)
  }

  test("stream_diff_stream_multi: the composite key rides the SAME 2-exchange census plan (r15)") {
    // The keyed generalization's scale contract: an extra key column is
    // one more column in the hash — never an extra shuffle. Same pins as
    // the single-key census: two map-side-combinable (window, keys) aggs
    // meeting in exactly one full-outer, 2 hash exchanges total.
    val plan = physical(graft.queries.StreamingQueries.all, "stream_diff_stream_multi")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.linesIterator.count(_.contains("FullOuter")) == 1, plan.take(1200))
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"composite key must not add an exchange — expected 2, got $exchanges\n$plan")
  }

  test("stream_diff_values_multi / _any: keyed + any-payload latest picks stay window-free (r15)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("stream_diff_values_multi", "stream_diff_values_any")) {
      val df = queryNamed(graft.queries.StreamingQueries.all, name)
      assert(df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        s"$name: the latest pick must be a map-side struct MAX, " +
          "never a row_number over raw traffic")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), name)
      assert(plan.linesIterator.count(_.contains("FullOuter")) == 1, name)
      // the canonical payload string (any form) and the composite key
      // (multi form) are per-row projection work under the same
      // aggregate — exactly 2 hash exchanges, like every family member
      val exchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(exchanges == 2,
        s"$name: expected 2 hash exchanges, got $exchanges\n$plan")
    }
  }

  test("txn_delete_mor read: the dv subtraction is a broadcast left-anti, not a shuffle join") {
    import graft.sources.TxnLog
    val t = java.nio.file.Files.createTempDirectory("graft-planspec-dv-")
      .resolve("t").toString
    import spark.implicits._
    TxnLog.init((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    TxnLog.deleteWhere(spark, t, Seq(3L, 9L).toDF("id"), "id")
    val plan = TxnLog.read(spark, t).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"MOR subtraction must be a broadcast anti-join:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      "KB-sized tombstones must never shuffle the data side")
  }

  test("events_alert_hysteresis: all state windows share ONE user-keyed exchange") {
    val plan = physical(graft.queries.SignalQueries.all, "events_alert_hysteresis")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"LOCF state + flip + episode windows AND the episode agg must all ride " +
        s"ONE user-keyed exchange, got $exchanges:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("quality_psi: the bucket grid joins broadcast; corpus is scanned once per side-agg") {
    val plan = physical(graft.queries.AggWindowQueries.all, "quality_psi")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"the 10-row grid and scalar totals must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), "scalar frames must broadcast, not cartesian")
  }

  test("rank_ndcg: probes broadcast; the exact top-k windows stay probe-partitioned") {
    val df = queryNamed(graft.queries.PipelineQueries.all, "rank_ndcg")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "a ranking window lost its probe partitioning")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoop") || plan.contains("BroadcastExchange"),
      s"the 8-row probe frame must broadcast into the corpus scan:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), "probe fan-out went cartesian")
  }

  test("events_interarrival: lag window and per-user agg ride ONE user-keyed exchange") {
    val plan = physical(graft.queries.SignalQueries.all, "events_interarrival")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"the gap window and the power-sum agg must share one user-id " +
        s"partitioning, got $exchanges exchanges:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      "events_interarrival must not join")
  }

  test("r8h single-pass aggregates never join and shuffle at most once") {
    for (name <- Seq("quality_jarque_bera", "agg_geomean")) {
      val plan = physical(graft.queries.AggWindowQueries.all, name)
      assert(!plan.contains("Join"), s"$name must be a single agg pass, no join")
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1, s"$name shuffled $exchanges times:\n${plan.take(1200)}")
    }
  }

  test("r8h keys never go cartesian; bootstrap/heaps broadcast their tiny frames") {
    val all = graft.queries.AggWindowQueries.all ++ graft.queries.SignalQueries.all ++
      graft.queries.CurationQueries.all ++ graft.queries.FnQueries.all
    for (name <- Seq("window_rolling_median", "sample_bootstrap_ci",
        "text_heaps", "fn_edit_distance")) {
      val plan = physical(all, name)
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian")
    }
    // only 1-row frames (the four pass results and the CI endpoints) ride
    // nested loops — deliberate scalar-broadcast shapes; since the r8i lane
    // rewrite the replicate dimension lives in the aggregate lists, so the
    // corpus is never a nested-loop build side and never fans out ×B.
    val boot = physical(graft.queries.CurationQueries.all, "sample_bootstrap_ci")
    assert(boot.contains("BroadcastExchange"),
      s"bootstrap must broadcast its scalar frames:\n${boot.take(1200)}")
  }

  test("agg_heavy_hitters: the ≤k candidate set broadcasts into the exact re-count") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "agg_heavy_hitters")
    val (bhj, _, cart) = joinCensus(df)
    assert(cart == 0, "agg_heavy_hitters went cartesian")
    // pass 2 must join the token stream against the O(k) candidate frame
    // as a broadcast — a shuffle here would reshuffle the whole corpus
    // for a ≤64-row probe side.
    assert(bhj >= 1, "candidate re-count join must be a broadcast hash join")
  }

  test("r8i row-local keys plan zero exchanges (split/url/audio are projections)") {
    val all = graft.queries.PipelineQueries.all ++ graft.queries.FnQueries.all
    for (name <- Seq("split_temporal", "fn_url", "multimodal_audio_energy")) {
      val plan = physical(all, name)
      assert(!plan.contains("Exchange"), s"$name must not shuffle:\n${plan.take(1200)}")
      assert(!plan.contains("Join"), s"$name must not join")
    }
  }

  test("sim_join_sparse: prefix + verify joins stay equi — never cartesian or BNLJ") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.TextAnalysisQueries.all, "sim_join_sparse"))
    assert(cart == 0, "sim_join_sparse went cartesian")
    assert(bnlj == 0, s"$bnlj nested-loop joins — all joins must be token/id equi")
  }

  test("multimodal_scene_cuts: lag window and cut census share ONE id-keyed exchange") {
    val plan = physical(graft.queries.PipelineQueries.all, "multimodal_scene_cuts")
    assert(!plan.contains("Join"), "scene cuts must not join")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"the lag window and the per-id census must ride one id partitioning, " +
        s"got $exchanges:\n${plan.take(1200)}")
  }

  test("diff_partition_summary: census is a partial agg over the diff — no cartesian") {
    val df = queryNamed(graft.queries.DiffQueries.all, "diff_partition_summary")
    val (_, bnlj, cart) = joinCensus(df)
    assert(cart == 0 && bnlj == 0, "partition census must stay equi")
    val plan = df.queryExecution.executedPlan.toString
    // map-side reduction: the census must plan partial+final HashAggregates
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"census must reduce map-side:\n${plan.take(1200)}")
  }

  test("scan_file_census reads ONLY scan metadata — no table fields in ReadSchema") {
    val plan = physical(graft.queries.RelationalQueries.all, "scan_file_census")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_"),
      s"file census must not read data columns: $readSchema")
  }

  test("diff_schema_drift prunes one-sided columns BEFORE the join exchange") {
    val df = queryNamed(graft.queries.DiffQueries.all, "diff_schema_drift")
    // pin on the JOIN NODE's input schemas (cached fixtures print their
    // one-time build plan as a leaf, which legitimately reads all columns)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == FullOuter => j
    }
    assert(joins.size == 1, "drifted diff must stay one full-outer join")
    val joinInputs = joins.head.children.flatMap(_.output.map(_.name)).toSet
    assert(!joinInputs.contains("o_orderpriority") && !joinInputs.contains("o_flag"),
      s"one-sided columns survived past the pre-join pruning: $joinInputs")
  }

  test("agg_percentile fetches order statistics — no value-buffering percentile aggregate") {
    val df = queryNamed(graft.queries.AggWindowQueries.all, "agg_percentile")
    val plan = df.queryExecution.executedPlan.toString
    // the built-in `percentile` is a TypedImperativeAggregate that buffers
    // every group value on one executor — the banded rewrite must keep it
    // out of the plan entirely
    assert(!plan.contains("percentile("),
      s"value-buffering percentile survived the banded rewrite:\n${plan.take(1200)}")
    assert(plan.contains("row_number"), "banded rank fetch missing")
    val (_, _, cart) = joinCensus(df)
    assert(cart == 0, "agg_percentile went cartesian")
  }

  test("sample_balanced: data-dependent cap broadcasts; rank windows stay band-partitioned") {
    val df = queryNamed(graft.queries.CurationQueries.all, "sample_balanced")
    val plan = df.queryExecution.executedPlan.toString
    // the min-class-size cap must be a 1-row broadcast, never a collect
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"cap must ride a scalar broadcast:\n${plan.take(1200)}")
    // no row_number window over a whole language: every window partitioned
    assert(!plan.contains("No Partition Defined"), "global window leaked")
    val (_, _, cart) = joinCensus(df)
    assert(cart == 0, "sample_balanced went cartesian")
  }

  test("diff_unkeyed: counts collapse BEFORE the join; one full-outer, no cartesian") {
    val df = queryNamed(graft.queries.DiffQueries.all, "diff_unkeyed")
    val outers = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == FullOuter => j
    }
    assert(outers.size == 1, "bag diff must be exactly one full-outer join")
    // both join inputs must already be count frames — the shuffle moves
    // one row per distinct value, never one per duplicate
    outers.head.children.foreach { side =>
      val agg = side.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(agg.nonEmpty, s"join side not pre-aggregated:\n${side.toString.take(600)}")
    }
    val (_, _, cart) = joinCensus(df)
    assert(cart == 0, "diff_unkeyed went cartesian")
  }

  test("graph_cluster_coeff: wedge + corner joins stay equi — never cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.PipelineQueries.all, "graph_cluster_coeff"))
    assert(cart == 0, "graph_cluster_coeff went cartesian")
    assert(bnlj == 0, s"$bnlj nested-loop joins — every join must be vertex-id equi")
  }

  test("sim_search_hamming: one scan of the 2-word code table, zero corpus shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = queryNamed(graft.queries.PipelineQueries.all, "sim_search_hamming")
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val plan = strip(df.queryExecution.executedPlan)
    // The binary tier's whole point is bandwidth: the query is a probe
    // broadcast + one pass over the 16-byte-per-vector code cache +
    // TakeOrderedAndProject — any shuffle of the corpus defeats it.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"corpus shuffle in sim_search_hamming:\n${plan.toString.take(2000)}")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      "hamming top-k fell back to a global sort")
  }

  test("diff_map_types: one full-outer join, no cartesian, map compare stays codegen builtins") {
    val df = queryNamed(graft.queries.DiffQueries.all, "diff_map_types")
    val plan = df.queryExecution.executedPlan.toString
    val (_, _, cart) = joinCensus(df)
    assert(cart == 0, "diff_map_types went cartesian")
    assert(plan.contains("FullOuter"),
      s"expected a full-outer key join:\n${plan.take(1500)}")
    assert(!plan.contains("ScalaUDF"), "map compare must be builtin expressions, not UDFs")
  }

  test("sql_analytic_q3: dim broadcast, big joins equi, top-k never a global sort") {
    val df = queryNamed(graft.queries.RelationalQueries.all, "sql_analytic_q3")
    val plan = df.queryExecution.executedPlan.toString
    val (_, _, cart) = joinCensus(df)
    assert(cart == 0, "q3 went cartesian")
    assert(plan.contains("BroadcastHashJoin"), "customer dim must broadcast")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 fell back to a global sort")
  }

  test("join_geo_knn: every round joins equi on cells — never cartesian") {
    val (_, bnlj, cart) =
      joinCensus(queryNamed(graft.queries.RelationalQueries.all, "join_geo_knn"))
    assert(cart == 0, "join_geo_knn went cartesian")
    assert(bnlj == 0, s"$bnlj nested-loop joins — ring candidates must ride the cell equi-join")
  }

  test("events_out_of_order: lag window keyed on (event_type, band) + bands-sized stitch") {
    // r10 de-funneled the raw-row PARTITION BY event_type lag (one task per
    // low-cardinality type) into a banded two-phase: a per-(type, band)
    // local lag over 65536-id slices, then a boundary stitch whose window
    // runs over the BANDS-sized per-band aggregate (n/65536 rows), never
    // the raw rows. Pin both window keys so a future refactor can't
    // silently restore the per-type funnel.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.SignalQueries.all, "events_out_of_order")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.size == 2, s"expected local lag + stitch = 2 windows, got ${windows.size}")
    val keySets = windows.map(_.partitionSpec.map(_.sql.toLowerCase).toSet)
    assert(keySets.exists(k => k.size == 2 && k.exists(_.contains("band"))),
      s"local lag lost its (event_type, band) key — per-type raw-row funnel is back: $keySets")
    val stitch = windows.find(_.partitionSpec.size == 1).getOrElse(
      fail(s"no bands-sized stitch window found: $keySets"))
    // The stitch must consume the per-band AGGREGATE (its child plan
    // contains the groupBy), not the raw event rows.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    assert(stitch.child.collectFirst { case a: Aggregate => a }.nonEmpty,
      "stitch window runs over raw rows, not the bands-sized per-band aggregate")
  }

  test("diff_report: stat sections ride the local 4-row aggregate — exactly ONE lazy join") {
    // r11: the lazy composition re-executed the full-outer diff once per
    // Union branch (4 joins observed). The fix collects the ≤4-row
    // per-status aggregate into a LocalRelation, leaving the examples
    // top-k as the single lazy join. Pin both properties.
    val df = queryNamed(graft.queries.DiffQueries.all, "diff_report")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size == 1 && joins.head.joinType == FullOuter,
      s"expected exactly one lazy FullOuter (examples), got ${joins.map(_.joinType)}")
    val locals = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
    assert(locals.nonEmpty,
      "stat sections must project from the collected local aggregate")
  }

  test("Q.requireBand genuinely fires: a violated band fails the query at runtime") {
    // The 7 no-oracle keys' in-query error bands are only worth anything
    // if assert_true actually evaluates — pin that a data-dependent FALSE
    // condition throws and a TRUE one passes rows through untouched.
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("v")
    assert(Q.requireBand(df, col("v") < 10, "ok").count() == 3)
    val e = intercept[Exception] {
      Q.requireBand(df, col("v") < 3, "band violated").count()
    }
    assert(e.getMessage != null && e.getMessage.contains("band violated"),
      s"wrong failure: $e")
  }

  test("sql_diff_tvf: the spliced TVF plan is diff_full's plan — one FullOuter, nothing else") {
    // The TVF's claim is PLAN equivalence with the Scala API (it splices
    // the analyzed Differ.diff subtree at analysis time). Pin the shape:
    // exactly the one full-outer key join, no extra joins or aggregates.
    val df = queryNamed(graft.queries.DiffQueries.all, "sql_diff_tvf")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins == Seq(FullOuter), s"TVF plan drifted from diff_full's: $joins")
  }

  test("stream_diff: stateless single left-outer join — no full-outer, no aggregate, no window") {
    // The same body must run under readStream: stream-static left joins
    // are stateless and append-safe; a full-outer, aggregate or window in
    // this plan would be a behavior change that breaks the streaming twin.
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = queryNamed(graft.queries.DiffQueries.all, "stream_diff")
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j.joinType }
    assert(joins == Seq(LeftOuter), s"expected exactly one LeftOuter: $joins")
    assert(plan.collect { case a: Aggregate => a }.isEmpty, "stateful aggregate crept in")
    assert(plan.collect { case w: LWindow => w }.isEmpty, "window crept in")
  }

  test("window_theil_sen: band-sized rank window + broadcast hot-band join") {
    // r10 replaced the per-type pairs-sized row_number (days²/type through
    // one task) with a banded order-statistic fetch: only the ONE hot band
    // per type is ever row_numbered, fetched via a broadcast join against
    // the bands-sized hot list. Pin: the rank window is keyed on
    // (event_type, bnd), and the hot-band fetch is a BroadcastHashJoin.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = queryNamed(graft.queries.SignalQueries.all, "window_theil_sen")
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val rankKeys = windows.map(_.partitionSpec.map(_.sql.toLowerCase).toSet)
    // r12: the rank window is keyed on the REFINED (event_type, bnd, fbnd)
    // cell — fine-cell-sized, never hot-band-sized, never pairs-sized.
    assert(rankKeys.exists(k => k.size == 3 && k.exists(_.contains("fbnd"))),
      s"rank window lost its (event_type, bnd, fbnd) cell key — funnel is back: $rankKeys")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"hot-band fetch must broadcast the bands-sized hot list:\n${physical.take(1500)}")
  }

  test("diff_compose: ONE changeset-sized full-outer join on top of the two hop diffs (r12)") {
    // The fold itself must add exactly one join: the two input changesets
    // each carry their own full-outer (that's diff), and composing them is
    // a third full-outer over diff-SIZED frames plus pure projection —
    // any aggregate or extra join here means the fold re-read a snapshot.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val df = queryNamed(DiffQueries.all, "diff_compose")
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j.joinType }
    assert(joins == Seq(FullOuter, FullOuter, FullOuter),
      s"expected the 2 hop diffs + 1 compose join, all full-outer: $joins")
    assert(plan.collect { case a: Aggregate => a }.isEmpty,
      "compose must be a pure projection fold — an aggregate crept in")
  }

  test("diff_rank_drift: both top-k's are TakeOrdered — never a global snapshot sort (r12)") {
    val plan = physical(DiffQueries.all, "diff_rank_drift")
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"expected two TakeOrderedAndProject top-k's:\n${plan.take(1500)}")
    // The only Sort allowed is the k-bounded window's local sort; a Sort
    // directly over an orders scan would be the global-sort regression.
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global range-sort of a snapshot crept in:\n${plan.take(1500)}")
  }

  test("diff_binary_digest: the digest computes BELOW the join — no blob crosses the exchange") {
    // digestCols' whole point: the full-outer exchange ships 64 hex chars
    // per cell, never the payload bytes. Pin: every join input projects a
    // sha2 over the payload (digest below the join), and no join OUTPUT
    // column is binary-typed.
    val df = queryNamed(DiffQueries.all, "diff_binary_digest")
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        assert(!side.output.exists(_.dataType ==
          org.apache.spark.sql.types.BinaryType),
          s"a binary column reached the join input: ${side.output.map(_.dataType)}")
      }
    }
    assert(plan.toString.toLowerCase.contains("sha2"),
      "digest projection vanished from the plan")
  }

  test("diff_fk_gate: changeset probes a BROADCAST dim key set; census agg is partial") {
    val plan = physical(DiffQueries.all, "diff_fk_gate")
    assert(plan.contains("BroadcastHashJoin"),
      s"dim key set must broadcast:\n${plan.take(1500)}")
    assert(plan.contains("partial_count"),
      s"gate census lost its map-side combine:\n${plan.take(1500)}")
  }

  test("curation_incremental: ONE full-outer (the changeset diff) + broadcast retract anti join") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = queryNamed(graft.queries.CurationQueries.all, "curation_incremental")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins.count(_ == FullOuter) == 1,
      s"exactly one full-outer (the changeset diff) expected: $joins")
    assert(joins.contains(LeftAnti), s"retract anti join missing: $joins")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the changeset-sized retract list must broadcast")
  }

  test("stream_diff_complete: snapshot side broadcasts; agg is partial (map-side combinable)") {
    // The expected frame is windows × snapshot with BOTH sides broadcast-
    // sized by contract; the only data-sized exchange is the (window, key)
    // census agg + the full-outer join on the same key. Pin: at least one
    // broadcast join, and the census HashAggregate runs partial-final
    // (map-side combine), not a single-exchange complete mode.
    val plan = physical(graft.queries.StreamingQueries.all, "stream_diff_complete")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"snapshot/window sides must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"),
      s"census aggregate lost its map-side combine:\n${plan.take(2000)}")
  }
}
