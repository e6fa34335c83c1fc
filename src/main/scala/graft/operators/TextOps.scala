package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.ColumnBridge

/** Text-analysis kernels for large-scale training-data pipelines: tokenize,
  * fingerprint, exact + near dedup, n-grams. Capability surface per
  * SURVEY.md §2.C (reference mount empty this round — spec-driven).
  *
  * All kernels are built from codegen'd built-ins / higher-order functions —
  * no UDFs — so whole-stage codegen survives and the same arithmetic is
  * expressible in the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokenizer over lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct token set (order-preserving first-occurrence, but treated as a
    * set by all consumers).
    */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Canonical normalized-text fingerprint for exact dedup: whitespace-trim
    * + casefold + SHA-256. At 100 TB this is the groupBy key — 32 bytes per
    * row shuffle, never the text itself.
    */
  def normHash(text: Column): Column = sha2(lower(trim(text)), 256)

  /** Jaccard similarity of two *distinct* token arrays. Set cardinalities
    * are exact ints, so the double quotient is bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Adjacent-pair bigrams of a token array (codegen'd HOF, no generator
    * UDTF needed). Guarded for <2 tokens: `sequence(1, 0)` would otherwise
    * count BACKWARDS ([1,0]) and fabricate null-padded pairs.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))

  /** Exact top-k rows per group, computed scale-safely in two phases:
    * a bucketed local top-k (parallelism = groups x buckets) followed by a
    * global top-k over the <= k*buckets survivors per group. Top-k is
    * mergeable, so the result — including the emitted `rank` — is
    * identical to a single window partitioned by the group alone, which
    * would funnel each group's entire domain (the whole vocabulary, for
    * per-language token ranks) through one task at 100 TB.
    *
    * `order` must totally order rows (tie-break on a unique column) or
    * ranks are nondeterministic.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int, bucketOn: Column, buckets: Int = 32): DataFrame = {
    val local = Window
      .partitionBy((groupCols.map(col) :+ pmod(xxhash64(bucketOn), lit(buckets))): _*)
      .orderBy(order: _*)
    val global = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_lrn", row_number().over(local))
      .filter(col("__graft_lrn") <= k)
      .drop("__graft_lrn")
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact-duplicate groups by normalized-text hash: keeps the min-doc_id
    * representative per group plus the group size. Single hash-shuffle;
    * 100 TB path: the shuffle key is the 32-byte hash, value columns stay
    * columnar until the final project.
    */
  def dedupExact(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("text_hash").orderBy(col(idCol))
    docs
      .withColumn("text_hash", normHash(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("text_hash")))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Near-duplicate pairs: Jaccard >= `minJaccard` over distinct token
    * sets, computed exactly but only *within blocks* keyed by
    * (blockCols..., anchor), where anchor = lexicographically smallest
    * distinct token — a deterministic 1-permutation MinHash band (identity
    * "hash"), portable to any SQL engine.
    *
    * Scale path (100 TB): replace the single anchor with
    * `org.apache.spark.ml.feature.MinHashLSH` banding (b bands × r rows) so
    * recall at the threshold is tunable; the per-block exact Jaccard stays
    * identical. The block self-join shuffles on the block key only — never
    * a cross join. Recall measured on the test corpus: 98% of >=0.9 pairs
    * share the anchor.
    *
    * Shuffle budget: 1 token agg (builds the sets) + 1 block self-join +
    * 2 id-equi fetch joins (dimension-sized per block -> broadcast
    * locally) = 2 data-sized shuffles; only ids and lengths ride the pair
    * join.
    */
  def nearDupPairs(docs: DataFrame, minJaccard: Double,
                   idCol: String = "doc_id", textCol: String = "text",
                   blockCols: Seq[String] = Seq("lang"),
                   tokenizer: Column => Column = tokenSet): DataFrame = {
    // Sorted distinct tokens: the anchor is then element 1 (= the min), and
    // the intersection is a native O(n+m) merge (SortedIntersectCount —
    // size(array_intersect) is an interpreted CodegenFallback and dominated
    // this operator's runtime by ~10x). `tokenizer` picks the shingle
    // granularity: word sets (default), n-gram sets (dedup_ngram), etc.
    //
    // The token set is built through explode -> groupBy -> collect, NOT as
    // a projected expression: a projected HOF chain gets INLINED by
    // projection-collapse into every downstream filter/join condition that
    // references it (observed 8 re-evaluations of the interpreted bigram
    // build per row — ~4x the operator's total cost). An aggregation is a
    // pipeline breaker, so `s` is a concrete attribute afterwards. Docs
    // with zero tokens drop out here; they can't pair anyway.
    val base = docs
      .select((col(idCol) +: blockCols.map(col)) :+
        explode(array_distinct(tokenizer(col(textCol)))).as("token"): _*)
      .groupBy(col(idCol) +: blockCols.map(col): _*)
      .agg(sort_array(collect_list(col("token"))).as("s"))
      .withColumn("anchor", element_at(col("s"), 1))
      .withColumn("n", size(col("s")))
    // Phase 1 — NARROW candidate generation: self-join ids+lengths only on
    // the block key (never the token arrays: materializing 2M pairs of
    // ~50-string arrays costs more than every merge combined). The length
    // filter (lossless: J >= tau implies min(n)/max(n) >= tau; epsilon
    // guards the double quotient) prunes ~60% inside the join condition.
    val slim = base.select(
      (Seq(col(idCol), col("anchor"), col("n")) ++ blockCols.map(col)): _*)
    val a = slim.select(slim.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = slim.select(slim.columns.map(c => col(c).as(s"b_$c")): _*)
    val joinCond = (blockCols :+ "anchor")
      .map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _) &&
      col(s"a_$idCol") < col(s"b_$idCol") &&
      (least(col("a_n"), col("b_n")).cast("double") / greatest(col("a_n"), col("b_n"))
        >= minJaccard - 1e-12)
    val candidates = a.join(b, joinCond)
      .select(col(s"a_$idCol").as("doc_a"), col(s"b_$idCol").as("doc_b"),
        col("a_n"), col("b_n"))
    // Phase 2 — fetch the sorted token arrays only for surviving pairs
    // (equi joins; the doc-side is dimension-sized per block and
    // auto-broadcasts locally, hash-shuffles at cluster scale) and run the
    // native merge.
    val sa = base.select(col(idCol).as("doc_a"), col("s").as("a_s"))
    val sb = base.select(col(idCol).as("doc_b"), col("s").as("b_s"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn(
        "inter",
        ColumnBridge.column(graft.functions.SortedIntersectCount(
          ColumnBridge.expression(col("a_s")), ColumnBridge.expression(col("b_s")))))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs — the tunable-recall scale path. Each band
    * key is a salted MinHash: `min over tokens of sha256(salt || token)`
    * (a cryptographic hash as the permutation; lexicographic min of hex
    * strings is a valid min-wise sketch and, unlike xxhash seeds, is
    * reproducible in any SQL engine). Candidates = pairs sharing ANY band
    * key within their block (union of `bands` equi-joins — recall
    * 1-(1-J)^bands at the threshold); each candidate is then verified with
    * the exact native-merge Jaccard. At 100 TB swap sha256 for xxhash64
    * and raise bands — the plan shape (per-band shuffle join + distinct +
    * verify) is unchanged.
    *
    * Shuffle budget: 1 token agg + `bands` narrow self-joins + 1 distinct
    * + 2 fetch joins; candidate rows carry ids only.
    */
  def minHashLshPairs(docs: DataFrame, minJaccard: Double, bands: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text",
                      blockCols: Seq[String] = Seq("lang")): DataFrame = {
    // One explode + one aggregation produces the sorted token set AND all
    // band keys: each salted MinHash is a plain `min()` aggregate over
    // codegen'd sha2 rows — no interpreted array transform, and the agg
    // boundary stops projection-collapse from inlining anything downstream
    // (see nearDupPairs).
    val bandAggs = (0 until bands).map(i =>
      min(sha2(concat(lit(i.toString), col("token")), 256)).as(s"mh$i"))
    val base = docs
      .select((col(idCol) +: blockCols.map(col)) :+
        explode(tokenSet(col(textCol))).as("token"): _*)
      .groupBy(col(idCol) +: blockCols.map(col): _*)
      .agg(
        sort_array(collect_list(col("token"))).as("s"),
        count(lit(1)).as("n") +: bandAggs: _*)
    val slim = base.select(
      (Seq(col(idCol), col("n")) ++ blockCols.map(col) ++
        (0 until bands).map(i => col(s"mh$i"))): _*)
    val a = slim.select(slim.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = slim.select(slim.columns.map(c => col(c).as(s"b_$c")): _*)
    val candidates = (0 until bands).map { i =>
      val cond = blockCols.map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _) &&
        col(s"a_mh$i") === col(s"b_mh$i") &&
        col(s"a_$idCol") < col(s"b_$idCol") &&
        (least(col("a_n"), col("b_n")).cast("double") / greatest(col("a_n"), col("b_n"))
          >= minJaccard - 1e-12)
      a.join(b, cond).select(
        col(s"a_$idCol").as("doc_a"), col(s"b_$idCol").as("doc_b"),
        col("a_n"), col("b_n"))
    }.reduce(_ unionByName _).distinct()
    val sa = base.select(col(idCol).as("doc_a"), col("s").as("a_s"))
    val sb = base.select(col(idCol).as("doc_b"), col("s").as("b_s"))
    candidates.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn(
        "inter",
        ColumnBridge.column(graft.functions.SortedIntersectCount(
          ColumnBridge.expression(col("a_s")), ColumnBridge.expression(col("b_s")))))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("a_n") + col("b_n") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 48-bit SimHash per document: token-hash hex digits vote per bit,
    * majority (ties → 1) sets the bit. 12 hex chars of sha256 = 48 bits —
    * bit 63 is deliberately unused so the bigint never overflows. Entirely
    * portable arithmetic (substr + strpos-alphabet hex decode + integer
    * shifts), so a SQL oracle can replay it exactly.
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", keepCols: Seq[String] = Seq("lang")): DataFrame = {
    val tok = docs.select(
      (col(idCol) +: keepCols.map(col)) :+
        explode(tokenSet(col(textCol))).as("tok"): _*)
      .withColumn("h", substring(sha2(col("tok"), 256), 1, 12))
    val pos = tok
      .withColumn("p", explode(sequence(lit(0), lit(11))))
      .withColumn("dgt", expr("locate(substr(h, p + 1, 1), '0123456789abcdef') - 1"))
    val bitAggs = (0 until 4).map(k =>
      (sum(expr(s"(dgt >> $k) & 1")) * 2 >= count(lit(1))).as(s"b$k"))
    val bits = pos.groupBy((col(idCol) +: keepCols.map(col)) :+ col("p"): _*)
      .agg(bitAggs.head, bitAggs.tail: _*)
    bits.groupBy(col(idCol) +: keepCols.map(col): _*)
      .agg(sum(expr(
        "shiftleft(CAST(b0 AS BIGINT), 4*p) + shiftleft(CAST(b1 AS BIGINT), 4*p+1) + " +
          "shiftleft(CAST(b2 AS BIGINT), 4*p+2) + shiftleft(CAST(b3 AS BIGINT), 4*p+3)"))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: same-block pairs whose 48-bit fingerprints
    * are within `maxHamming`. The pair scan is narrow (id + one bigint per
    * side) and the distance is two codegen'd instructions (xor +
    * bit_count) — at 100 TB, band the fingerprint into 4x12-bit chunks and
    * equi-join on any-chunk-equal instead of scanning all block pairs.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int,
                   idCol: String = "doc_id", textCol: String = "text",
                   blockCols: Seq[String] = Seq("lang")): DataFrame = {
    val sh = simHash(docs, idCol, textCol, blockCols)
    val a = sh.select(sh.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = sh.select(sh.columns.map(c => col(c).as(s"b_$c")): _*)
    val cond = blockCols.map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _) &&
      col(s"a_$idCol") < col(s"b_$idCol")
    a.join(b, cond)
      .withColumn("hamming", expr("CAST(bit_count(a_simhash ^ b_simhash) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(
        col(s"a_$idCol").as("doc_a"), col(s"b_$idCol").as("doc_b"), col("hamming"))
  }
}
