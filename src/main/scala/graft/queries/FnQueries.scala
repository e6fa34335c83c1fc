package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** §2.B sort/limit/set ops + scalar-function families + UDF/UDAF/UDTF
  * surface. One composite query per function family keeps the inventory
  * honest without 50 micro-queries.
  */
object FnQueries {

  def all: Seq[Q] = Seq(
    Q("sort_limit_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, d) =>
      // Plans to TakeOrderedAndProject: per-partition top-k + driver merge,
      // never a global sort.
      Tables.cachedTable(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },

    Q("set_union_all",
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events WHERE event_type = 'error'
        |UNION ALL
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events WHERE event_type = 'signup'""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts_us", "event_type")
      e.filter(col("event_type") === "error")
        .unionByName(e.filter(col("event_type") === "signup"))
    },

    Q("set_union_distinct",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin) {
      (s, d) =>
        // Plain UNION (distinct): the set form the ALL variant can't
        // express — one hash-dedup shuffle over the concatenated sides
        // with map-side partial dedup; at 100 TB the dedup key is the
        // projected column only, never whole rows.
        Tables.cachedTable(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
          .union(Tables.cachedTable(s, d, "customer")
            .filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("o_custkey")))
          .distinct()
    },

    // Schema-drift union (r8g): unionByName(allowMissingColumns) — the
    // multi-source ingestion reality where feeds share a core schema but
    // each carries extra columns (v1 lacks priority, v2 lacks status);
    // positional UNION would silently misalign columns, by-name union
    // NULL-pads the gaps. The oracle writes the padding out explicitly,
    // which is exactly what the operator must compile to. Map-only
    // reshape; at 100 TB the win is that NO side is rewritten to a
    // common schema first.
    Q("set_union_schema_drift",
      """SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority, 'v1' AS src
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, NULL AS o_orderstatus, o_orderpriority, 'v2' AS src
        |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin) { (s, d) =>
      val o = Tables.cachedTable(s, d, "orders")
      val v1 = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), lit("v1").as("src"))
      val v2 = o.filter(col("o_orderkey") % 3 === 1)
        .select(col("o_orderkey"), col("o_orderpriority"), lit("v2").as("src"))
      v1.unionByName(v2, allowMissingColumns = true)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "src")
    },

    // Multiset set-ops (r8g): EXCEPT ALL / INTERSECT ALL keep
    // MULTIPLICITY — "remove one occurrence per match", the bag semantics
    // reconciliation jobs need (the distinct forms set_except/
    // set_intersect silently collapse duplicate keys, understating
    // mismatches). Plans as a count-per-key agg + arithmetic on counts,
    // never a row-by-row anti-join — |distinct keys| state at any scale.
    Q("set_except_all",
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin) {
      (s, d) =>
        Tables.cachedTable(s, d, "orders").select("o_custkey")
          .exceptAll(
            Tables.cachedTable(s, d, "customer")
              .filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
    },

    Q("set_intersect_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) {
      (s, d) =>
        val o = Tables.cachedTable(s, d, "orders")
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersectAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
    },

    Q("set_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .intersect(
          Tables.cachedTable(s, d, "orders")
            .filter(col("o_orderstatus") === "F").select("o_custkey"))
    },

    Q("set_except",
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "orders").select("o_custkey")
        .except(
          Tables.cachedTable(s, d, "customer")
            .filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
    },

    Q("fn_string",
      """SELECT p_partkey,
        |       upper(p_name) AS up_name,
        |       substr(p_name, 1, 5) AS pfx,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       trim(p_name) AS trimmed
        |FROM part""".stripMargin) { (s, d) =>
      Tables.table(s, d, "part").selectExpr(
        "p_partkey",
        "upper(p_name) AS up_name",
        "substr(p_name, 1, 5) AS pfx",
        "CAST(length(p_name) AS BIGINT) AS name_len",
        "concat_ws('-', p_brand, p_type) AS brand_type",
        "regexp_extract(p_name, '([a-z]+)', 1) AS first_word",
        "trim(p_name) AS trimmed")
    },

    // URL-function surface (r8i): Spark's parse_url (PROTOCOL / HOST /
    // PATH / QUERY / single-param extraction) over closed-form URLs built
    // from customer keys — dedup_url_normalize exercises canonicalization
    // semantics; this key pins the parser itself. DuckDB has no parse_url,
    // so the oracle REBUILDS each component arithmetically from the same
    // key formula — a component boundary bug (query '?' kept in the path,
    // host case, missing-param NULL vs '') flips the hash. Row-local
    // codegen'd string work: parsing a trillion crawl URLs is a
    // projection, no shuffle.
    Q("fn_url",
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |       'https' AS protocol,
        |       'www.site' || CAST(c_custkey % 50 AS VARCHAR) || '.example.com' AS host,
        |       '/p/' || CAST(c_custkey % 100 AS VARCHAR) AS path,
        |       CASE WHEN c_custkey % 5 <= 1
        |            THEN 'ref=' || CAST(c_custkey % 7 AS VARCHAR) END AS query_str,
        |       CASE WHEN c_custkey % 5 <= 1
        |            THEN CAST(c_custkey % 7 AS VARCHAR) END AS ref
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "customer")
        .select(col("c_custkey").cast("long").as("id"))
        .withColumn("url", concat(
          lit("https://www.site"), (col("id") % 50).cast("string"),
          lit(".example.com/p/"), (col("id") % 100).cast("string"),
          when(col("id") % 5 <= 1,
            concat(lit("?ref="), (col("id") % 7).cast("string")))
            .otherwise(lit(""))))
        .select(col("id"),
          parse_url(col("url"), lit("PROTOCOL")).as("protocol"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query_str"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
    },

    // Builtin edit-distance parity (r8h): Spark's codegen'd levenshtein
    // against DuckDB's — ring-paired nation names (i vs i+1 mod 25) plus
    // each name against its reverse, so the gate covers asymmetric
    // lengths, shared prefixes, and palindromic degenerate cases. This is
    // the fn-surface twin of dedup_edit's BoundedLevenshtein KERNEL: the
    // kernel exists for banded early-exit at corpus scale; the builtin is
    // what ad-hoc SQL reaches for, and both must mean the same metric.
    // Scale: row-local string ops on a dimension table — no shuffle, no
    // oracle subtlety; O(len²) per pair on bounded name lengths.
    Q("fn_edit_distance",
      """WITH n AS (SELECT n_nationkey, n_name FROM nation),
        |p AS (SELECT a.n_nationkey, a.n_name AS name_a, b.n_name AS name_b
        |      FROM n a JOIN n b ON b.n_nationkey = (a.n_nationkey + 1) % 25)
        |SELECT n_nationkey, name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist_next,
        |       CAST(levenshtein(name_a, reverse(name_a)) AS BIGINT) AS dist_rev,
        |       CAST(levenshtein(name_a, name_a) AS BIGINT) AS dist_self
        |FROM p""".stripMargin) { (s, d) =>
      val n = Tables.cachedTable(s, d, "nation").select("n_nationkey", "n_name")
      n.as("a").join(n.as("b"),
          col("b.n_nationkey") === (col("a.n_nationkey") + 1) % 25)
        .select(col("a.n_nationkey").as("n_nationkey"),
          col("a.n_name").as("name_a"), col("b.n_name").as("name_b"))
        .selectExpr("n_nationkey", "name_a", "name_b",
          "CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist_next",
          "CAST(levenshtein(name_a, reverse(name_a)) AS BIGINT) AS dist_rev",
          "CAST(levenshtein(name_a, name_a) AS BIGINT) AS dist_self")
    },

    Q("fn_date",
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mth,
        |       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "orders").selectExpr(
        "o_orderkey",
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start",
        "CAST(year(o_orderdate) AS BIGINT) AS yr",
        "CAST(month(o_orderdate) AS BIGINT) AS mth",
        // Spark datediff(end, start) vs DuckDB date_diff(part, start, end)
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) AS days_since",
        "add_months(CAST(o_orderdate AS DATE), 3) AS plus3m")
    },

    // String collations (r8g, Spark 4): case-insensitive equality as a
    // TYPE property instead of lower()-wrapping every predicate — what
    // entity resolution over mixed-case feeds wants, and unlike lower()
    // the collation survives into joins/groupBys as a hash-compatible
    // key (Spark hashes the collation key, so CI groupBy is ONE shuffle,
    // not lower() projections on both sides). Fixture: every even key's
    // name is uppercased; CS distinct sees both casings, UNICODE_CI
    // distinct collapses them. The oracle expresses the same semantics
    // with lower() (exact for this ASCII fixture — the point where the
    // two diverge, Unicode case folding, has no carrier in the corpus).
    Q("fn_collation",
      """WITH m AS (
        |  SELECT p_partkey,
        |         CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS mixed,
        |         p_name
        |  FROM part)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT mixed) AS BIGINT) AS n_cs_distinct,
        |       CAST(count(DISTINCT lower(mixed)) AS BIGINT) AS n_ci_distinct,
        |       CAST(sum(CASE WHEN lower(mixed) = lower(p_name) THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_ci_eq
        |FROM m""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "part")
        .select(col("p_partkey"), col("p_name"),
          when(col("p_partkey") % 2 === 0, upper(col("p_name")))
            .otherwise(col("p_name")).as("mixed"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("mixed")).as("n_cs_distinct"),
          countDistinct(expr("collate(mixed, 'UNICODE_CI')")).as("n_ci_distinct"),
          sum(when(expr("collate(mixed, 'UNICODE_CI') = collate(p_name, 'UNICODE_CI')"),
            1L).otherwise(0L)).as("n_ci_eq"))
    },

    Q("fn_math",
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS ad,
        |       CAST(ceil(l_quantity) AS BIGINT) AS cq,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS fp,
        |       sqrt(l_extendedprice) AS sq,
        |       l_tax * l_tax AS tax2
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "lineitem").selectExpr(
        "l_orderkey", "l_linenumber",
        "abs(l_discount - 0.05d) AS ad",
        "CAST(ceil(l_quantity) AS BIGINT) AS cq",
        "CAST(floor(l_extendedprice) AS BIGINT) AS fp",
        "sqrt(l_extendedprice) AS sq",
        "l_tax * l_tax AS tax2")
    },

    Q("fn_bitwise",
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS b_and,
        |       o_orderkey | 4096 AS b_or,
        |       xor(o_orderkey, 170) AS b_xor,
        |       o_orderkey << 3 AS b_shl,
        |       o_orderkey >> 2 AS b_shr,
        |       CAST(bit_count(o_orderkey) AS BIGINT) AS b_cnt
        |FROM orders""".stripMargin) { (s, d) =>
      // Bitwise-operator surface (r8g): AND/OR/XOR masks, shifts, popcount
      // — the ops flag-packing, bucket addressing (CountMinSketch.slotCol),
      // and bitmap codecs are built from. Dialect note: XOR is infix ^ in
      // Spark SQL but the xor() function in DuckDB; shifts are shiftleft/
      // shiftright functions in Spark, infix <<//>> in DuckDB. All pure
      // per-row integer codegen — map-only at any scale.
      Tables.cachedTable(s, d, "orders").selectExpr(
        "o_orderkey",
        "o_orderkey & 255 AS b_and",
        "o_orderkey | 4096 AS b_or",
        "o_orderkey ^ 170 AS b_xor",
        "shiftleft(o_orderkey, 3) AS b_shl",
        "shiftright(o_orderkey, 2) AS b_shr",
        "CAST(bit_count(o_orderkey) AS BIGINT) AS b_cnt")
    },

    Q("fn_array",
      """SELECT doc_id,
        |       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(string_split(lower(text), ' '), x -> length(x) > 5)) AS BIGINT) AS n_long,
        |       string_split(lower(text), ' ')[1] AS first_tok,
        |       list_contains(string_split(lower(text), ' '), 'data') AS has_data,
        |       array_to_string(list_transform(string_split(lower(text), ' ')[1:3], x -> upper(x)), ',') AS up3
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "documents").selectExpr(
        "doc_id",
        "CAST(size(split(lower(text), ' ')) AS BIGINT) AS n_tokens",
        "CAST(size(filter(split(lower(text), ' '), x -> length(x) > 5)) AS BIGINT) AS n_long",
        "element_at(split(lower(text), ' '), 1) AS first_tok",
        "array_contains(split(lower(text), ' '), 'data') AS has_data",
        "array_join(transform(slice(split(lower(text), ' '), 1, 3), x -> upper(x)), ',') AS up3")
    },

    // Data masking (r8g): the mask() builtin — structure-preserving PII
    // redaction (upper→X, lower→x, digit→n) that keeps length/shape for
    // downstream format validation while killing the content, the
    // share-with-vendor twin of text_pii_scrub's regex scrubber. Codegen'd
    // per-row projection; the oracle reproduces the same mapping as three
    // regexp_replace passes (character-class-complete on this fixture).
    Q("fn_mask",
      """SELECT c_custkey,
        |       regexp_replace(regexp_replace(regexp_replace(
        |         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |         AS masked,
        |       length(c_name) AS name_len
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "customer")
        .selectExpr("c_custkey", "mask(c_name) AS masked",
          "CAST(length(c_name) AS BIGINT) AS name_len")
    },

    // Higher-order-function FOLDS (r8g): aggregate()/zip_with()/forall —
    // the per-row array arithmetic that keeps feature engineering INSIDE
    // whole-stage codegen where a UDF would break it (SURVEY §4). Every
    // fold here is integer-exact (token lengths), so the cross-engine
    // hash is stable; the DuckDB spellings differ (list_aggregate /
    // list_dot_product / list_filter-emptiness) which is itself the
    // dialect surface this key pins. Map-only at any scale.
    Q("fn_hof",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_transform(string_split(lower(text), ' '), x -> length(x)) AS lens
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(list_aggregate(lens, 'sum') AS BIGINT) AS len_sum,
        |       CAST(list_aggregate(lens, 'max') AS BIGINT) AS len_max,
        |       CAST(list_dot_product(lens::DOUBLE[], list_reverse(lens)::DOUBLE[])
        |            AS BIGINT) AS dot_rev,
        |       len(list_filter(lens, x -> x <= 0)) = 0 AS all_pos
        |FROM t""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "documents")
        .selectExpr("doc_id",
          "transform(split(lower(text), ' '), x -> CAST(length(x) AS BIGINT)) AS lens")
        .selectExpr(
          "doc_id",
          "aggregate(lens, 0L, (a, x) -> a + x) AS len_sum",
          "aggregate(lens, 0L, (a, x) -> greatest(a, x)) AS len_max",
          "aggregate(zip_with(lens, reverse(lens), (a, b) -> a * b), 0L, (a, x) -> a + x) AS dot_rev",
          "forall(lens, x -> x > 0) AS all_pos")
    },

    // argmax/argmin aggregates (r8g): max_by/min_by — "WHICH order was
    // the biggest", the lookup every leaderboard/exemplar query needs
    // without a self-join back to the row. Tie-safe: the ordering key is
    // struct(price, orderkey) — a total order — so the picked exemplar
    // is deterministic in both engines (the oracle spells it as a
    // row_number window; max_by IS the one-pass agg form of that window,
    // which is the scale point: |groups| state, no per-group sort).
    Q("agg_argmax",
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT a.o_orderpriority,
        |       a.o_orderkey AS top_order, a.o_totalprice AS top_price,
        |       b.o_orderkey AS bottom_order, b.o_totalprice AS bottom_price
        |FROM (SELECT * FROM r WHERE rmax = 1) a
        |JOIN (SELECT * FROM r WHERE rmin = 1) b USING (o_orderpriority)""".stripMargin) {
      (s, d) =>
        Tables.cachedTable(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("top_order"),
            max(col("o_totalprice")).as("top_price"),
            expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("bottom_order"),
            min(col("o_totalprice")).as("bottom_price"))
    },

    Q("fn_struct",
      """SELECT o_orderkey,
        |       to_json(struct_pack(ok := o_orderkey, st := o_orderstatus,
        |                           pr := o_orderpriority)) AS js,
        |       struct_pack(ok := o_orderkey, st := o_orderstatus).st AS st_field
        |FROM orders""".stripMargin) { (s, d) =>
      // Struct build / field access / JSON serialization. Both engines
      // emit compact {"k":v} JSON; fields are restricted to non-null
      // ints+strings because Spark's to_json DROPS null fields while
      // DuckDB emits "k":null, and double formatting differs — the usual
      // cross-engine JSON discipline (cf. fn_json reading, not writing).
      Tables.cachedTable(s, d, "orders").selectExpr(
        "o_orderkey",
        "to_json(named_struct('ok', o_orderkey, 'st', o_orderstatus, " +
          "'pr', o_orderpriority)) AS js",
        "named_struct('ok', o_orderkey, 'st', o_orderstatus).st AS st_field")
    },

    Q("fn_json",
      """SELECT event_id, json_extract(props, '$.k')::BIGINT AS k FROM events""") { (s, d) =>
      Tables.events(s, d).selectExpr(
        "event_id",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
    },

    Q("fn_map",
      """SELECT event_id, k AS key, json_extract(props, '$.' || k)::BIGINT AS value
        |FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          explode(from_json(
            col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType))))
    },

    Q("sql_native_fn",
      """SELECT vec_id,
        |       round(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]), 5) AS norm_sq
        |FROM embeddings""".stripMargin) { (s, d) =>
      // The SQL-string entry point end-to-end: GraftExtensions registers
      // the native codegen'd kernels into the session's FunctionRegistry
      // (the runtime path of `--conf spark.sql.extensions=graft.
      // GraftExtensions`), a temp view exposes the table, and the query
      // text itself calls float_vec_dot. Parity holds because the kernel
      // accumulates float products in double SEQUENTIALLY — the same
      // left-to-right fold DuckDB's list_inner_product runs over the
      // exactly-widened DOUBLE[] (the discipline every cosine oracle in
      // §2.C already leans on).
      graft.GraftExtensions.register(s)
      graft.Tables.cachedTable(s, d, "embeddings").createOrReplaceTempView("graft_emb")
      s.sql("""SELECT vec_id,
              |       round(float_vec_dot(embedding, embedding), 5) AS norm_sq
              |FROM graft_emb""".stripMargin)
    },

    // TRY arithmetic (r8b): Spark 4 runs ANSI mode by default, where
    // overflow and division-by-zero THROW — the safety default that kills
    // a 1000-executor job on one bad row unless the pipeline opts into
    // NULL-on-error via try_* per expression. Gate both escape hatches:
    // try_divide (b = linenumber − 1 is genuinely 0 on first lines) and
    // try_multiply against an overflow frontier the oracle reproduces as
    // an exact integer guard (a > maxLong DIV K ⇔ product overflows —
    // DuckDB must CASE-guard because ITS overflow also throws; the guard
    // constant IS the semantics being checked).
    // r11 perf note: TryEval catches a FRESH ArithmeticException per
    // overflowing row — exceptions as control flow at ~20 µs each. The
    // first cut multiplied raw l_orderkey, where ~98% of sf0.1 rows sit
    // past the frontier: 600k throws = 11.5 s for a projection (honest-
    // bench discovery; count() had pruned the whole column). The operand
    // is now l_orderkey % 97 + 9128 ∈ [9128, 9224]: the frontier constant
    // (9223 = maxLong div 10^15) and the NULL-on-overflow semantics are
    // unchanged and exercised at EVERY SF, but only the %97 == 96 sliver
    // (~1%) pays the throw — which is the real-world shape too: try_* is
    // the guard for the occasional bad row, not a 98%-exception hot loop
    // (that pipeline should filter first).
    Q("fn_try_arith",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |            ELSE CAST(l_orderkey AS DOUBLE) / (l_linenumber - 1) END
        |         AS safe_div,
        |       CASE WHEN l_orderkey % 97 + 9128 > 9223 THEN NULL
        |            ELSE (l_orderkey % 97 + 9128) * 1000000000000000 END AS safe_mul
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_orderkey, l_linenumber - 1)").as("safe_div"),
          expr("try_multiply(l_orderkey % 97 + 9128L, 1000000000000000L)").as("safe_mul"))
    },

    // VARIANT semi-structured type (r8b, Spark 4.0) — the open-format
    // answer to "a JSON column you can query at columnar speed": parse
    // ONCE into the binary VARIANT encoding, then typed variant_get path
    // extraction (no per-row string re-parse, shreddable at the scan at
    // 100 TB). events.props is the real semi-structured column; the
    // oracle extracts the same path with DuckDB's JSON machinery, so a
    // path, type-coercion, or null-semantics mismatch flips the hash.
    Q("fn_variant",
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS max_k
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"),
          min("k").cast("long").as("min_k"), max("k").cast("long").as("max_k"))
    },

    // Ordered string aggregation (r8b, Spark 4.0 listagg): the report
    // column every BI export wants — LISTAGG ... WITHIN GROUP (ORDER BY)
    // with a deterministic unique sort key, vs DuckDB's ordered
    // string_agg. Bounded input (keys <= 200) because a group-sized
    // string is a driver-bound artifact by nature — at 100 TB this runs
    // AFTER a top-k/filter, never over a raw group.
    Q("agg_listagg",
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       string_agg(o_orderpriority || ':' || CAST(o_orderkey AS VARCHAR),
        |                  ',' ORDER BY o_orderkey) AS members
        |FROM orders WHERE o_orderkey <= 200
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "orders")
        .filter(col("o_orderkey") <= 200)
        .createOrReplaceTempView("graft_orders_small")
      s.sql("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
              |       listagg(o_orderpriority || ':' || CAST(o_orderkey AS STRING), ',')
              |         WITHIN GROUP (ORDER BY o_orderkey) AS members
              |FROM graft_orders_small
              |GROUP BY o_orderstatus""".stripMargin)
    },

    // Recursive CTE (r8b) — the iterative-query operator Spark lacked
    // until 4.0 (SPARK-24497): walk every orderkey <= 1000 up its
    // implicit binary-tree ancestry (parent = k DIV 2) to the root and
    // report the depth census — the hierarchy/BOM/org-chart query class,
    // now expressible in pure SQL in BOTH engines (DuckDB has WITH
    // RECURSIVE natively; only the integer-division spelling differs,
    // DIV vs //). Depth = floor(log2 k), so the census is closed-form
    // verifiable too. Scale note: Spark executes recursion as iterative
    // union materialization — depth-bounded (10 here); an UNBOUNDED
    // frontier at 100 TB belongs to GraphOps' checkpointed
    // pointer-jumping loops instead (graph_bfs), which converge in
    // O(log n) rounds.
    Q("sql_recursive_cte",
      """WITH RECURSIVE walk(k, anc, depth) AS (
        |  SELECT o_orderkey AS k, o_orderkey AS anc, 0 AS depth
        |  FROM orders WHERE o_orderkey <= 1000
        |  UNION ALL
        |  SELECT k, anc // 2, depth + 1 FROM walk WHERE anc > 1)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |       CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(k) AS BIGINT) AS sum_keys
        |FROM walk WHERE anc = 1
        |GROUP BY 1""".stripMargin) { (s, d) =>
      graft.Tables.cachedTable(s, d, "orders").createOrReplaceTempView("graft_orders")
      s.sql("""WITH RECURSIVE walk(k, anc, depth) AS (
              |  SELECT o_orderkey AS k, o_orderkey AS anc, 0 AS depth
              |  FROM graft_orders WHERE o_orderkey <= 1000
              |  UNION ALL
              |  SELECT k, anc DIV 2, depth + 1 FROM walk WHERE anc > 1)
              |SELECT CAST(depth AS BIGINT) AS depth,
              |       CAST(count(*) AS BIGINT) AS n_keys,
              |       CAST(sum(k) AS BIGINT) AS sum_keys
              |FROM walk WHERE anc = 1
              |GROUP BY 1""".stripMargin)
    },

    Q("udf_scalar",
      """WITH t AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS s FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
        |            ELSE CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |                 / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) END AS jaccard
        |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1""".stripMargin) { (s, d) =>
      // Genuine registered scalar UDF (the surface under test). For hot
      // paths prefer the HOF formulation in TextOps — this one breaks
      // whole-stage codegen by design.
      val jaccard = udf { (a: Seq[String], b: Seq[String]) =>
        val sa = a.toSet
        val sb = b.toSet
        val u = sa.union(sb).size
        if (u == 0) 0.0 else sa.intersect(sb).size.toDouble / u
      }
      val t = Tables.cachedTable(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("s"))
      val a = t.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val b = t.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jaccard"))
    },

    Q("udaf_typed",
      """WITH s AS (SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sd,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sq
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, round(sd / n, 5) AS mean,
        |       round((sq - sd * sd / n) / (n - 1), 5) AS variance
        |FROM s""".stripMargin) { (s, d) =>
      // Final mean/variance rounded to 5 dp (§7.5): the (sq - s²/n) double
      // subtraction is ulp-sensitive to summation detail across engines.
      val moments = udaf(graft.functions.ExactMoments)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(moments(col("value")).as("m"))
        .select(
          col("event_type"),
          col("m.n").as("n"),
          round(col("m.mean"), 5).as("mean"),
          round(col("m.variance"), 5).as("variance"))
    },

    Q("udtf_explode",
      """SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
        |WHERE len(t) >= 2""".stripMargin) { (s, d) =>
      Tables.cachedTable(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .selectExpr(
          "doc_id",
          "explode(transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))) AS bigram")
    }
  )
}
