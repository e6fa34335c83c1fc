package graft

/** Regression pins for the shared-input cache. */
class TablesSpec extends SparkTestBase {

  test("cached is reentrant: a builder may call cached again (no Recursive update)") {
    // KMeansSql.assignments nests cachedTable("embeddings") inside its own
    // cached block; with computeIfAbsent this threw
    // IllegalStateException("Recursive update") whenever the IVF family was
    // the session's first embeddings toucher.
    val df = Tables.cached(spark, "tables-spec/outer") {
      Tables.cached(spark, "tables-spec/inner") {
        spark.range(3).toDF("id")
      }.selectExpr("id * 2 AS id2")
    }
    assert(df.count() == 3)
    // both levels are served from the cache on re-entry (same instance)
    assert(Tables.cached(spark, "tables-spec/outer")(fail("must not rebuild")) eq df)
  }
}
