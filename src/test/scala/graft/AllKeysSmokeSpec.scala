package graft

/** Executes EVERY declared SparkEntry.queries entry at sf0.001 and asserts
  * it builds and counts without throwing.
  *
  * Why this exists (r10 post-mortem): 326 green tests did not catch a
  * crashing declared query (`window_theil_sen`'s ANSI DIVIDE_BY_ZERO) —
  * no spec executed the full declared surface, so the breakage was caught
  * only by the driver's harness after the round closed. This spec makes
  * "a declared key throws" a build failure, not a round finding.
  *
  * Scope: execution totality only (no oracle compare — that is Verify +
  * selfcheck's job at sf0.01/sf0.001). One dynamically-registered test per
  * key so a crash names its key in the test report.
  */
class AllKeysSmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  for (key <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$key executes at sf0.001 without throwing") {
      val df = SparkEntry.queries(key)(spark, sfDir)
      // noop sink, NOT count(): count() lets Catalyst prune every column
      // the count doesn't need, so runtime-only failures in projection
      // expressions (ANSI arithmetic overflow, codegen errors in map-only
      // projections) would never fire — the same honesty fix Bench made
      // in r11. The noop write evaluates EVERY output column.
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
