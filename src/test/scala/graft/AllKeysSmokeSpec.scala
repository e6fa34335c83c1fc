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
      // count() forces full evaluation of every operator in the plan —
      // a lazily-built DataFrame alone would miss runtime-only failures
      // (ANSI arithmetic, codegen, join-inferred predicates).
      df.count()
    }
  }
}
