package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the r7 curation operators, run on the sf0.001
  * fixture (the DuckDB hash-compare is the value-level gate; these pin the
  * semantic invariants a hash can't explain when it breaks).
  */
class CurationSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("domain_mix_temp: ppm bounds, kept <= docs, temperature flattens toward rare domains") {
    val df = SparkEntry.queries("domain_mix_temp")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ppm = r.getAs[Long]("accept_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"ppm out of range: $r")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"), s"kept > docs: $r")
    }
    // temperature < 1 flattens the mix: acceptance is monotonically
    // non-increasing in domain size (rare domains keep a larger fraction)
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    val ppms = bySize.map(_.getAs[Long]("accept_ppm"))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a >= b },
      s"acceptance not monotone in domain size: ${bySize.map(r =>
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("accept_ppm"))).mkString(", ")}")
    // deterministic: a second evaluation keeps exactly the same counts
    val again = SparkEntry.queries("domain_mix_temp")(spark, sf)
    assert(rowsOf(df) == rowsOf(again))
  }

  test("quality_perplexity: keep/reason consistent with the scored threshold") {
    val df = SparkEntry.queries("quality_perplexity")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val keep = r.getAs[Long]("keep")
      val reason = r.getAs[String]("reason")
      val nBg = r.getAs[Long]("n_bigrams")
      if (reason == "no_bigrams") {
        assert(nBg == 0L && keep == 0L && r.isNullAt(r.fieldIndex("avg_logp")), s"$r")
      } else {
        val lp = r.getAs[Double]("avg_logp")
        assert(nBg > 0L, s"$r")
        assert((keep == 1L) == (lp >= -3.425), s"$r")
        assert(reason == (if (keep == 1L) "ok" else "high_perplexity"), s"$r")
      }
    }
    // the gate must actually separate: some docs on each side at this SF
    assert(rows.exists(_.getAs[Long]("keep") == 1L))
    assert(rows.exists(_.getAs[Long]("keep") == 0L))
  }
}
