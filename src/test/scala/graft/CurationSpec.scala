package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the r7 curation operators, run on the sf0.001
  * fixture (the DuckDB hash-compare is the value-level gate; these pin the
  * semantic invariants a hash can't explain when it breaks).
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

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

  test("budget_select: budget respected, selection is the quality-ranked prefix") {
    val df = SparkEntry.queries("budget_select")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val budget = 2000L
    for ((lang, rs) <- rows.groupBy(_.getAs[String]("lang"))) {
      val byCum = rs.sortBy(_.getAs[Long]("cum_tokens"))
      // within a language: cum_tokens is the running sum of n_tokens in
      // (score desc, doc_id) order, and never exceeds the budget
      assert(byCum.last.getAs[Long]("cum_tokens") <= budget, s"$lang over budget")
      val ordered = rs.sortBy(r => (-r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
      assert(ordered.map(_.getAs[Long]("n_tokens")).scanLeft(0L)(_ + _).tail.toSeq ==
        ordered.map(_.getAs[Long]("cum_tokens")).toSeq,
        s"$lang: cum_tokens is not the prefix sum in rank order — band decomposition broke")
      // prefix property: every selected doc outranks (score, doc_id) any
      // doc of the same language that was left out within head room — the
      // two-phase form must never skip a better doc (checked indirectly:
      // scores are non-increasing along the cumsum order)
      val scores = ordered.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // deterministic re-evaluation
    assert(rowsOf(df) == rowsOf(SparkEntry.queries("budget_select")(spark, sf)))
  }

  test("events_sessionize: sessions partition each user's events with gaps only between sessions") {
    val df = SparkEntry.queries("events_sessionize")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val gap = 28800000000L
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == nEvents,
      "sessions must partition the event log exactly")
    for ((_, rs) <- rows.groupBy(_.getAs[Long]("user_id"))) {
      val byIdx = rs.sortBy(_.getAs[Long]("session_idx"))
      assert(byIdx.map(_.getAs[Long]("session_idx")).toSeq ==
        (1L to byIdx.length).toSeq, "session indices must be dense from 1")
      for (r <- byIdx)
        assert(r.getAs[Long]("duration_us") ==
          r.getAs[Long]("t_end_us") - r.getAs[Long]("t_start_us"))
      // consecutive sessions are separated by MORE than the gap; within a
      // session the span can be anything (chained short gaps)
      for (Array(a, b) <- byIdx.sliding(2).filter(_.length == 2))
        assert(b.getAs[Long]("t_start_us") - a.getAs[Long]("t_end_us") > gap,
          s"adjacent sessions closer than the gap: $a | $b")
    }
  }

  test("streaks: gaps split islands, boundaries exact, single-day users count") {
    import graft.operators.CurateOps
    val day = 86400000000L
    // user 1: days 0,1,2 then 5,6 -> 2 streaks, max 3; user 2: one day;
    // user 3: two events in the SAME day (distinct collapses them).
    val ev = Seq(
      (1L, 0L * day), (1L, 1L * day + 7), (1L, 2L * day),
      (1L, 5L * day), (1L, 6L * day),
      (2L, 3L * day),
      (3L, 4L * day), (3L, 4L * day + 999)).toDF("user_id", "ts_us")
    val got = CurateOps.streaks(ev, day).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((5L, 2L, 3L)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L)))
    assert(got(3L) == ((1L, 1L, 1L)))
  }

  test("rangePairs: window boundary inclusive, bucket crossing lossless, each pair once") {
    import graft.operators.CurateOps
    val w = 1000L
    // (10, 1010): gap exactly w -> kept; (1999, 2001): gap 2 but DIFFERENT
    // buckets -> the explode must still find it; (1010, 1999)/(1010, 2001):
    // in-window pairs that also cross a bucket; (5000, 5000): equal ts,
    // tie by id, exactly once; (10, 1999): gap 1989 > w -> dropped.
    val ev = Seq((1L, 10L), (2L, 1010L), (3L, 1999L), (4L, 2001L),
      (5L, 5000L), (6L, 5000L)).toDF("event_id", "ts_us")
    val got = CurateOps.rangePairs(ev, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1000L), (2L, 3L, 989L), (2L, 4L, 991L),
      (3L, 4L, 2L), (5L, 6L, 0L)), got.toString)
  }

  test("pcaPowerTop: unit loading vector, nonnegative eigenvalue, deterministic") {
    import graft.operators.VectorOps
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val r = VectorOps.pcaPowerTop(emb, iters = 2).collect()
    assert(r.length == 64)
    val sumsq = r.map(x => x.getDouble(1) * x.getDouble(1)).sum
    assert(math.abs(sumsq - 1.0) < 1e-3, s"loading norm^2 = $sumsq")
    val lambda = r.head.getDouble(2)
    assert(lambda >= 0.0, s"covariance Rayleigh quotient negative: $lambda")
    assert(r.forall(x => x.getDouble(2) == lambda), "eigenvalue column not constant")
    val r2 = VectorOps.pcaPowerTop(emb, iters = 2).collect()
    assert(r.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("text_scrub_blocklist: masked text has no blocklist terms; count matches the mask delta") {
    val df = SparkEntry.queries("text_scrub_blocklist")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val term = "\\b(customer|spark|vector)\\b".r
    assert(rows.exists(_.getAs[Long]("n_redacted") > 0L), "blocklist never fired")
    for (r <- rows) {
      val clean = r.getAs[String]("clean_text")
      assert(term.findFirstIn(clean.replace("[SCRUBBED]", " ")).isEmpty,
        s"unmasked term survives in doc ${r.getAs[Long]("doc_id")}")
      assert(clean.sliding("[SCRUBBED]".length).count(_ == "[SCRUBBED]") ==
        r.getAs[Long]("n_redacted"), s"count/mask mismatch in $r")
    }
  }
}
