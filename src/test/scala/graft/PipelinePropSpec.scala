package graft

import org.scalacheck.{Gen, rng}
import graft.operators.TextOps

/** Property invariants of the dedup family on generated corpora (fixed
  * seed): every emitted pair is a true pair (blocking never fabricates),
  * exact dedup partitions the corpus, identical docs are always found.
  */
class PipelinePropSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private val docGen: Gen[String] =
    Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private val corpusGen: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.chooseNum(4, 14)
    texts <- Gen.listOfN(n, docGen)
    langs <- Gen.listOfN(n, Gen.oneOf("en", "fr"))
  } yield texts.zip(langs).zipWithIndex.map { case ((t, l), i) => (i.toLong, l, t) }

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).map { _ => val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v }
  }

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (a.toLowerCase.split(" ").toSet, b.toLowerCase.split(" ").toSet)
    val u = sa.union(sb).size
    if (u == 0) 0.0 else sa.intersect(sb).size.toDouble / u
  }

  test("near-dup variants emit only true pairs; exact dedup partitions; identical docs pair") {
    for ((corpus, i) <- samples(corpusGen, 8, 11L).zipWithIndex) {
      val docs = corpus.toDF("doc_id", "lang", "text")
      val byId = corpus.map(c => c._1 -> c).toMap

      for ((name, pairs) <- Seq(
        "anchor" -> TextOps.nearDupPairs(docs, 0.6),
        "minhash" -> TextOps.minHashLshPairs(docs, 0.6, bands = 3))) {
        for (r <- pairs.collect()) {
          val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
          assert(a < b, s"case $i $name: ordered pair")
          assert(byId(a)._2 == byId(b)._2, s"case $i $name: same block")
          val j = jaccard(byId(a)._3, byId(b)._3)
          assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-12 && j >= 0.6,
            s"case $i $name: jaccard $j vs ${r.getAs[Double]("jaccard")}")
        }
      }

      // identical same-lang docs are always found by both methods
      val ident = for {
        (x, y) <- corpus.flatMap(a => corpus.map(b => (a, b)))
        if x._1 < y._1 && x._2 == y._2 && x._3.toLowerCase == y._3.toLowerCase
      } yield (x._1, y._1)
      if (ident.nonEmpty) {
        val mh = TextOps.minHashLshPairs(docs, 0.99, bands = 3)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        assert(ident.toSet.subsetOf(mh), s"case $i: identical docs missed by minhash")
      }

      // exact dedup: one representative per normalized text, all docs accounted
      val kept = TextOps.dedupExact(docs).collect()
      assert(kept.map(_.getAs[Long]("n_copies")).sum == corpus.size, s"case $i: partition")
      assert(kept.map(_.getAs[String]("text_hash")).distinct.length == kept.length)
    }
  }

  test("prefix-filter near-dup is LOSSLESS on random corpora (== brute force)") {
    // The oracle-facing claim: candidate generation misses nothing. Small
    // vocab + short docs maximizes collision-shaped edge cases (shared
    // rarest tokens, equal-frequency ties, duplicate docs).
    for ((corpus, i) <- samples(corpusGen, 10, 23L).zipWithIndex; tau <- Seq(0.5, 0.9)) {
      val docs = corpus.toDF("doc_id", "lang", "text")
      val brute = (for {
        a <- corpus; b <- corpus
        if a._1 < b._1 && a._2 == b._2 && jaccard(a._3, b._3) >= tau
      } yield (a._1, b._1)).toSet
      val got = TextOps.nearDupPairs(docs, tau)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute,
        s"case $i tau=$tau: missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("norm-prefix cosine join is LOSSLESS on random corpora (== brute force)") {
    // Same claim as the near-dup pin, for the WEIGHTED prefix filter: the
    // tail-norm cut misses no qualifying pair at any τ, including ties on
    // token frequency and exact-boundary cosines (integer cross-multiply on
    // both sides, so the boundary is deterministic).
    def tfMap(t: String): Map[String, Long] =
      t.toLowerCase.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
    for ((corpus, i) <- samples(corpusGen, 8, 57L).zipWithIndex;
         (num, den) <- Seq((1, 2), (9, 10))) {
      val docs = corpus.toDF("doc_id", "lang", "text").select("doc_id", "text")
      val brute = (for {
        a <- corpus; b <- corpus if a._1 < b._1
        ta = tfMap(a._3); tb = tfMap(b._3)
        dot = ta.keysIterator.map(k => ta(k) * tb.getOrElse(k, 0L)).sum
        na2 = ta.valuesIterator.map(v => v * v).sum
        nb2 = tb.valuesIterator.map(v => v * v).sum
        if den.toLong * den * dot * dot >= num.toLong * num * na2 * nb2 && dot > 0
      } yield (a._1, b._1)).toSet
      val got = TextOps.cosinePairs(docs, num, den)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute,
        s"case $i tau=$num/$den: missing=${brute -- got} extra=${got -- brute}")
    }
    // the declared key runs TRIGRAM dims — the losslessness proof is
    // tokenizer-agnostic, but pin one shingled round anyway
    def triTf(t: String): Map[String, Long] = {
      val w = t.toLowerCase.split(" ")
      (if (w.length < 3) Array.empty[String]
       else w.sliding(3).map(_.mkString(" ")).toArray)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }
    for ((corpus, i) <- samples(corpusGen, 4, 77L).zipWithIndex) {
      val docs = corpus.toDF("doc_id", "lang", "text").select("doc_id", "text")
      val brute = (for {
        a <- corpus; b <- corpus if a._1 < b._1
        ta = triTf(a._3); tb = triTf(b._3)
        dot = ta.keysIterator.map(k => ta(k) * tb.getOrElse(k, 0L)).sum
        na2 = ta.valuesIterator.map(v => v * v).sum
        nb2 = tb.valuesIterator.map(v => v * v).sum
        if 4L * dot * dot >= 1L * na2 * nb2 && dot > 0
      } yield (a._1, b._1)).toSet
      val got = TextOps.cosinePairs(docs, 1, 2,
          dims = c => TextOps.trigrams(TextOps.tokens(c)))
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute,
        s"trigram case $i: missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("banded simHash pair scan == all-pairs scan on random corpora") {
    for ((corpus, i) <- samples(corpusGen, 10, 31L).zipWithIndex) {
      val docs = corpus.toDF("doc_id", "lang", "text")
      val sh = TextOps.simHash(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
      val lang = corpus.map(c => c._1 -> c._2).toMap
      val brute = (for {
        a <- sh.keys; b <- sh.keys
        if a < b && lang(a) == lang(b) &&
          java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 4
      } yield (a, b)).toSet
      val got = TextOps.simHashPairs(docs, maxHamming = 4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"case $i: missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("winnowing coverage: docs sharing a >= w+k-1 token run always share a fingerprint") {
    // Build pairs with a guaranteed shared run by splicing a common
    // 6-token phrase (k=3, w=4 -> threshold w+k-1 = 6) into random docs.
    val phrase = "omicron pi rho sigma tau upsilon"
    for ((corpus, i) <- samples(corpusGen, 6, 41L).zipWithIndex) {
      val spliced = corpus.zipWithIndex.map { case ((id, l, t), j) =>
        if (j % 2 == 0) (id, l, s"$t $phrase") else (id, l, t)
      }
      val withRun = spliced.collect { case (id, _, t) if t.contains(phrase) => id }
      val fps = TextOps.winnowFingerprints(
        spliced.map(c => (c._1, c._3)).toDF("doc_id", "text"), k = 3, w = 4)
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
      for (a <- withRun; b <- withRun if a < b)
        assert((fps(a) intersect fps(b)).nonEmpty,
          s"case $i: docs $a,$b share the phrase but no fingerprint")
    }
  }

  test("simHash is deterministic and identical docs have hamming 0") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamma"),
      (3L, "en", "kappa lambda mu")).toDF("doc_id", "lang", "text")
    val pairs = TextOps.simHashPairs(docs, maxHamming = 0).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
    val h1 = TextOps.simHash(docs).collect().map(r => r.getAs[Long]("simhash")).sorted
    val h2 = TextOps.simHash(docs).collect().map(r => r.getAs[Long]("simhash")).sorted
    assert(h1.sameElements(h2))
  }
}
