package graft

import org.apache.spark.sql.functions._
import graft.functions.{MisraGries, MisraGriesAgg}

/** Pins the Misra–Gries deterministic heavy-hitter guarantee: every item
  * with frequency > N/(k+1) survives the summary — under arbitrary stream
  * order, arbitrary partitioning (merge path), and skew shapes from
  * uniform to single-dominant.
  */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic skewed stream: Zipf-ish over `vocab` items. */
  private def stream(seed: Long, n: Int, vocab: Int): Seq[String] = {
    var h = seed
    Seq.fill(n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      // square the uniform to skew low ids heavy
      val u = ((h >>> 11).toDouble / (1L << 53).toDouble)
      s"t${(u * u * vocab).toInt}"
    }
  }

  test("guarantee: every item with count > N/(k+1) is in the summary, any split") {
    val k = 8
    for (seed <- 1L to 5L; n <- Seq(100, 1000); vocab <- Seq(5, 40, 400)) {
      val xs = stream(seed * 31 + n + vocab, n, vocab)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.collect { case (t, c) if c * (k + 1) > n => t }.toSet
      // fold in 1, 3, and 7 chunks to exercise reduce AND merge paths
      for (parts <- Seq(1, 3, 7)) {
        val agg = new MisraGriesAgg(k)
        val partials = xs.grouped(math.max(1, xs.size / parts)).map(chunk =>
          chunk.foldLeft(agg.zero)(agg.reduce)).toSeq
        val merged = partials.reduce(agg.merge)
        assert(merged.size <= k, s"summary overflow: ${merged.size} > $k")
        val cands = agg.finish(merged).toSet
        assert(heavy.subsetOf(cands),
          s"seed=$seed n=$n vocab=$vocab parts=$parts lost ${heavy -- cands}")
        // undercount bound: every surviving weight is within N/(k+1) of truth
        merged.foreach { case (t, w) =>
          val c = exact.getOrElse(t, 0L)
          assert(w <= c && c - w <= n / (k + 1) + 1,
            s"weight $w vs exact $c violates the undercount bound")
        }
      }
    }
  }

  test("Spark agg: candidate set is partitioning-invariant and ⊇ true heavy hitters") {
    val xs = stream(42L, 2000, 60)
    val n = xs.size.toLong
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.collect { case (t, c) if c * 17 > n => t }.toSet
    def cands(parts: Int): Set[String] =
      xs.toDF("t").repartition(parts)
        .agg(MisraGries.agg(col("t"), 16).as("c"))
        .select(explode(col("c"))).as[String].collect().toSet
    val c32 = cands(32)
    assert(heavy.subsetOf(c32), s"lost ${heavy -- c32}")
    assert(cands(1) == c32 || heavy.subsetOf(cands(1)),
      "guarantee must hold under any partitioning")
    assert(c32.size <= 16)
  }

  test("nulls are ignored; k=1 degenerates to the majority candidate") {
    val agg = new MisraGriesAgg(1)
    val xs: Seq[String] = Seq("a", null, "b", "a", null, "a", "c", "a")
    val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    // 'a' has 4 of 6 non-null: strict majority must survive (Boyer–Moore)
    assert(out == Seq("a"))
  }
}
