package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.operators.Differ

/** Property-based invariants of the diff (SURVEY §5.3), driven by
  * scalacheck generators with a fixed seed (deterministic CI): for
  * arbitrary key-unique tables,
  *   - statuses partition the key universe;
  *   - argument flip swaps I<->D and preserves C/N;
  *   - summary equals the full diff's groupBy.
  */
class DifferPropSpec extends SparkTestBase {
  import spark.implicits._

  private case class Tbl(rows: Seq[(Long, Option[String], Option[Double])])

  private val rowGen: Gen[(Long, Option[String], Option[Double])] = for {
    k <- Gen.choose(0L, 30L)
    s <- Gen.option(Gen.oneOf("a", "b", "c"))
    v <- Gen.option(Gen.oneOf(1.0, 2.5, Double.NaN, -0.0))
  } yield (k, s, v)

  private val tblGen: Gen[Tbl] =
    Gen.listOf(rowGen).map(rs => Tbl(rs.distinctBy(_._1))) // key-unique

  /** Deterministic sampler: walks the generator with a fixed seed. */
  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  private def toDF(t: Tbl): DataFrame = t.rows.toDF("k", "s", "v")

  private def counts(df: DataFrame): Map[String, Long] =
    df.groupBy("diff_status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)

  test("statuses partition the key universe; flip swaps I<->D; summary consistent") {
    val cases = samples(Gen.zip(tblGen, tblGen), 12, seed = 42L)
    assert(cases.nonEmpty)
    for (((ta, tb), i) <- cases.zipWithIndex) {
      val (a, b) = (toDF(ta), toDF(tb))
      val ab = counts(Differ.diff(a, b, Seq("k")))
      val ba = counts(Differ.diff(b, a, Seq("k")))
      val keyUniverse = (ta.rows.map(_._1) ++ tb.rows.map(_._1)).distinct.size.toLong
      val matched = ta.rows.map(_._1).toSet.intersect(tb.rows.map(_._1).toSet).size.toLong

      assert(ab("N") + ab("C") + ab("I") + ab("D") == keyUniverse, s"case $i: partition")
      assert(ab("N") + ab("C") == matched, s"case $i: |C|+|N| = |key-matched|")
      assert(ab("I") == ba("D") && ab("D") == ba("I"), s"case $i: flip I<->D")
      assert(ab("C") == ba("C") && ab("N") == ba("N"), s"case $i: flip preserves C/N")

      val summary = Differ.summary(a, b, Seq("k")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
      assert(Seq("N", "C", "I", "D").forall(st => summary(st) == ab(st)), s"case $i: summary")

      assert(counts(Differ.diff(a, a, Seq("k"))).keySet.subsetOf(Set("N")), s"case $i: diff(a,a)")
    }
  }

  test("diffViaHash equals diff.filter(status != N) on generated tables") {
    // NaN / -0.0 / null values are in the generator domain: the hash
    // canonicalization must agree with <=> on all of them.
    for ((ta, tb) <- samples(Gen.zip(tblGen, tblGen), 8, seed = 99L)) {
      val (a, b) = (toDF(ta), toDF(tb))
      val viaHash = rowsOf(Differ.diffViaHash(a, b, Seq("k")))
      val direct = rowsOf(Differ.diff(a, b, Seq("k")).filter(col("diff_status") =!= "N"))
      assert(viaHash == direct)
    }
  }

  test("diffIncremental equals diff.filter(status != N) keys on generated tables") {
    // Small bucket counts force dirty and clean keys to share buckets;
    // pruning must stay content-lossless over NaN / -0.0 / null values.
    for (((ta, tb), i) <- samples(Gen.zip(tblGen, tblGen), 8, seed = 1234L).zipWithIndex) {
      val (a, b) = (toDF(ta), toDF(tb))
      val inc = rowsOf(Differ.diffIncremental(a, b, Seq("k"), buckets = 1 + i % 4))
      val direct = rowsOf(Differ.diff(a, b, Seq("k"))
        .filter(col("diff_status") =!= "N").select("diff_status", "k"))
      assert(inc == direct)
    }
  }

  test("applyChangeset(a, diff(a, b)) reconstructs b on generated tables") {
    for ((ta, tb) <- samples(Gen.zip(tblGen, tblGen), 8, seed = 4321L)) {
      val (a, b) = (toDF(ta), toDF(tb))
      val applied = Differ.applyChangeset(a, Differ.diff(a, b, Seq("k")), Seq("k"))
      assert(rowsOf(applied) == rowsOf(b))
    }
  }

  test("invertChangeset == reverse diff; apply(b, invert) rolls back to a (generated)") {
    for ((ta, tb) <- samples(Gen.zip(tblGen, tblGen), 8, seed = 8844L)) {
      val (a, b) = (toDF(ta), toDF(tb))
      val inv = Differ.invertChangeset(Differ.diff(a, b, Seq("k")))
      val reverse = Differ.diff(b, a, Seq("k")).filter(col("diff_status") =!= "N")
      assert(rowsOf(inv.select(reverse.columns.map(col): _*)) == rowsOf(reverse))
      assert(rowsOf(Differ.applyChangeset(b, inv, Seq("k"))) == rowsOf(a))
    }
  }

  test("exceptAll/anti-join agreement on key-unique tables") {
    val cases = samples(Gen.zip(tblGen, tblGen), 6, seed = 7L)
    for ((ta, tb) <- cases) {
      val (a, b) = (toDF(ta), toDF(tb))
      // For key-unique tables: onlyInLeft keys == keys(a) -- keys(b).
      val gotKeys = Differ.onlyInLeft(a, b, Seq("k")).select("k").as[Long].collect().toSet
      val wantKeys = ta.rows.map(_._1).toSet -- tb.rows.map(_._1).toSet
      assert(gotKeys == wantKeys)
    }
  }
}
