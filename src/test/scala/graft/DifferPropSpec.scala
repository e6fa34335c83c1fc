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

  test("diffVsStatic(b, a) equals diff(a, b) minus D, keys re-sourced (generated)") {
    // The continuous diff's contract tied to the core: classifying b's
    // rows against snapshot a must agree row-for-row with the full diff
    // restricted to b-present statuses (everything except D). NaN/-0.0/
    // null values are in the generator domain so the <=> alignment is
    // exercised; subsetCheck's counters must match the same census.
    for (((ta, tb), i) <- samples(Gen.zip(tblGen, tblGen), 8, seed = 7311L).zipWithIndex) {
      val (a, b) = (toDF(ta), toDF(tb))
      val streaming = rowsOf(Differ.diffVsStatic(b, a, Seq("k")))
      val batch = rowsOf(Differ.diff(a, b, Seq("k")).filter(col("diff_status") =!= "D"))
      assert(streaming == batch, s"case $i: diffVsStatic != diff minus D")
      val sc = Differ.subsetCheck(b, a, Seq("k")).collect().head
      val census = counts(Differ.diff(a, b, Seq("k")))
      assert(sc.getAs[Long]("n_candidate_only") == census("I"), s"case $i: I count")
      assert(sc.getAs[Long]("n_changed") == census("C"), s"case $i: C count")
      assert((sc.getAs[Long]("is_subset") == 1L) ==
        (census("I") == 0L && census("C") == 0L), s"case $i: verdict bit")
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

  // ---- pairwise DiffOptions interactions (r7 verdict ask #6) -------------
  // Each option is covered alone by DifferSpec; these pin the PAIRS on
  // generated tables: sparse×tolerance, mapped×ignore, tolCols×relTol,
  // nullSafeKeys×(sparse,tolerance), tolerance×flip.

  private case class Tbl5(
      rows: Seq[(Long, Option[String], Option[Double], Option[Double], Option[Int])])

  private val rowGen5: Gen[(Long, Option[String], Option[Double], Option[Double], Option[Int])] =
    for {
      k <- Gen.choose(0L, 25L)
      s <- Gen.option(Gen.oneOf("a", "b"))
      v <- Gen.option(Gen.oneOf(1.0, 1.05, 2.5, Double.NaN, -0.0,
        Double.PositiveInfinity))
      w <- Gen.option(Gen.oneOf(10.0, 10.4, 20.0))
      n <- Gen.option(Gen.oneOf(1, 2, 3, 100))
    } yield (k, s, v, w, n)

  private val tbl5Gen: Gen[Tbl5] =
    Gen.listOf(rowGen5).map(rs => Tbl5(rs.distinctBy(_._1)))

  private def toDF5(t: Tbl5): DataFrame = t.rows.toDF("k", "s", "v", "w", "n")

  /** Scala mirror of Differ.colEqual's tolerance predicate on doubles:
    * exact `<=>` (NaN == NaN, both-null) OR |l-r| within the bound.
    */
  private def tolEq(l: Option[Double], r: Option[Double],
                    absTol: Double, relTol: Double): Boolean = (l, r) match {
    case (None, None) => true
    case (Some(x), Some(y)) =>
      (x == y) || (x.isNaN && y.isNaN) ||
        math.abs(x - y) <= absTol + relTol * math.max(math.abs(x), math.abs(y))
    case _ => false
  }

  test("sparse × tolerance: C rows null exactly the columns equal UNDER the tolerance") {
    import graft.operators.DiffOptions
    val opts = DiffOptions(absTol = 0.1, sparse = true)
    for (((ta, tb), i) <- samples(Gen.zip(tbl5Gen, tbl5Gen), 8, seed = 555L).zipWithIndex) {
      val (a, b) = (toDF5(ta), toDF5(tb))
      val am = ta.rows.map(r => r._1 -> r).toMap
      val bm = tb.rows.map(r => r._1 -> r).toMap
      val out = Differ.diff(a, b, Seq("k"), opts).collect()
      for (row <- out if row.getAs[String]("diff_status") == "C") {
        val k = row.getAs[Long]("k")
        val (ra, rb) = (am(k), bm(k))
        // tolerance applies to the floating v/w columns (tolCols empty),
        // NOT to the string s or int n columns
        val eqByCol = Map(
          "s" -> (ra._2 == rb._2),
          "v" -> tolEq(ra._3, rb._3, 0.1, 0.0),
          "w" -> tolEq(ra._4, rb._4, 0.1, 0.0),
          "n" -> (ra._5 == rb._5))
        for ((c, eq) <- eqByCol) {
          val (lv, rv) = (row.getAs[Any](s"left_$c"), row.getAs[Any](s"right_$c"))
          if (eq)
            assert(lv == null && rv == null,
              s"case $i k=$k col $c equal-under-tol but not nulled: $lv/$rv")
          else {
            // the differing column keeps both sides verbatim (null only
            // where the source value itself was null)
            assert(colVal(ra, c).map(_.toString) == Option(lv).map(_.toString) &&
                   colVal(rb, c).map(_.toString) == Option(rv).map(_.toString),
              s"case $i k=$k col $c differing column must keep source values: $lv/$rv")
          }
        }
      }
    }
  }

  private def colIdx(c: String): Int =
    Map("s" -> 1, "v" -> 2, "w" -> 3, "n" -> 4)(c)

  private def colVal(r: (Long, Option[String], Option[Double], Option[Double], Option[Int]),
                     c: String): Option[Any] =
    r.productElement(colIdx(c)).asInstanceOf[Option[Any]]

  test("mapped × ignore: ignoreCols resolves post-mapping; equals plain diff with ignore") {
    import graft.operators.DiffOptions
    val opts = DiffOptions(ignoreCols = Set("w"), absTol = 0.1)
    for ((ta, tb) <- samples(Gen.zip(tbl5Gen, tbl5Gen), 6, seed = 777L)) {
      val (a, b) = (toDF5(ta), toDF5(tb))
      val bRenamed = b.withColumnRenamed("v", "vv").withColumnRenamed("w", "ww")
      val mapped = Differ.diffMapped(a, bRenamed, Seq("k"),
        Map("v" -> "vv", "w" -> "ww"), opts)
      val plain = Differ.diff(a, b, Seq("k"), opts)
      // the ignored (left-named, mapped) column is absent from the output
      assert(!mapped.columns.exists(_.endsWith("_w")) &&
             !mapped.columns.exists(_.endsWith("_ww")))
      assert(rowsOf(mapped) == rowsOf(plain))
    }
  }

  test("tolCols × relTol: tolerance lands ONLY on the named int column, floats go exact") {
    import graft.operators.DiffOptions
    val opts = DiffOptions(relTol = 0.5, tolCols = Set("n"))
    for (((ta, tb), i) <- samples(Gen.zip(tbl5Gen, tbl5Gen), 8, seed = 888L).zipWithIndex) {
      val (a, b) = (toDF5(ta), toDF5(tb))
      val am = ta.rows.map(r => r._1 -> r).toMap
      val bm = tb.rows.map(r => r._1 -> r).toMap
      val got = Differ.diff(a, b, Seq("k"), opts).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("diff_status")).toMap
      for (k <- am.keySet ++ bm.keySet) {
        val expect = (am.get(k), bm.get(k)) match {
          case (Some(ra), Some(rb)) =>
            val eq = ra._2 == rb._2 &&
              tolEq(ra._3, rb._3, 0, 0) && tolEq(ra._4, rb._4, 0, 0) &&
              tolEq(ra._5.map(_.toDouble), rb._5.map(_.toDouble), 0, 0.5)
            if (eq) "N" else "C"
          case (Some(_), None) => "D"
          case (None, Some(_)) => "I"
          case _ => sys.error("unreachable")
        }
        assert(got(k) == expect, s"case $i k=$k: got ${got(k)}, expect $expect")
      }
    }
  }

  test("nullSafeKeys=false ≡ default on non-null-keyed tables, with sparse+tolerance on") {
    import graft.operators.DiffOptions
    for ((ta, tb) <- samples(Gen.zip(tbl5Gen, tbl5Gen), 6, seed = 9999L)) {
      val (a, b) = (toDF5(ta), toDF5(tb)) // k is Long — never null
      val base = DiffOptions(absTol = 0.1, sparse = true)
      val fast = Differ.diff(a, b, Seq("k"), base.copy(nullSafeKeys = false))
      val safe = Differ.diff(a, b, Seq("k"), base)
      assert(rowsOf(fast) == rowsOf(safe))
    }
  }

  test("tolerance × flip: symmetric bound ⇒ flip swaps I<->D, preserves C/N") {
    import graft.operators.DiffOptions
    val opts = DiffOptions(absTol = 0.05, relTol = 0.1)
    for ((ta, tb) <- samples(Gen.zip(tbl5Gen, tbl5Gen), 6, seed = 31337L)) {
      val (a, b) = (toDF5(ta), toDF5(tb))
      val ab = counts(Differ.diff(a, b, Seq("k"), opts))
      val ba = counts(Differ.diff(b, a, Seq("k"), opts))
      assert(ab("I") == ba("D") && ab("D") == ba("I"))
      assert(ab("C") == ba("C") && ab("N") == ba("N"))
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

  test("diffUnkeyed == brute-force bag counts on random duplicate-heavy tables") {
    // tiny domain => heavy duplicates AND null cells; NaN/-0.0 exercise the
    // null-safe/total-order compare the whole differ family rides
    val bagGen: Gen[Seq[(Option[String], Option[Double])]] =
      Gen.listOf(Gen.zip(
        Gen.option(Gen.oneOf("x", "y")),
        Gen.option(Gen.oneOf(1.0, Double.NaN))))
    for (((la, lb), i) <- samples(Gen.zip(bagGen, bagGen), 8, seed = 13L).zipWithIndex) {
      val (a, b) = (la.toDF("s", "v"), lb.toDF("s", "v"))
      // brute: normalize NaN so Scala map keys match Spark's <=> semantics
      def key(r: (Option[String], Option[Double])) =
        (r._1, r._2.map(d => if (d.isNaN) "NaN" else d.toString))
      val cl = la.groupBy(key).view.mapValues(_.size.toLong).toMap
      val cr = lb.groupBy(key).view.mapValues(_.size.toLong).toMap
      val out = Differ.diffUnkeyed(a, b).collect().map { r =>
        val k = (Option(r.getAs[String]("s")),
          if (r.isNullAt(1)) None
          else Some(if (r.getDouble(1).isNaN) "NaN" else r.getDouble(1).toString))
        k -> (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
          r.getAs[String]("diff_status"))
      }.toMap
      assert(out.keySet == (cl.keySet ++ cr.keySet), s"case $i: row universe")
      out.foreach { case (k, (nl, nr, st)) =>
        assert(nl == cl.getOrElse(k, 0L) && nr == cr.getOrElse(k, 0L),
          s"case $i: counts for $k")
        val want = if (nl == nr) "N" else if (nl == 0) "I" else if (nr == 0) "D" else "C"
        assert(st == want, s"case $i: status for $k")
      }
    }
  }

  test("property: map columns — entry-order permutation is always N, one-entry edit always C") {
    // Random maps (2–6 string keys, long values), right side rebuilt from a
    // seeded PERMUTATION of the entries; half the keys additionally get one
    // entry's value bumped. Order-insensitivity and value-sensitivity must
    // hold over the whole generated space, not just the fixture.
    val keyPool = Seq("a", "b", "c", "d", "e", "f")
    val mapGen: Gen[Map[String, Long]] = for {
      n  <- Gen.choose(2, 6)
      ks <- Gen.pick(n, keyPool)
      vs <- Gen.listOfN(n, Gen.choose(-100L, 100L))
    } yield ks.toSeq.sorted.zip(vs).toMap
    val cases = samples(mapGen, 40, seed = 0x59L).zipWithIndex
    val rows = cases.map { case (m, i) =>
      // deterministic per-index permutation
      val shuffled = new scala.util.Random(i * 7919L).shuffle(m.toSeq)
      val edited =
        if (i % 2 == 0) shuffled
        else shuffled.updated(0, (shuffled.head._1, shuffled.head._2 + 1L))
      (i.toLong, m, edited.toMap)
    }
    val l = rows.map { case (id, m, _) => (id, m) }.toDF("id", "m")
    val r = rows.map { case (id, _, m) => (id, m) }.toDF("id", "m")
    val st = Differ.diff(l, r, Seq("id")).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[String]("diff_status")).toMap
    rows.foreach { case (id, _, _) =>
      val want = if (id % 2 == 0) "N" else "C"
      assert(st(id) == want, s"map case $id must be $want")
    }
  }

  test("compose(diff(a,b), diff(b,c)) == diff(a,c) minus N on generated triples (r12)") {
    // The diff-algebra contract behind diff_compose: folding two
    // sequential changesets nets out exactly to the direct changeset —
    // including value round-trips (a→x→a must vanish) and I-then-D
    // (insert deleted again must vanish). The generator's 31-key universe
    // with null/NaN/-0.0 values makes overlap, re-insert and round-trip
    // cases dense; 8 triples × fixed seed keeps CI deterministic.
    val cases = samples(Gen.zip(tblGen, tblGen, tblGen), 8, seed = 0xC0117L)
    for (((ta, tb, tc), i) <- cases.zipWithIndex) {
      val (a, b, c) = (toDF(ta), toDF(tb), toDF(tc))
      val composed = rowsOf(Differ.composeChangesets(
        Differ.diff(a, b, Seq("k")), Differ.diff(b, c, Seq("k")), Seq("k")))
      val direct = rowsOf(Differ.diff(a, c, Seq("k")).filter(col("diff_status") =!= "N"))
      assert(composed == direct, s"case $i: compose != direct diff")
      // Composing a changeset with its own inverse must net to nothing.
      val d1 = Differ.diff(a, b, Seq("k"))
      assert(Differ.composeChangesets(d1, Differ.invertChangeset(d1), Seq("k")).isEmpty,
        s"case $i: compose(d, invert(d)) must be empty")
    }
  }

  test("compose holds on COMPOSITE and NULLABLE keys (r12)") {
    // The generated-triple pin runs single-key; this covers the <=>
    // key-join path: a two-column key with a NULL component must fold
    // exactly like the direct diff (null-safe keys address null-keyed
    // rows in both).
    def t(rows: Seq[(java.lang.Long, String, java.lang.Double)]) =
      rows.toDF("k1", "k2", "v")
    val keys = Seq("k1", "k2")
    val a = t(Seq((1L, "x", 1.0), (null, "y", 2.0), (2L, null, 3.0), (3L, "z", 4.0)))
    val b = t(Seq((1L, "x", 1.5), (null, "y", 2.0), (2L, null, 3.5), (4L, "w", 9.0)))
    val c = t(Seq((1L, "x", 1.0), (null, "y", 7.0), (2L, null, 3.5), (4L, "w", 9.5)))
    val composed = rowsOf(Differ.composeChangesets(
      Differ.diff(a, b, keys), Differ.diff(b, c, keys), keys))
    val direct = rowsOf(Differ.diff(a, c, keys).filter(col("diff_status") =!= "N"))
    assert(composed == direct, s"composite/null keys: $composed vs $direct")
  }
}
