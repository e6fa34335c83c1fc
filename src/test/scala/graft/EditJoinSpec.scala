package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.functions.DeleteVariantHashes
import org.apache.spark.unsafe.types.UTF8String

/** The SymSpell bounded-edit-distance filter (r8): losslessness of
  * [[TextOps.editDeleteCandidates]] against brute-force all-pairs, the
  * [[DeleteVariantHashes]] kernel's neighborhood combinatorics, and
  * dedup_edit census equality with the naive block² formulation it
  * replaced.
  */
class EditJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def variantCount(s: String, k: Int): Int =
    DeleteVariantHashes.hashes(UTF8String.fromString(s), k).numElements()

  test("delete neighborhood size: distinct variants of distinct-char strings") {
    // all chars distinct -> no variant coincidences: 1 + n + C(n,2)
    assert(variantCount("abcdef", 2) == 1 + 6 + 15)
    assert(variantCount("abcdef", 1) == 1 + 6)
    // repeated chars collapse: "aaa" delete-1 variants are all "aa"
    assert(variantCount("aaa", 1) == 2)
    assert(variantCount("aaa", 2) == 3) // "aaa", "aa", "a"
    // empty and 1-char inputs
    assert(variantCount("", 2) == 1)
    assert(variantCount("x", 2) == 2) // "x", ""
  }

  test("kernel is code-point level: multibyte variants match char deletes") {
    // "héllo" (5 chars, 6 bytes; the repeated 'l' collapses one delete-1
    // variant): neighborhood size must be the CHAR combinatorics, and
    // deleting 'é' must equal hashing "hllo" — i.e. the same hash appears
    // in both strings' delete-1 sets.
    assert(variantCount("héllo", 1) == 1 + 4)
    assert(variantCount("héalo", 1) == 1 + 5) // all chars distinct
    val a = DeleteVariantHashes.hashes(UTF8String.fromString("héllo"), 1).toLongArray().toSet
    val b = DeleteVariantHashes.hashes(UTF8String.fromString("hllo"), 0 + 1).toLongArray().toSet
    assert((a intersect b).nonEmpty, "delete-1 of héllo must reach hllo's neighborhood")
  }

  test("editDeleteCandidates is a lossless superset on an adversarial corpus") {
    // Shared-affix names (the degenerate case for gram-prefix filters)
    // plus random noise edits: every true ed<=2 pair must be a candidate.
    val rnd = new scala.util.Random(42)
    val alphabet = "0123456789"
    def mutate(s: String): String = {
      val n = rnd.nextInt(3) // 0..2 edits
      var cur = s
      (1 to n).foreach { _ =>
        val op = rnd.nextInt(3)
        val i = rnd.nextInt(math.max(1, cur.length))
        cur = op match {
          case 0 if cur.nonEmpty => cur.updated(i, alphabet(rnd.nextInt(10))) // sub
          case 1 => cur.substring(0, i) + alphabet(rnd.nextInt(10)) + cur.substring(i) // ins
          case _ if cur.nonEmpty => cur.substring(0, i) + cur.substring(math.min(cur.length, i + 1)) // del
          case _ => cur
        }
      }
      cur
    }
    val seeds = (0 until 60).map(i => f"Customer#$i%09d")
    val names = (seeds ++ seeds.map(mutate) ++ seeds.map(mutate)).zipWithIndex
      .map { case (nm, id) => (id.toLong, nm, id % 2) } // two blocks
    val df = names.toDF("id", "name", "blk")
    val cand = TextOps.editDeleteCandidates(df, k = 2,
      idCol = "id", nameCol = "name", blockCols = Seq("blk"))
      .as[(Long, Long)].collect().toSet
    // brute-force truth (driver-side; 180 names)
    val byId = names.map(t => t._1 -> t).toMap
    val truth = (for {
      a <- names; b <- names
      if a._1 < b._1 && a._3 == b._3
      d = org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(a._2, b._2)
      if d <= 2
    } yield (a._1, b._1)).toSet
    val missed = truth -- cand
    assert(missed.isEmpty,
      s"lost ${missed.size} true pairs, e.g. ${missed.take(3).map { case (x, y) => (byId(x)._2, byId(y)._2) }}")
  }

  test("dedup_edit census equals the naive block² formulation (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("dedup_edit")(spark, d)
    val c = Tables.cachedTable(spark, d, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val a = c.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"),
      col("c_nationkey"))
    val b = c.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"),
      col("c_nationkey"))
    val naive = a.join(b, Seq("c_nationkey"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", TextOps.boundedLevenshtein(col("a_name"), col("b_name"), 2))
      .filter(col("dist") >= 0)
      .groupBy("c_nationkey", "dist")
      .agg(count(lit(1)).as("n_pairs"))
    assert(rowsOf(q) == rowsOf(naive))
  }
}
