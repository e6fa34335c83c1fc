package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §2.B scale notes: "salting
  * for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles sort-merge joins whose skew is visible in
  * shuffle statistics, but it cannot help when the skewed side must join a
  * medium table that is too big to broadcast and the hot key's rows all
  * hash to one task. Salting fixes that mechanically: the big side gets a
  * deterministic per-row salt in [0, k), the small side is replicated k
  * times (once per salt value), and the join key becomes (keys..., salt) —
  * the hot key's rows now spread over k tasks. The result is EXACTLY the
  * plain join (salting is an execution detail), which is what the DuckDB
  * oracle checks.
  */
object SkewOps {

  /** Inner equi-join of `big` (possibly key-skewed) with `small`, salted
    * k ways. `small` is replicated k× via a generator (its rows each carry
    * every salt), so pick k ≪ big/small size ratio; the per-row salt on
    * the big side is a hash of the whole row — deterministic, uniform,
    * and independent of the join key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 8): DataFrame = {
    require(salt > 0, "salt factor must be positive")
    val S = "__graft_salt"
    val rowHash: Column = xxhash64(big.columns.toIndexedSeq.map(col): _*)
    val b = big.withColumn(S, pmod(rowHash, lit(salt)).cast("int"))
    val s = small.withColumn(S, explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ S).drop(S)
  }
}
