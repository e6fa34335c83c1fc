package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of a string's delete-neighborhood — every variant
  * reachable by deleting at most `k` characters (the string itself, all
  * delete-1 variants, and for k=2 all delete-2 variants), deduplicated.
  *
  * This is the index/probe key kernel for the SymSpell bounded-edit-
  * distance filter ([[graft.operators.TextOps.editDeleteCandidates]]):
  * the candidate join only needs variant EQUALITY, so the variants never
  * have to exist as strings — each is hashed in one pass over the code
  * points with the skip positions excluded (FNV-1a style fold + final
  * avalanche). That removes both the per-variant string allocation and
  * the interpreted HOF build that dominated the first cut (~170 concat +
  * array ops per row, measured 2s/15k rows; this kernel is ~50ms).
  * Hash collisions can only ADD candidate pairs — the caller's bounded-DP
  * verification keeps the final result exact.
  *
  * Code-point level (not bytes), so multibyte text deletes whole
  * characters, matching [[BoundedLevenshtein]]'s char-level distances.
  */
case class DeleteVariantHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k == 1 || k == 2, s"delete neighborhood supports k in {1, 2}, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "delete_variant_hashes"

  override protected def nullSafeEval(s: Any): Any =
    DeleteVariantHashes.hashes(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeleteVariantHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DeleteVariantHashes =
    copy(child = newChild)
}

object DeleteVariantHashes {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Static so the generated code is a single call. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val cap = 1 + (if (k >= 1) n else 0) + (if (k >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](cap)
    var m = 0
    // Hash of the code-point sequence with positions skip1/skip2 excluded.
    def h(skip1: Int, skip2: Int): Long = {
      var acc = FnvOffset
      var i = 0
      while (i < n) {
        if (i != skip1 && i != skip2) acc = (acc ^ cps(i)) * FnvPrime
        i += 1
      }
      // final avalanche (murmur3 fmix64 first half) so short near-equal
      // sequences don't cluster
      acc ^= acc >>> 33
      acc *= 0xff51afd7ed558ccdL
      acc ^ (acc >>> 33)
    }
    out(m) = h(-1, -1); m += 1
    if (k >= 1) {
      var i = 0
      while (i < n) { out(m) = h(i, -1); m += 1; i += 1 }
    }
    if (k >= 2) {
      var i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { out(m) = h(i, j); m += 1; j += 1 }
        i += 1
      }
    }
    // dedup (equal adjacent characters make delete variants coincide):
    // sort + unique over <=~200 longs
    java.util.Arrays.sort(out, 0, m)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}
