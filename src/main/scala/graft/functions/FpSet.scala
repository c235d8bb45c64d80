package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fp32_set(arr)` — the sorted distinct 32-bit md5 fingerprints of a
  * string array, as `array<long>`: semantically
  * `sort_array(array_distinct(transform(arr, x ->
  * hex_slice_long(md5(x), 0))))`, in one per-row pass.
  *
  * Why an expression and not that composition: `transform` is a
  * higher-order function (CodegenFallback with per-element lambda
  * frames), and the alternative — explode → md5 → collect_set —
  * rebuilds the set through a full token-grain EXCHANGE plus an
  * ObjectHashAggregate. Both were measured as the dominant cost of
  * the containment pipeline's index build. This expression keeps the
  * per-document set build NARROW: no token-grain rows ever exist, no
  * shuffle, one MessageDigest reused across elements.
  *
  * Bit-parity: each fingerprint is the first 4 bytes of
  * `MD5(utf8(x))` read big-endian as an unsigned 32-bit value in a
  * long — exactly `hex_slice_long(md5(x), 0)` on the Spark side and
  * the DuckDB nibble-sum over `substr(md5(x), 1, 8)` on the oracle
  * side, both already hash-proven cross-engine. Values lie in
  * [0, 2³²), so the signed long sort equals the unsigned order.
  * Null elements are skipped (the composed form would carry a null
  * through md5 and sort it first; callers here build sets from
  * generated gram arrays, which contain none).
  */
case class FpSet(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fp32_set expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(arrAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val fps = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        fps(m) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(fps, 0, m)
    // in-place dedup of the sorted prefix
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || fps(i) != fps(w - 1)) { fps(w) = fps(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(fps, 0, out, 0, w)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): FpSet =
    copy(child = newChild)

  override def prettyName: String = "fp32_set"
}

/** `fp_inter_count(a, b)` — |A ∩ B| of two SORTED DISTINCT sets
  * (`array<long>` as [[FpSet]] emits, or `array<string>` as
  * `array_sort(array_distinct(...))` emits — Spark's `array_sort`
  * on strings is UTF8 binary order, the same comparator used here)
  * as BIGINT, by a two-pointer merge: one O(|A|+|B|) pass, zero
  * allocation.
  *
  * Why an expression: `size(array_intersect(a, b))` is the per-pair
  * hot path of containment / Jaccard verification — it builds a hash
  * set AND materializes the intersection array per candidate pair
  * just to take its length (measured as the dominant cost of the
  * verification stages). Sortedness makes both allocations
  * unnecessary; the count over sorted-distinct inputs is identical
  * to `array_intersect`'s by definition. The [[BagOverlap]] merge
  * discipline on plain sets. */
case class FpInterCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fp_inter_count expects two ARRAY<BIGINT> or two ARRAY<STRING>, got ($l, $r)")
    }
  override def dataType: DataType = LongType

  private lazy val isString = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(la: Any, ra: Any): Any = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    if (isString) {
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
        if (cmp == 0) { cnt += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FpInterCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "fp_inter_count"
}

object FpSet {
  /** Column-API form. Requires graft.plans.GraftExtensions.register. */
  def fp32_set(arr: Column): Column = call_function("fp32_set", arr)
  /** Column-API form. Requires graft.plans.GraftExtensions.register. */
  def fp_inter_count(a: Column, b: Column): Column =
    call_function("fp_inter_count", a, b)
}
