package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled basket→pair expansion. */
object PairKernels {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: all ordered index pairs (i < j) of a long array as
    * `array<struct<da, db>>` — on a sorted-distinct input (the basket
    * ops feed `sort_array(collect_set(...))`) that is exactly the
    * da < db co-occurrence pair set. One compiled pass replacing the
    * `flatten(transform(.., transform(slice(..))))` HOF chain whose
    * lambdas evaluate interpreted per element with a closure dispatch
    * and two intermediate nested arrays per basket. */
  def sortedPairs(arr: Column): Column =
    Bridge.column(SortedPairs(Bridge.expression(arr)))

  /** Column API: [[sortedPairs]] with each (da, db) pair PACKED into one
    * long `(da << 32) | db` — the support-aggregation key form (half the
    * exchange bytes, one hash, no per-pair struct allocation). Requires
    * every element in [0, 2^31); the kernel throws loudly otherwise
    * (same contract as GraphOps' checkedVertex — a 2B-key catalog must
    * fail, not silently merge).
    *
    * `withDiagonal = true` additionally emits `(d << 32) | d` for every
    * element — the da ≤ db posting-list form whose diagonal carries the
    * per-doc surviving-shingle sizes (Dedup.pairCounts). */
  def sortedPairsPacked(arr: Column, withDiagonal: Boolean = false): Column =
    Bridge.column(SortedPairsPacked(Bridge.expression(arr), withDiagonal))
}

/** All (arr(i), arr(j)) with i < j, basket-pair order. C(n,2) output
  * elements — bounded by the basket (per-group collection) size, never
  * corpus-scaled; callers cap the group size upstream where baskets can
  * grow (an order's item count is semantically bounded).
  *
  * Keys stay full 64-bit longs (no 32-bit packing), so the kernel is
  * safe for any key domain at any scale. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SortedPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)

  override def prettyName: String = "sorted_pairs"
}

object SortedPairs {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // Long math: n*(n-1) overflows Int32 at n ≥ 46342 (to a NEGATIVE
    // size). Fail loudly with the offending cardinality instead — an
    // uncapped group reaching this kernel is a caller bug.
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue,
      s"sorted_pairs: group of $n elements expands to $m pairs; " +
        "cap the group size upstream")
    val out = new Array[Any](m.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, arr.getLong(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** [[SortedPairs]] emitting packed long keys `(arr(i) << 32) | arr(j)`
  * for i < j — see [[PairKernels.sortedPairsPacked]] for the contract.
  * C(n,2) primitive longs, no per-pair row allocation. */
case class SortedPairsPacked(child: Expression,
    withDiagonal: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs_packed expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedPairsPacked.compute(input.asInstanceOf[ArrayData], withDiagonal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SortedPairsPacked.compute($c, $withDiagonal);")

  override protected def withNewChildInternal(
      newChild: Expression): SortedPairsPacked =
    copy(child = newChild)

  override def prettyName: String = "sorted_pairs_packed"
}

object SortedPairsPacked {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): GenericArrayData = compute(arr, false)

  def compute(arr: ArrayData, withDiagonal: Boolean): GenericArrayData = {
    val n = arr.numElements()
    if (n < (if (withDiagonal) 1 else 2))
      return new GenericArrayData(Array.empty[Long])
    val m = n.toLong * (n - 1) / 2 + (if (withDiagonal) n.toLong else 0L)
    require(m <= Int.MaxValue,
      s"sorted_pairs_packed: group of $n elements expands to $m pairs; " +
        "cap the group size upstream")
    val out = new Array[Long](m.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      require(a >= 0L && a < (1L << 31),
        s"sorted_pairs_packed: key $a outside [0, 2^31) — " +
          "use the two-column sorted_pairs form")
      if (withDiagonal) { out(k) = (a << 32) | a; k += 1 }
      var j = i + 1
      while (j < n) {
        val b = arr.getLong(j)
        require(b >= 0L && b < (1L << 31),
          s"sorted_pairs_packed: key $b outside [0, 2^31) — " +
            "use the two-column sorted_pairs form")
        out(k) = (a << 32) | b
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
