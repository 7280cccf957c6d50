package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen |distinct(A) ∩ distinct(B)| over two SORTED string
  * arrays — the exact-verification inner loop of the LSH/SimHash audit
  * tier (d03/d12/d19).
  *
  * Semantically identical to `size(array_intersect(a, b))` — including
  * duplicate handling (each matched value counts once) — but a two-pointer
  * merge instead of a per-call hash set: `array_intersect` allocates an
  * OpenHashSet AND materializes the result array for every pair scored,
  * while this kernel is a branchy-but-allocation-free compiled walk that
  * only ever produces the count. On the candidate streams a band join
  * emits at 100 TB (millions of pairs × hundreds of shingles), the
  * difference is an interpreted allocating hash build vs a compiled merge
  * per pair.
  *
  * PRECONDITION: both inputs ascending-sorted (callers `array_sort` the
  * per-doc shingle arrays once, off the shared checkpoint — per-doc
  * n·log n on a narrow scan, amortized over every pair the doc appears
  * in). Unsorted input silently undercounts; the ExpressionsSpec property
  * pins parity with `array_intersect` on sorted randoms.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_count expects two array<string> arguments, got ${l.sql} / ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var count = 0L
    while (i < n && j < m) {
      val xv = x.getUTF8String(i)
      val yv = y.getUTF8String(j)
      val cmp = xv.compareTo(yv)
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else {
        count += 1
        i += 1
        j += 1
        while (i < n && x.getUTF8String(i).equals(xv)) i += 1
        while (j < m && y.getUTF8String(j).equals(yv)) j += 1
      }
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0; int $j = 0;
         |long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  org.apache.spark.unsafe.types.UTF8String $xv = $x.getUTF8String($i);
         |  org.apache.spark.unsafe.types.UTF8String $yv = $y.getUTF8String($j);
         |  int $cmp = $xv.compareTo($yv);
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else {
         |    $cnt++; $i++; $j++;
         |    while ($i < $n && $x.getUTF8String($i).equals($xv)) { $i++; }
         |    while ($j < $m && $y.getUTF8String($j).equals($yv)) { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_count"
}

object IntersectCount {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level API: drop-in for `size(array_intersect(a, b))` on
    * ascending-sorted arrays. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(IntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
