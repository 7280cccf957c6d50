package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Longest run of equal adjacent elements in a SORTED string array — i.e.
  * the multiplicity of the most frequent element.
  *
  * `MaxSortedRun(array_sort(xs))` ≡ `max(cnt)` of
  * `GROUP BY x` over the exploded array, but runs as one narrow compiled
  * loop per row instead of a corpus-wide (row, element) shuffle: the
  * repetition statistic is per-document, so at 100 TB it belongs on the
  * map side like the SimHash/fingerprint kernels.
  */
case class MaxSortedRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_sorted_run expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MaxSortedRun.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxSortedRun.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MaxSortedRun =
    copy(child = newChild)

  override def prettyName: String = "max_sorted_run"
}

object MaxSortedRun {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    var best = 1L
    var run = 1L
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (cur != null && prev != null && cur.equals(prev)) run += 1
      else run = 1
      if (run > best) best = run
      prev = cur
      i += 1
    }
    best
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column): Column =
    Bridge.column(MaxSortedRun(Bridge.expression(c)))
}
