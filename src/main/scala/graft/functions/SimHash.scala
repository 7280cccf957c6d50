package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled 60-bit term-frequency SimHash over a document's word array.
  *
  * Per word w (empty strings skipped): h1 = poly-hash(w, 31), h2 =
  * poly-hash(w, 37) mod 1e9+7 (same kernel as [[RollingHash]]). Bit j's
  * contribution accumulates ((h >> (j % 30)) & 1) * 2 - 1 where h = h1 for
  * j < 30 else h2 — summed over word INSTANCES, which equals the
  * sum over distinct words weighted by term frequency (the textbook
  * formulation) because the contribution is linear in the count. The
  * signature sets bit j iff its contribution is positive.
  *
  * SimHash is embarrassingly per-document, so it belongs on the map side:
  * this expression turns the (doc, word) explode + two shuffled
  * aggregations into one narrow compiled loop per row — at 100 TB the
  * signature pass becomes a pure scan, and only 15-bit band keys are ever
  * shuffled (reference surface: near-dup detection beyond
  * dbt-meshify; see README "LLM-data-pipeline operators").
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60 {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(words: ArrayData): Long = {
    val contrib = new Array[Long](60)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        val h1 = RollingHash.compute(w, 31L)
        val h2 = RollingHash.compute(w, 37L)
        var j = 0
        while (j < 60) {
          val h = if (j < 30) h1 else h2
          contrib(j) += (((h >> (j % 30)) & 1L) * 2L - 1L)
          j += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 60) {
      if (contrib(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(c)))
}
