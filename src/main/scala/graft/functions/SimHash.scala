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

/** [[SimHash60]] fused with tokenization: takes the raw text column and
  * scans word boundaries (single 0x20 separators) straight off the bytes —
  * no regex `split`, no word array. Exactly
  * `simhash60(split(text, ' ', -1))`: empty tokens (adjacent separators)
  * are skipped by both forms. */
case class SimHash60Text(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60_text expects string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60Text.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash60Text.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Text =
    copy(child = newChild)

  override def prettyName: String = "simhash60_text"
}

object SimHash60Text {

  /** Static kernel: one pass over the text bytes, per-word contributions
    * identical to [[SimHash60.compute]] over the split words. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    val contrib = new Array[Long](60)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' '.toByte) {
        if (i > start) {
          val w = UTF8String.fromBytes(bytes, start, i - start)
          val h1 = RollingHash.compute(w, 31L)
          val h2 = RollingHash.compute(w, 37L)
          var j = 0
          while (j < 60) {
            val h = if (j < 30) h1 else h2
            contrib(j) += (((h >> (j % 30)) & 1L) * 2L - 1L)
            j += 1
          }
        }
        start = i + 1
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
    Bridge.column(SimHash60Text(Bridge.expression(c)))
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
