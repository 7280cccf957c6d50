package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multiplicity of the most frequent adjacent-word bigram in a word array
  * — `TopBigramRun(ws)` ≡ `MaxSortedRun(array_sort(bigrams))` where
  * `bigrams[i] = concat_ws(" ", ws[i], ws[i+1])`, but in ONE compiled pass
  * with no bigram-array materialization and no per-row sort: counts land
  * in an open-addressing table keyed by the two word references.
  *
  * Word equality is by string value; since the word array comes from a
  * split on " ", no word contains a space and (a, b) pair equality is
  * exactly the joined-string equality of the HOF form. Returns 0 for
  * arrays with fewer than two elements (no bigrams — callers filter those
  * rows anyway, mirroring the oracle's generate_series bound).
  */
case class TopBigramRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_bigram_run expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TopBigramRun.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopBigramRun.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TopBigramRun =
    copy(child = newChild)

  override def prettyName: String = "top_bigram_run"
}

object TopBigramRun {

  /** Static kernel shared by interpreted eval and generated code: linear
    * probing over a power-of-two table of (first, second) word slots. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val pairs = n - 1
    // table sized ≥ 2× pair count keeps probe chains short
    var cap = 4
    while (cap < pairs * 2) cap <<= 1
    val ka = new Array[UTF8String](cap)
    val kb = new Array[UTF8String](cap)
    val cnt = new Array[Long](cap)
    var best = 0L
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      var slot = {
        val ha = if (prev == null) 0 else prev.hashCode()
        val hb = if (cur == null) 0 else cur.hashCode()
        (ha * 31 + hb) & (cap - 1)
      }
      var placed = false
      while (!placed) {
        if (cnt(slot) == 0L) {
          ka(slot) = prev; kb(slot) = cur; cnt(slot) = 1L
          placed = true
        } else if (eq(ka(slot), prev) && eq(kb(slot), cur)) {
          cnt(slot) += 1L
          placed = true
        } else slot = (slot + 1) & (cap - 1)
      }
      if (cnt(slot) > best) best = cnt(slot)
      prev = cur
      i += 1
    }
    best
  }

  private def eq(a: UTF8String, b: UTF8String): Boolean =
    if (a == null) b == null else b != null && a.equals(b)

  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column): Column =
    Bridge.column(TopBigramRun(Bridge.expression(c)))
}
