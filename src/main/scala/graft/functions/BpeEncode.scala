package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a LEARNED BPE merge table to a document in one compiled pass:
  * whitespace words → per-character symbols → each merge applied in
  * rank order as a single left-to-right non-overlapping pass (Sennrich
  * 2015's reference `apply_bpe` semantics — arXiv:1508.07909; merges
  * learned by [[graft.ops.TextAnalysis.bpeMerges]]). Returns
  * `struct(n_words, n_pieces)` — the fertility numerator/denominator.
  *
  * The merge table rides the expression as a LITERAL (it is collected
  * once on the driver at plan time, K rows), so encoding is pure
  * map-side scan work: at 100 TB the trained artifact ships with the
  * task binary-like, the corpus never joins a vocabulary table, and the
  * scan stays in whole-stage codegen via a static-method call.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string argument, got ${t.sql}")
  }

  @transient private lazy val table: BpeEncode.MergeTable =
    BpeEncode.MergeTable(
      merges.map(_._1).toArray, merges.map(_._2).toArray)

  override def nullSafeEval(input: Any): Any = {
    val counts = BpeEncode.encode(input.asInstanceOf[UTF8String].toString, table)
    InternalRow(counts(0), counts(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, t => {
      val counts = ctx.freshName("counts")
      s"""
         |long[] $counts = graft.functions.BpeEncode.encode($t.toString(), $tableRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $counts[0], $counts[1] });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Precompiled merge table (rank order). */
  final case class MergeTable(left: Array[String], right: Array[String])
      extends Serializable

  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges))

  /** Segment one word: chars → K in-order merge passes, each a
    * left-to-right non-overlapping scan. Returns the piece count. */
  def encodeWord(word: String, t: MergeTable): Long = {
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = word.substring(i, i + w)
      n += 1
      i += w
    }
    var k = 0
    while (k < t.left.length) {
      val a = t.left(k); val b = t.right(k)
      var out = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
          syms(out) = a + b; j += 2
        } else { syms(out) = syms(j); j += 1 }
        out += 1
      }
      n = out
      k += 1
    }
    n.toLong
  }

  /** (n_words, n_pieces) for a whitespace-tokenized document. */
  def encode(text: String, t: MergeTable): Array[Long] = {
    var words = 0L
    var pieces = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      if (i < len) {
        val start = i
        while (i < len && text.charAt(i) != ' ') i += 1
        words += 1
        pieces += encodeWord(text.substring(start, i), t)
      }
    }
    Array(words, pieces)
  }
}
