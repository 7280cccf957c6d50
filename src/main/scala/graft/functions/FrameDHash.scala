package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-frame difference-hash signatures in one compiled walk — the
  * perceptual-hash analog for the opaque-payload frame model (m03/m09):
  * for each frame window of `frameLen` code units at `stride`, bit i of
  * the signature is `byte[i] > byte[i+1]` (the dHash gradient construction
  * — public, e.g. Krawetz's "Kind of Like That"; on real media the bytes
  * are decoded luma, here the payload bytes themselves). Gradient bits
  * survive uniform re-encode shifts that break m09's exact frame hashes,
  * so a hamming-tolerant tier over these signatures catches re-encoded
  * copies. Returns one long per frame (frameLen − 1 ≤ 63 bits).
  *
  * Cross-engine note: comparisons are on UTF-16 code units, which equals
  * the oracle's per-character `ascii()` comparison for the BMP text this
  * corpus carries.
  */
case class FrameDHash(child: Expression, frameLen: Int, stride: Int)
    extends UnaryExpression {

  require(frameLen >= 2 && frameLen <= 64 && stride >= 1,
    s"frame_dhash: bad geometry ($frameLen, $stride)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"frame_dhash expects a string argument, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      FrameDHash.signatures(
        input.asInstanceOf[UTF8String].toString, frameLen, stride))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.FrameDHash.signatures($t.toString(), $frameLen, $stride));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FrameDHash =
    copy(child = newChild)

  override def prettyName: String = "frame_dhash"
}

object FrameDHash {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, frameLen: Int, stride: Int): Column =
    Bridge.column(FrameDHash(Bridge.expression(text), frameLen, stride))

  def signatures(s: String, frameLen: Int, stride: Int): Array[Long] = {
    val n = if (s.length < frameLen) 0 else (s.length - frameLen) / stride + 1
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      val base = k * stride
      var sig = 0L
      var i = 0
      while (i < frameLen - 1) {
        if (s.charAt(base + i) > s.charAt(base + i + 1)) sig |= (1L << i)
        i += 1
      }
      out(k) = sig
      k += 1
    }
    out
  }
}
