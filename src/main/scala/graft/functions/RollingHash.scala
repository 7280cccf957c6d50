package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled polynomial rolling hash mod 1e9+7 over a string's code points.
  *
  * Semantically identical to the HOF chain
  * `aggregate(filter(split(c, ""), len>0), 0L, (acc, ch) => (acc*mult +
  * ascii(ch)) % p)` — a sequential left fold, one code point at a time —
  * and to DuckDB's `list_reduce(list_transform(string_split(s, ''), c ->
  * ascii(c)), (a, b) -> (a*mult + b) % p)`. The HOF form allocates a
  * per-character string array and evaluates an interpreted lambda per
  * element; this expression runs one compiled loop per row (hot path of
  * the shingle/minhash/simhash/fingerprint operators).
  */
case class RollingHash(child: Expression, mult: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string argument, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c, ${mult}L);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  private val P = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, mult: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column, mult: Long): Column =
    Bridge.column(RollingHash(Bridge.expression(c), mult))
}
