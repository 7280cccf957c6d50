package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Whole-stage-codegen squared L2 distance over two double arrays.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_)` — the
  * SAME sequential left fold in index order ((xᵢ−yᵢ)² accumulated with
  * 0.0 init), so it is bit-for-bit the value the interpreted HOF chain
  * and the DuckDB `list_reduce` oracle produce. The HOF chain evaluates
  * two interpreted lambdas per element and materializes the zipped
  * array; this is one primitive loop inside whole-stage codegen — the
  * difference that matters on the |corpus|·k candidate rows a PQ/IVF
  * encoding pass scores (cf. [[DotProduct]], same rationale).
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects two array<double> arguments, got ${l.sql} / ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist"
}

object SqDist {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level API: `SqDist(a, b)` as a drop-in for the HOF fold. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SqDist(Bridge.expression(a), Bridge.expression(b)))
}
