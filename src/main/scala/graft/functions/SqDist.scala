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

/** [[SqDist]] over two long arrays — the exact-integer twin for
  * fixed-point embedding audits: `Σ (xᵢ−yᵢ)²` in int64 (callers bound
  * the element magnitude so the squared terms cannot overflow; a 2²¹
  * fixed-point difference squared is 2⁴², leaving 2²¹ dims of headroom).
  * On equal-length inputs this is the same sequential left fold as
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, _+_)`; on
  * MISMATCHED lengths it folds the first min(|a|,|b|) elements
  * ([[SqDist]]'s convention) where the zip_with form null-poisons —
  * callers feeding variable-width vectors should validate dimensions
  * upstream rather than rely on either behavior. */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq_dist_long expects two array<bigint> arguments, got ${l.sql} / ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist_long"
}

object SqDistLong {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level API: exact-integer squared L2 over long arrays. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expression(a), Bridge.expression(b)))
}
