package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** MinHash sketch as a TypedImperativeAggregate (SURVEY §7 "built-in vs
  * custom": MinHash dedup → custom TypedImperativeAggregate).
  *
  * Input: one int64 element hash per row (e.g. a shingle's rolling hash).
  * Output: array<long> of `numPerms` signature values, where
  * `sig[j] = min over rows of ((2j+1)·h + j) mod 1e9+7` — the same affine
  * permutation family the SQL formulation uses, so results are identical
  * to a 64-column min aggregation and to the DuckDB oracle.
  *
  * The buffer is a primitive long array updated in place — one pass, no
  * 64-wide UnsafeRow churn per input row; partial (map-side) aggregation
  * and merges work like any Spark aggregate, so the shuffle carries one
  * sketch per (partition, group), not the corpus. */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 1000000007L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash expects an integral element hash, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.asInstanceOf[Long]
      }
      var j = 0
      while (j < numPerms) {
        val p = ((2L * j + 1) * h + j) % P
        if (p < buf(j)) buf(j) = p
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerms) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash"
}

object MinHashAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: `minhash(h, 64)` → array<long> signature. */
  def apply(h: Column, numPerms: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(h), numPerms)
      .toAggregateExpression())
}
