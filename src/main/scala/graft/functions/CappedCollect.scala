package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** `collect_list` with a HARD per-group memory bound: stores at most
  * `cap` elements, forever, in every buffer — update AND merge stop
  * appending past the cap (truncation is arbitrary-but-deterministic
  * given partitioning; callers must not rely on WHICH elements survive
  * in an overfull group, only on completeness of groups that fit).
  *
  * Built for the posting-list inverted index ([[graft.ops.Dedup]]):
  * with `cap = τ+1`, a group that fits (`size ≤ τ`) is guaranteed
  * COMPLETE — the cap was never hit — while a hot group (df > τ)
  * saturates at τ+1 elements, enough to detect hotness without an exact
  * count column. A plain `collect_list` here would buffer one doc_id per
  * posting — multi-GB for the boilerplate-shingle group the stop-shingle
  * cut exists to catch — and OOM precisely on the skew the cut is
  * supposed to absorb.
  *
  * Buffer is a growable primitive-long builder capped at `cap`; the
  * shuffle carries at most `cap` longs per (partition, group). */
case class CappedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"capped_collect expects an integral element, got ${t.sql}")
  }

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](4)

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) v match {
        case l: java.lang.Long => buf += l.longValue()
        case i: java.lang.Integer => buf += i.longValue()
        case other => buf += other.asInstanceOf[Long]
      }
    }
    buf
  }

  override def merge(
      a: scala.collection.mutable.ArrayBuffer[Long],
      b: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    val room = cap - a.length
    if (room >= b.length) a ++= b
    else if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    while (bb.hasRemaining) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollect =
    copy(child = newChildren.head)

  override def prettyName: String = "capped_collect"
}

object CappedCollect {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: `capped_collect(v, cap)` → array<long>, ≤ cap elements. */
  def apply(v: Column, cap: Int): Column =
    Bridge.column(CappedCollect(Bridge.expression(v), cap)
      .toAggregateExpression())
}
