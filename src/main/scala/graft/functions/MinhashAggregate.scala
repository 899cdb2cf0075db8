package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.TextFunctions._

/** Minhash signature as a single custom aggregate: for each of the K LCG
  * permutations j, the buffer tracks min((a_j·h + b_j) mod P31) over the
  * group's hash values, yielding the signature array in one pass with one
  * 32-slot mutable buffer.
  *
  * Functionally identical to the 32-separate-`min` formulation (the
  * DuckDB oracle's definition) but with one aggregate buffer instead of
  * 32 aggregate expressions — the `TypedImperativeAggregate` extension
  * point for sketch-shaped state the built-in aggregates can't fuse. */
case class MinhashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinhashK)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < MinhashK) {
        val p = (permA(j) * h + permB(j)) % P31
        if (p < buf(j)) buf(j) = p
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < MinhashK) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinhashK * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(MinhashK)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashSigAgg =
    copy(child = newChildren.head)
}

object MinhashSigAgg {
  /** Aggregate Column: minhash signature of the group's hash values. */
  def minhashSig(h: Column): Column =
    Bridge.column(MinhashSigAgg(Bridge.expression(h)).toAggregateExpression())
}
