package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a mergeable aggregate: a bounded
  * (≤ k-1 entry) counter map whose surviving keys are a guaranteed
  * SUPERSET of every item with true frequency > n/k (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The buffer never exceeds k-1 entries, so the map-side partial
  * aggregation Spark performs for TypedImperativeAggregate bounds the
  * shuffle at O(k) per input partition REGARDLESS of vocabulary size —
  * the property that makes a first-pass candidate scan feasible at 100 TB
  * where an exact `groupBy(token)` would shuffle the whole vocabulary.
  * The aggregate is approximate by itself (counts are under-estimates);
  * t14 restores exactness with a second pass that re-counts only the
  * candidates (broadcast semi-join), so the final operator output is
  * exact and DuckDB-oracle-checkable.
  *
  * eval returns the surviving keys sorted (deterministic plan output);
  * callers re-count, so the residual counts are deliberately dropped.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, s"Misra-Gries k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String backing bytes are reused across rows; materialize.
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < k - 1) buf.update(key, 1L)
          else decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k - 1) {
      // Subtract the k-th largest count from every entry and drop the
      // non-positive ones: the merged summary keeps the superset
      // guarantee with at most k-1 survivors (Agarwal et al. §3.1).
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - (k - 1) - 1)
      decrementAll(buf, kth)
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (key, c) =>
      if (c - by <= 0) dead += key else buf.update(key, c - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (key, _) => key.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(12 + _.length).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Aggregate Column: sorted candidate keys covering every item with
    * frequency > (group size)/k. */
  def misraGries(item: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(item), k).toAggregateExpression())
}
