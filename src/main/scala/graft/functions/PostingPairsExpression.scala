package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs from one sorted posting list — the candidate-pair
  * expansion at the heart of the inverted-index near-dup join (d2/d2b/
  * p1/d7 all share it).
  *
  * Input: array<struct<doc_id: long, n: long>> sorted ascending, so
  * emitted pairs always satisfy a < b. Output: array<struct<a, na, b,
  * nb>>, one element per i < j.
  *
  * Semantically identical to the nested transform/slice/flatten HOF
  * chain it replaces, but one two-level Scala loop per posting list
  * instead of an interpreted lambda tree per ELEMENT — higher-order
  * functions don't participate in codegen, and this expansion runs once
  * per shingle over the whole corpus. Eval-based (CodegenFallback) like
  * [[Shingles]]: the surrounding explode/aggregate pipeline stays
  * whole-stage. */
case class PostingPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("nb", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val ai = arr.getStruct(i, 2)
      val aId = ai.getLong(0)
      val aN = ai.getLong(1)
      var j = i + 1
      while (j < n) {
        val bj = arr.getStruct(j, 2)
        out(k) = InternalRow(aId, aN, bj.getLong(0), bj.getLong(1))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PostingPairs =
    copy(child = newChild)
}

object PostingPairs {
  /** Pair expansion of a sorted array<struct<doc_id, n>> posting list. */
  def pairsFast(c: Column): Column =
    Bridge.column(PostingPairs(Bridge.expression(c)))
}
