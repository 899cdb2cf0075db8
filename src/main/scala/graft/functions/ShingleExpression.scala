package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-token shingle expression: all n-grams of the space-split
  * tokens, joined by a single space.
  *
  * Semantically identical to [[TextFunctions.shinglesAll]] (split keeps
  * trailing empties, i.e. Java split with limit -1), but evaluated as one
  * Scala loop per row instead of a transform/sequence/slice/array_join
  * HOF chain — which profiled at ~11µs per shingle and dominated every
  * shingle-pipeline operator. Eval-based (CodegenFallback): per-row cost
  * is a few µs, and the surrounding explode/aggregate pipeline stays
  * whole-stage. */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val count = toks.length - (n - 1)
    if (count < 1) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](count)
    val seen = if (distinct) new java.util.HashSet[String](count * 2) else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      // first-occurrence order, matching array_distinct over all shingles
      if (!distinct || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** All n-token shingles — drop-in for TextFunctions.shinglesAll. */
  def shinglesFast(c: Column, n: Int = 3): Column =
    Bridge.column(Shingles(Bridge.expression(c), n, distinct = false))

  /** Distinct shingles in first-occurrence order (O(k) HashSet, not the
    * O(k²) array_distinct) — drop-in for TextFunctions.shingles. */
  def shinglesDistinctFast(c: Column, n: Int = 3): Column =
    Bridge.column(Shingles(Bridge.expression(c), n, distinct = true))
}
