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

/** Polynomial hash of every n-token gram of the space-split text, in
  * token-offset order — `array<long>`, element j =
  * `PolyHash(concat_ws(" ", slice(tokens, j+1, n)), prime)`
  * (optimization round 17).
  *
  * Key identity: splitting on single spaces and re-joining n consecutive
  * tokens with single spaces reproduces the ORIGINAL byte span between
  * those token boundaries verbatim (empty tokens from runs of spaces
  * round-trip too, and UTF-8 multi-byte sequences never contain 0x20),
  * so each gram's hash folds directly over a slice of the text's byte
  * array — one boundary scan plus one O(gram bytes) fold per offset, no
  * per-offset slice/concat/UTF8String materialization. The d14/d15
  * span-dedup gram stage evaluated an interpreted
  * transform(sequence(...), slice+concat_ws+hash) chain per token
  * offset, which profiled as the bulk of the span operators' scan
  * stage. Returns fewer-than-n-token texts as an empty array, matching
  * the callers' `size(toks) >= n` guard semantics. */
case class GramHashes(child: Expression, n: Int, prime: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token start offsets: token 0 at 0, token k+1 after each 0x20
    var nToks = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nToks += 1; i += 1 }
    val grams = nToks - n + 1
    if (grams < 1) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](grams)
    var j = 0
    while (j < grams) {
      val from = starts(j)
      val until = if (j + n < nToks) starts(j + n) - 1 else bytes.length
      var acc = 7L
      var p = from
      while (p < until) { acc = (acc * 31 + (bytes(p) & 0xffL)) % prime; p += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object Shingles {
  /** All n-token shingles — drop-in for TextFunctions.shinglesAll. */
  def shinglesFast(c: Column, n: Int = 3): Column =
    Bridge.column(Shingles(Bridge.expression(c), n, distinct = false))

  /** Hashes of all n-token shingles (see [[GramHashes]]) — drop-in for
    * `transform(sequence(...), j => polyHashFast(concat_ws(" ",
    * slice(toks, j+1, n)), prime))`. */
  def gramHashesFast(c: Column, n: Int, prime: Long): Column =
    Bridge.column(GramHashes(Bridge.expression(c), n, prime))

  /** Distinct shingles in first-occurrence order (O(k) HashSet, not the
    * O(k²) array_distinct) — drop-in for TextFunctions.shingles. */
  def shinglesDistinctFast(c: Column, n: Int = 3): Column =
    Bridge.column(Shingles(Bridge.expression(c), n, distinct = true))
}
