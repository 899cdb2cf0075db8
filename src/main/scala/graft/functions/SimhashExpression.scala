package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass simhash over a document's distinct n-token shingles.
  *
  * Semantically identical to the explode + groupBy formulation (and the
  * DuckDB oracle): bit `b` of the result is set iff
  * `sum over distinct shingles of ((polyhash(s) >> b & 1) * 2 - 1) > 0`,
  * with polyhash = fold `(acc*31 + byte) % prime` from 7 ([[PolyHash]])
  * and shingle semantics exactly [[Shingles]] (split on single spaces
  * keeping empties, first-occurrence distinct).
  *
  * The point is the plan shape: the aggregate formulation explodes every
  * shingle into a row and shuffles them into a 48-sum hash aggregate —
  * at 100 TB that exchange carries ~token-count rows for what is a
  * row-local computation. This expression computes the signature where
  * the document already is: no explode, no shuffle, one tight loop per
  * row. Eval-based (CodegenFallback), like [[Shingles]]: per-row cost is
  * a few µs of string walking; the surrounding scan stays whole-stage. */
case class SimhashText(child: Expression, n: Int, prime: Long, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val count = toks.length - (n - 1)
    // a document with no shingles has NO signature: the aggregate
    // formulation (and the oracle) never emit a row for it, so banding
    // it at an all-zero signature would pair every short doc with every
    // other — NULL keeps it out of the join exactly like the original
    if (count < 1) return null
    val votes = new Array[Int](bits)
    if (count >= 1) {
      val seen = new java.util.HashSet[String](count * 2)
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
        if (seen.add(s)) {
          // polyhash over UTF-8 bytes, identical to PolyHash
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var acc = 7L
          var k = 0
          while (k < bytes.length) {
            acc = (acc * 31 + (bytes(k) & 0xffL)) % prime
            k += 1
          }
          var b = 0
          while (b < bits) {
            votes(b) += (if (((acc >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        i += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {
  /** Column-API entry point: 48-bit simhash of `c`'s distinct 3-shingles;
    * NULL when the text has no shingles (fewer than n tokens). */
  def simhashFast(c: Column, n: Int, prime: Long, bits: Int): Column =
    Bridge.column(SimhashText(Bridge.expression(c), n, prime, bits))
}
