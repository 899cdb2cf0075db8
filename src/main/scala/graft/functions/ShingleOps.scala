package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-slice evaluation bodies for the shingle-family expressions
  * ([[Shingles]], [[GramHashes]], [[SimhashText]]) — called from BOTH
  * `nullSafeEval` and the expressions' generated code, so the interpreted
  * and codegen paths cannot drift (optimization round 18, guide §4:
  * per-task work).
  *
  * Key identity (the [[GramHashes]] round-17 argument, now applied to the
  * string-producing shingles too): splitting on single spaces and
  * re-joining n consecutive tokens with single spaces reproduces the
  * ORIGINAL byte span between those token boundaries verbatim — empty
  * tokens from runs of spaces round-trip, and UTF-8 multi-byte sequences
  * never contain 0x20. So an n-token shingle IS the byte slice
  * `[starts(j), starts(j+n) - 1)` of the text, and the previous
  * split-to-String[] + StringBuilder + String + UTF-8 re-encode chain
  * (4 allocations and one UTF-16→UTF-8 encode per shingle) collapses to
  * one `Arrays.copyOfRange` per emitted shingle. Distinctness over valid
  * UTF-8 is byte equality (the encoding is injective), so the
  * first-occurrence HashSet moves from String to UTF8String unchanged. */
object ShingleOps {

  /** Token start offsets of `bytes` under split-on-0x20 semantics
    * (Java `split(" ", -1)`): token 0 at 0, token k+1 after each space.
    * Returns null when there are fewer than `n` tokens (no shingles). */
  private def tokenStarts(bytes: Array[Byte], n: Int): Array[Int] = {
    var nToks = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nToks += 1; i += 1 }
    if (nToks - n + 1 < 1) return null
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts
  }

  /** All (or first-occurrence-distinct) n-token shingles of `input` —
    * the [[Shingles]] body. Each emitted shingle copies its byte span
    * once (`copyOfRange`): the returned UTF8Strings escape the eval and
    * must not alias the input's (possibly reused) buffer. */
  def shingles(input: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = input.getBytes
    val starts = tokenStarts(bytes, n)
    if (starts == null) return new GenericArrayData(Array.empty[Any])
    val nToks = starts.length
    val count = nToks - n + 1
    val out = new java.util.ArrayList[Any](count)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](count * 2) else null
    var j = 0
    while (j < count) {
      val from = starts(j)
      val until = if (j + n < nToks) starts(j + n) - 1 else bytes.length
      val s = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, until))
      if (!distinct || seen.add(s)) out.add(s)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Polynomial hash of every n-token gram, in token-offset order — the
    * [[GramHashes]] body. Returned as an UnsafeArrayData over a primitive
    * long[] (no boxing; value-identical to the GenericArrayData form). */
  def gramHashes(input: UTF8String, n: Int, prime: Long): ArrayData = {
    val bytes = input.getBytes
    val starts = tokenStarts(bytes, n)
    if (starts == null)
      return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val nToks = starts.length
    val grams = nToks - n + 1
    val out = new Array[Long](grams)
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
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** One-pass simhash over the distinct n-token shingles — the
    * [[SimhashText]] body. Returns `java.lang.Long` (null when the text
    * has fewer than n tokens: a shingle-less doc has NO signature).
    * The distinct set wraps byte spans WITHOUT copying (fromBytes with
    * offset aliases the input buffer) — safe because the set never
    * escapes this call. */
  def simhash(input: UTF8String, n: Int, prime: Long,
      bits: Int): java.lang.Long = {
    val bytes = input.getBytes
    val starts = tokenStarts(bytes, n)
    if (starts == null) return null
    val nToks = starts.length
    val count = nToks - n + 1
    val votes = new Array[Int](bits)
    val seen = new java.util.HashSet[UTF8String](count * 2)
    var j = 0
    while (j < count) {
      val from = starts(j)
      val until = if (j + n < nToks) starts(j + n) - 1 else bytes.length
      if (seen.add(UTF8String.fromBytes(bytes, from, until - from))) {
        var acc = 7L
        var p = from
        while (p < until) { acc = (acc * 31 + (bytes(p) & 0xffL)) % prime; p += 1 }
        var b = 0
        while (b < bits) {
          votes(b) += (if (((acc >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }
}
