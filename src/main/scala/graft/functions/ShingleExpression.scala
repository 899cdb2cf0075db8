package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-token shingle expression: all n-grams of the space-split
  * tokens, joined by a single space.
  *
  * Semantically identical to [[TextFunctions.shinglesAll]] (split keeps
  * trailing empties, i.e. Java split with limit -1), but evaluated as one
  * byte-slice loop per row ([[ShingleOps.shingles]]) instead of a
  * transform/sequence/slice/array_join HOF chain — which profiled at
  * ~11µs per shingle and dominated every shingle-pipeline operator.
  * Round 18: the split-to-String[] + StringBuilder body became byte
  * slicing (a shingle IS the original byte span between its token
  * boundaries — see [[ShingleOps]]), and the expression now generates
  * code (one static call), so the surrounding whole-stage pipeline no
  * longer pays the CodegenFallback row-boxing per row. */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.shingles($c, $n, $distinct);")

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
  * the callers' `size(toks) >= n` guard semantics. Round 18: codegen
  * (one static call into [[ShingleOps.gramHashes]], which also backs
  * nullSafeEval) replaces the CodegenFallback boxing — the ADVICE r17
  * finding that this hot per-row loop was the one sibling without
  * doGenCode. */
case class GramHashes(child: Expression, n: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.gramHashes(input.asInstanceOf[UTF8String], n, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.gramHashes($c, $n, ${prime}L);")

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
